"""Golden-frame regression testing for the in-graph raytracer
(reference: mujoco/testing/image_utils.py:76-230).

The reference pre-renders frame sequences per GL backend and compares
new renders by RMS with a tolerance, dumping actual/diff images on
failure.  Here frames come from the deterministic analytic raytracer
(_src/render.py), so goldens are backend-free: one npz per named
sequence, keyed `{name}_camera_{id}_{w}x{h}`, regenerable with
`tools/generate_frames.py`.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

_FRAMES_DIR = os.path.join(os.path.dirname(__file__), 'frames')

# Deterministic scripted sequences: model asset + sinusoidal open-loop
# ctrl (the reference drives its sequences with a fixed-seed uniform
# policy, image_utils.py:103-120; a scripted ctrl is seed-free).
SEQUENCES = {
    'cartpole': dict(model='cartpole.xml', camera_id=0, width=64,
                     height=48, num_frames=4, steps_per_frame=5),
    'cheetah': dict(model='cheetah.xml', camera_id=0, width=64,
                    height=48, num_frames=4, steps_per_frame=5),
}


def compute_rms(image1: np.ndarray, image2: np.ndarray) -> float:
  """Root-mean-square pixel difference (image_utils.py:204-210)."""
  abs_diff = np.abs(image1.astype(np.int64) - image2.astype(np.int64))
  return float(np.sqrt(np.mean(np.square(abs_diff))))


def assert_images_close(expected: np.ndarray, actual: np.ndarray,
                        tolerance: float = 10.0,
                        failure_dir: Optional[str] = None,
                        name: str = 'frame'):
  """RMS-compare; on failure optionally dump expected/actual/diff PNGs
  (image_utils.py:212-246)."""
  rms = compute_rms(expected, actual)
  if rms <= tolerance:
    return
  if failure_dir:
    from dm_control_tpu import viewer
    os.makedirs(failure_dir, exist_ok=True)
    diff = np.clip(
        128 + actual.astype(np.int64) - expected.astype(np.int64),
        0, 255).astype(np.uint8)
    for tag, img in (('expected', expected), ('actual', actual),
                     ('diff', diff)):
      viewer.save_png(os.path.join(failure_dir, f'{name}_{tag}.png'), img)
  raise AssertionError(
      f'images for {name!r} differ: RMS {rms:.2f} > tolerance {tolerance}')


def _sequence_states(name: str):
  """Deterministically roll the scripted sequence; yields (m, d) at each
  captured frame."""
  from dm_control_tpu._src import engine as _engine
  from dm_control_tpu._src import forward as _forward
  from dm_control_tpu.suite import common
  cfg = SEQUENCES[name]
  m = _engine.load_model(common.model_path(cfg['model']))
  d = _forward.forward(m, _forward.make_data(m))
  step = jax.jit(lambda dd: _forward.step(m, dd))
  k = 0
  for _ in range(cfg['num_frames']):
    yield m, d
    for _ in range(cfg['steps_per_frame']):
      ctrl = 0.8 * np.sin(0.3 * k + np.arange(m.nu))
      d = step(d.replace(ctrl=jnp.asarray(ctrl, d.ctrl.dtype)))
      k += 1


def render_sequence(name: str) -> np.ndarray:
  """(num_frames, H, W, 3) uint8 frames of the scripted sequence."""
  from dm_control_tpu._src import render as render_lib
  cfg = SEQUENCES[name]
  frames = []
  for m, d in _sequence_states(name):
    rgb = render_lib.render(m, d, cfg['height'], cfg['width'],
                            camera_id=cfg['camera_id'])
    # raytracer emits floats in [0, 1]
    img = np.asarray(jax.device_get(rgb))
    frames.append(np.clip(np.round(img * 255), 0, 255))
  return np.stack(frames).astype(np.uint8)


def golden_path(name: str) -> str:
  cfg = SEQUENCES[name]
  key = (f"{name}_camera_{cfg['camera_id']}"
         f"_{cfg['width']}x{cfg['height']}")
  return os.path.join(_FRAMES_DIR, f'{key}.npz')


def load_golden(name: str) -> np.ndarray:
  return np.load(golden_path(name))['frames']


def save_golden(name: str, frames: np.ndarray):
  os.makedirs(_FRAMES_DIR, exist_ok=True)
  np.savez_compressed(golden_path(name), frames=frames)
