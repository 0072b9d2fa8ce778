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
#
# Coverage mirrors the reference's per-model x per-camera battery
# (mujoco/testing/image_utils.py:76-190) across this raytracer's
# distinct code paths: primitives (cartpole/cheetah), convex mesh hulls
# (jaco), heightfield terrain (quadruped escape), and the depth /
# segmentation channels.
#   model:  a vendored suite XML; or task: a (domain, task) pair built
#           through the suite (for procedural models like hfields).
#   camera: a model camera id, or a free-camera dict
#           (lookat/distance/azimuth/elevation, MovableCamera
#           parameterization).
#   mode:   rgb (default) | depth | segmentation.
SEQUENCES = {
    'cartpole': dict(model='cartpole.xml', camera_id=0, width=64,
                     height=48, num_frames=4, steps_per_frame=5),
    'cheetah': dict(model='cheetah.xml', camera_id=0, width=64,
                    height=48, num_frames=4, steps_per_frame=5),
    # mesh-hull tracing (the jaco arm is all convex mesh geoms)
    'jaco': dict(model='jaco_j2s7s300_position.xml',
                 camera=dict(lookat=(0.0, 0.0, 0.3), distance=1.6,
                             azimuth=215.0, elevation=-25.0),
                 width=64, height=48, num_frames=3, steps_per_frame=5),
    # procedural heightfield terrain
    'quadruped_escape': dict(task=('quadruped', 'escape'),
                             camera=dict(lookat=(0.0, 0.0, 0.5),
                                         distance=6.0, azimuth=120.0,
                                         elevation=-35.0),
                             width=64, height=48, num_frames=3,
                             steps_per_frame=5),
    # non-RGB channels over the primitive path
    'cartpole_depth': dict(model='cartpole.xml', camera_id=0, width=64,
                           height=48, num_frames=3, steps_per_frame=5,
                           mode='depth'),
    'cartpole_seg': dict(model='cartpole.xml', camera_id=0, width=64,
                         height=48, num_frames=3, steps_per_frame=5,
                         mode='segmentation'),
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
  if 'task' in cfg:
    from dm_control_tpu import suite
    task = suite.build_task(*cfg['task'])
    m = task.model
    d = _forward.make_data(m)
    d = task.init_episode(m, d, jax.random.PRNGKey(4))
    d = _forward.forward(m, d)
  else:
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


def _camera_arg(m, d, cfg):
  if 'camera' in cfg:
    from dm_control_tpu._src import render as render_lib
    c = cfg['camera']
    pos, mat = render_lib.free_camera_pose(
        np.asarray(c['lookat']), c['distance'], c['azimuth'],
        c['elevation'])
    dtype = np.asarray(d.qpos).dtype
    return dict(camera=(np.asarray(pos, dtype), np.asarray(mat, dtype),
                        np.deg2rad(c.get('fovy', 45.0))))
  return dict(camera_id=cfg['camera_id'])


def render_sequence(name: str) -> np.ndarray:
  """(num_frames, H, W, C) uint8 frames of the scripted sequence
  (C=3 for rgb; 1 for depth/segmentation visualizations)."""
  from dm_control_tpu._src import render as render_lib
  cfg = SEQUENCES[name]
  mode = cfg.get('mode', 'rgb')
  frames = []
  for m, d in _sequence_states(name):
    kw = _camera_arg(m, d, cfg)
    if mode == 'rgb':
      rgb = render_lib.render(m, d, cfg['height'], cfg['width'], **kw)
      img = np.asarray(jax.device_get(rgb))       # floats in [0, 1]
      img = np.clip(np.round(img * 255), 0, 255)
    elif mode == 'depth':
      depth = render_lib.render(m, d, cfg['height'], cfg['width'],
                                depth=True, **kw)
      depth = np.asarray(jax.device_get(depth))
      # bounded visualization: 255 at the camera, 0 at infinity
      img = np.round(255.0 / (1.0 + np.maximum(depth, 0.0)))[..., None]
    elif mode == 'segmentation':
      seg = render_lib.render(m, d, cfg['height'], cfg['width'],
                              segmentation=True, **kw)
      seg = np.asarray(jax.device_get(seg))
      img = ((seg.astype(np.int64) + 1) % 251).astype(np.uint8)[..., None]
    else:
      raise ValueError(f'unknown mode {mode!r}')
    frames.append(img)
  return np.stack(frames).astype(np.uint8)


def golden_path(name: str) -> str:
  cfg = SEQUENCES[name]
  cam = cfg.get('camera_id', 'free')
  key = (f"{name}_camera_{cam}"
         f"_{cfg['width']}x{cfg['height']}")
  return os.path.join(_FRAMES_DIR, f'{key}.npz')


def load_golden(name: str) -> np.ndarray:
  return np.load(golden_path(name))['frames']


def save_golden(name: str, frames: np.ndarray):
  os.makedirs(_FRAMES_DIR, exist_ok=True)
  np.savez_compressed(golden_path(name), frames=frames)
