"""Headless episode viewer: raytraced frames written to PNG files.

The reference viewer (dm_control/viewer/, GLFW GUI, SURVEY §2.8) cannot
exist in a headless TPU pod; the equivalent workflow here is offline:
run a policy, render every control step with the in-graph raytracer, and
write PNGs (pure stdlib encoder - no image libraries).

  from dm_control_tpu import suite, viewer
  env = suite.load('cartpole', 'swingup')
  viewer.launch(env, policy=None, out_dir='/tmp/frames')
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Callable, Optional

import jax
import numpy as np

from dm_control_tpu._src import render as _render


def save_png(path: str, img: np.ndarray) -> None:
  """Write an (H, W, 3) uint8 array as a PNG (stdlib only)."""
  img = np.asarray(img, np.uint8)
  h, w, _ = img.shape
  raw = b''.join(b'\x00' + img[row].tobytes() for row in range(h))

  def chunk(tag: bytes, payload: bytes) -> bytes:
    out = struct.pack('>I', len(payload)) + tag + payload
    return out + struct.pack('>I', zlib.crc32(tag + payload) & 0xFFFFFFFF)

  header = struct.pack('>IIBBBBB', w, h, 8, 2, 0, 0, 0)
  with open(path, 'wb') as f:
    f.write(b'\x89PNG\r\n\x1a\n')
    f.write(chunk(b'IHDR', header))
    f.write(chunk(b'IDAT', zlib.compress(raw, 6)))
    f.write(chunk(b'IEND', b''))


def render_episode(env, policy: Optional[Callable] = None,
                   max_steps: int = 200, height: int = 240,
                   width: int = 320, camera_id: int = 0) -> np.ndarray:
  """Run one episode, returning (T, H, W, 3) uint8 frames."""
  m = env.task.model
  render_fn = jax.jit(lambda d: _render.render(
      m, d, height, width, camera_id))
  ts = env.reset()
  frames = [np.asarray(render_fn(env.physics))]
  spec = env.action_spec()
  for _ in range(max_steps):
    if policy is None:
      lo = np.where(np.isfinite(spec.minimum), spec.minimum, -1)
      hi = np.where(np.isfinite(spec.maximum), spec.maximum, 1)
      action = np.random.uniform(lo, hi)
    else:
      action = policy(ts)
    ts = env.step(action)
    if env.physics is None:
      break
    frames.append(np.asarray(render_fn(env.physics)))
    if ts.last():
      break
  return (np.stack(frames) * 255).astype(np.uint8)


def launch(env, policy: Optional[Callable] = None,
           out_dir: str = '/tmp/dm_control_tpu_frames',
           max_steps: int = 200, height: int = 240, width: int = 320,
           camera_id: int = 0) -> str:
  """Offline `viewer.launch` analog: render an episode to PNG frames."""
  frames = render_episode(env, policy, max_steps, height, width, camera_id)
  os.makedirs(out_dir, exist_ok=True)
  for i, frame in enumerate(frames):
    save_png(os.path.join(out_dir, f'frame_{i:05d}.png'), frame)
  print(f'wrote {len(frames)} frames to {out_dir}')
  return out_dir
