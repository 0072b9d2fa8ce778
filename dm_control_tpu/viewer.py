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


class State:
  """Runtime lifecycle states (reference viewer/runtime.py:79-86)."""
  START = 'START'
  RUNNING = 'RUNNING'
  STOP = 'STOP'
  STOPPED = 'STOPPED'
  RESTARTING = 'RESTARTING'


class TimeMultiplier:
  """Simulation-speed factor clamped to powers of two in [1/32, 2]
  (reference viewer/util.py:57-100)."""

  def __init__(self, initial=1.0):
    self._real = float(np.clip(initial, 1. / 32, 2.))

  def get(self):
    return self._real

  def increase(self):
    self._real = min(self._real * 2.0, 2.0)

  def decrease(self):
    self._real = max(self._real / 2.0, 1. / 32)

  def __str__(self):
    if self._real >= 1:
      return f'{int(self._real)}'
    return f'1/{int(np.round(1.0 / self._real))}'


class Runtime:
  """Headless policy-execution state machine (reference
  viewer/runtime.py:88-258): drives `policy(timestep) -> action` through
  the environment with real-time pacing, pause/single-step, and restart.
  `on_episode_begin` listeners mirror the reference's QuietSet hooks."""

  def __init__(self, env, policy: Optional[Callable] = None):
    self._env = env
    self._policy = policy
    self._ts = None
    self._sim_time = 0.0
    self.state = State.START
    self.time_multiplier = TimeMultiplier()
    self.on_episode_begin = []
    self.last_error = ''

  @property
  def environment(self):
    return self._env

  def restart(self):
    self.state = State.RESTARTING
    self._start()

  def stop(self):
    self.state = State.STOPPED

  def get_time(self):
    return self._sim_time

  def _start(self):
    try:
      self._ts = self._env.reset()
      self._sim_time = 0.0
      for listener in self.on_episode_begin:
        listener()
      self.state = State.RUNNING
      return True
    except Exception as e:   # mirror runtime.py error trapping
      self.last_error = f'{type(e).__name__}: {e}'
      self.state = State.STOPPED
      return False

  def single_step(self):
    """One control step while paused."""
    if self.state == State.START and not self._start():
      return False
    return self._step()

  def tick(self, time_elapsed: float, paused: bool = False):
    """Advance as many control steps as real time allows
    (time_elapsed scaled by the time multiplier)."""
    if self.state == State.START and not self._start():
      return
    if self.state != State.RUNNING or paused:
      return
    budget = time_elapsed * self.time_multiplier.get()
    dt = getattr(self._env, 'control_timestep', lambda: 0.02)
    dt = dt() if callable(dt) else dt
    steps = max(1, int(round(budget / max(dt, 1e-9))))
    for _ in range(steps):
      if not self._step():
        break

  def _step(self):
    try:
      if self._policy is None:
        spec = self._env.action_spec()
        lo = np.where(np.isfinite(spec.minimum), spec.minimum, -1)
        hi = np.where(np.isfinite(spec.maximum), spec.maximum, 1)
        action = np.random.uniform(lo, hi)
      else:
        action = self._policy(self._ts)
      self._ts = self._env.step(action)
      dt = getattr(self._env, 'control_timestep', None)
      self._sim_time += dt() if callable(dt) else 0.02
      if self._ts.last():
        self.state = State.STOP
        return False
      return True
    except Exception as e:
      self.last_error = f'{type(e).__name__}: {e}'
      self.state = State.STOPPED
      return False
