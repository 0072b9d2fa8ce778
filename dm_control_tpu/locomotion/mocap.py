"""Mocap trajectory containers and loaders, TPU-native (reference:
locomotion/mocap/loader.py:38-231, trajectory.py:51,
tasks/reference_pose/utils.py:99-130).

The reference stores clips as HDF5/proto files read lazily on the host
and interpolated per step (trajectory.py).  Here a clip collection is a
**static stacked array pytree** — `(n_clips, T_max, ...)` with per-clip
lengths — so clip selection and per-step reference lookups are in-graph
gathers (`ref.qpos[clip, step]`) that batch and jit.  Derived body
features (body positions/quaternions, center of mass) are precomputed
once at build time by running the engine's forward kinematics over every
frame (vmapped), which replaces the reference's per-step
`physics.bind(...)` feature extraction (reference_pose/utils.py:99).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np

from dm_control_tpu._src import forward as _forward
from dm_control_tpu._src import smooth as _smooth
from dm_control_tpu._src.types import Model


@dataclasses.dataclass(frozen=True)
class Trajectory:
  """One clip: per-frame generalized coordinates at fixed dt."""
  dt: float
  qpos: np.ndarray  # (T, nq)
  qvel: np.ndarray  # (T, nv)

  @property
  def length(self) -> int:
    return self.qpos.shape[0]


def from_amc(path: str, m: Model, dt: float) -> Trajectory:
  """CMU .amc file -> Trajectory resampled at dt (reference
  suite/utils/parse_amc.py:51)."""
  from dm_control_tpu.suite.utils import parse_amc
  conv = parse_amc.convert(path, m, dt)
  qpos = np.asarray(conv.qpos).T          # convert returns (nq, T)
  qvel = np.asarray(conv.qvel).T
  n = min(qpos.shape[0], qvel.shape[0])
  return Trajectory(dt=dt, qpos=qpos[:n], qvel=qvel[:n])


def from_rollout(m: Model, d0, n_frames: int, every: int = 1) -> Trajectory:
  """Record a physically consistent clip by stepping the passive model.

  Replaces the reference's downloaded CMU clips for tests/demos: any
  rollout of the engine itself is a perfectly trackable reference."""
  import jax.numpy as jnp
  step = jax.jit(lambda d: _forward.step(m, d))
  frames_q, frames_v = [], []
  d = d0
  for i in range(n_frames * every):
    if i % every == 0:
      frames_q.append(np.asarray(d.qpos))
      frames_v.append(np.asarray(d.qvel))
    d = step(d)
  del jnp
  return Trajectory(dt=float(m.opt.timestep) * every,
                    qpos=np.stack(frames_q), qvel=np.stack(frames_v))


@dataclasses.dataclass(frozen=True)
class ClipCollection:
  """Stacked, padded clip features; every array is a static constant
  gathered in-graph by (clip, frame) index.

  Shapes: qpos (C,T,nq), qvel (C,T,nv), body_pos (C,T,nb,3),
  body_quat (C,T,nb,4), com (C,T,3), appendages (C,T,na,3) in the root
  (egocentric) frame, lengths (C,) int32."""
  dt: float
  qpos: np.ndarray
  qvel: np.ndarray
  body_pos: np.ndarray
  body_quat: np.ndarray
  com: np.ndarray
  appendages: np.ndarray
  lengths: np.ndarray

  @property
  def n_clips(self) -> int:
    return self.qpos.shape[0]

  @property
  def max_length(self) -> int:
    return self.qpos.shape[1]

  def save(self, path: str):
    np.savez_compressed(path, dt=self.dt, qpos=self.qpos, qvel=self.qvel,
                        body_pos=self.body_pos, body_quat=self.body_quat,
                        com=self.com, appendages=self.appendages,
                        lengths=self.lengths)

  @staticmethod
  def load(path: str) -> 'ClipCollection':
    z = np.load(path)
    return ClipCollection(
        dt=float(z['dt']), qpos=z['qpos'], qvel=z['qvel'],
        body_pos=z['body_pos'], body_quat=z['body_quat'], com=z['com'],
        appendages=z['appendages'], lengths=z['lengths'])


def _frame_features(m: Model, qpos, qvel, appendage_bodies, root_body=1):
  """qpos/qvel (nq,)/(nv,) -> (body_pos, body_quat, com, appendages).

  Assumes the walker root is a free joint at qpos[0:7] on `root_body`
  (true for every suite/locomotion walker model)."""
  import jax.numpy as jnp
  d = _forward.make_data(m, dtype=qpos.dtype)
  d = d.replace(qpos=qpos, qvel=qvel)
  d = _smooth.kinematics(m, d)
  d = _smooth.com_pos(m, d)
  root_pos = qpos[:3]
  root_quat = qpos[3:7]
  from dm_control_tpu._src import math as _math
  # appendages in the egocentric (root) frame, reference
  # walkers/legacy_base.py appendages_pos semantics
  app = jax.vmap(
      lambda b: _math.quat_rotate_inv(root_quat, d.xpos[b] - root_pos))(
          jnp.asarray(appendage_bodies))
  return d.xpos, d.xquat, d.subtree_com[root_body], app


def build_features(m: Model, clips: Sequence[Trajectory],
                   appendage_bodies: Optional[Sequence[int]] = None
                   ) -> ClipCollection:
  """Run vmapped forward kinematics over every frame of every clip and
  stack into a padded ClipCollection."""
  if not clips:
    raise ValueError('need at least one clip')
  dt = clips[0].dt
  if any(abs(c.dt - dt) > 1e-9 for c in clips):
    raise ValueError('all clips must share one dt')
  if appendage_bodies is None:
    # leaf bodies (no children) ~ end effectors + head
    parents = set(int(p) for p in m.body_parentid[1:])
    appendage_bodies = [b for b in range(1, m.nbody) if b not in parents]
  appendage_bodies = list(appendage_bodies)

  feats = jax.jit(jax.vmap(
      lambda q, v: _frame_features(m, q, v, appendage_bodies)))

  tmax = max(c.length for c in clips)
  nb, na = m.nbody, len(appendage_bodies)
  C = len(clips)
  nq, nv = clips[0].qpos.shape[1], clips[0].qvel.shape[1]
  out = dict(
      qpos=np.zeros((C, tmax, nq)), qvel=np.zeros((C, tmax, nv)),
      body_pos=np.zeros((C, tmax, nb, 3)),
      body_quat=np.zeros((C, tmax, nb, 4)),
      com=np.zeros((C, tmax, 3)), appendages=np.zeros((C, tmax, na, 3)))
  out['body_quat'][..., 0] = 1.0
  lengths = np.zeros((C,), np.int32)
  for i, c in enumerate(clips):
    xpos, xquat, com, app = jax.device_get(feats(c.qpos, c.qvel))
    T = c.length
    lengths[i] = T
    out['qpos'][i, :T] = c.qpos
    out['qvel'][i, :T] = c.qvel
    out['body_pos'][i, :T] = xpos
    out['body_quat'][i, :T] = xquat
    out['com'][i, :T] = com
    out['appendages'][i, :T] = app
    # pad with the final frame so lookahead gathers stay on-manifold
    for k, arr in out.items():
      arr[i, T:] = arr[i, T - 1]
  return ClipCollection(dt=dt, lengths=lengths, **out)
