"""Reference-pose mocap tracking tasks, TPU-native (reference:
locomotion/tasks/reference_pose/tracking.py:64-681, rewards.py:26-183).

The reference task holds mutable Python episode state (current clip,
time step, cached walker features) and queries an HDF5 trajectory every
step.  Here the whole thing is in-graph:

  * the clip library is a static padded array pytree
    (`mocap.ClipCollection`), so per-step reference lookup is a gather
    `ref.qpos[clip, start + t]` — jit/vmap friendly;
  * episode state (clip id, start frame) rides in `Data.model_var` and
    the frame cursor is derived from simulation time, so the task stays
    a pure function of (Model, Data);
  * termination error, reward channels (`termination_reward`,
    `multi_term_pose_reward`, `comic` — reference rewards.py:69-153) and
    the reference observations (rel joints/bodies/root, lookahead via
    `ref_steps` — reference tracking.py:389-470) are pure jnp.

Episodes start at a uniformly random (clip, frame) with the walker
teleported onto the reference pose (reference tracking.py:279-336), and
terminate when the pose error exceeds the threshold or the clip ends.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import math as _math
from dm_control_tpu.composer.entity import Entity
from dm_control_tpu.composer.environment import (BatchedEnvironment,
                                                 Environment)
from dm_control_tpu.composer.observation import ObservableSpec
from dm_control_tpu.composer.task import ComposerTask
from dm_control_tpu.locomotion import mocap
from dm_control_tpu.utils import transformations as tr

_CLIP_KEY = '_mocap_clip'
_START_KEY = '_mocap_start'


def _bounded_quat_dist(source, target):
  """Quaternion distance with the q/-q ambiguity removed (reference
  rewards.py:26-42)."""
  return jnp.minimum(tr.quat_dist(source, target),
                     tr.quat_dist(source, -target))


class TrackingTask(ComposerTask):
  """Track a mocap clip collection with a free-root walker model.

  Args mirror the reference ReferencePosesTask (tracking.py:67-110):
  ref_steps are the lookahead offsets of the reference observations;
  termination_error_threshold ends the episode when the 0.5*joints +
  0.5*bodies mean-abs pose error (tracking.py:347-356) exceeds it."""

  def __init__(self, walker_root, clips: mocap.ClipCollection,
               ref_steps: Sequence[int] = (1, 2, 3, 4, 5),
               termination_error_threshold: float = 0.3,
               min_steps: int = 10,
               reward_type: str = 'comic',
               control_timestep: Optional[float] = None,
               body_error_multiplier: float = 1.0,
               tracked_bodies: Optional[Sequence[int]] = None,
               always_init_at_clip_start: bool = False):
    super().__init__(arena=Entity(mjcf_root=walker_root, name='walker'),
                     control_timestep=control_timestep or clips.dt)
    if abs(self.control_timestep / clips.dt - 1.0) > 1e-6:
      raise ValueError('control_timestep must equal the clip dt '
                       f'({clips.dt}); got {self.control_timestep}')
    m = self.compile()
    self.clips = clips
    self.ref_steps = np.sort(np.asarray(ref_steps, np.int32))
    max_ref = int(self.ref_steps[-1])
    self._thresh = float(termination_error_threshold)
    self._bem = float(body_error_multiplier)
    self._reward_type = reward_type
    if tracked_bodies is None:
      tracked_bodies = list(range(1, m.nbody))
    bidx = np.asarray(tracked_bodies, np.int32)
    ref = {k: jnp.asarray(getattr(clips, k)) for k in
           ('qpos', 'qvel', 'body_pos', 'body_quat', 'com', 'appendages')}
    lengths = jnp.asarray(clips.lengths, jnp.int32)
    # latest legal start per clip (tracking.py:250-273 _get_possible_starts)
    max_start = jnp.maximum(lengths - max_ref - int(min_steps), 1)
    n_clips = clips.n_clips
    dt_ref = float(clips.dt)
    njoint = m.nq - 7          # non-root joint angles
    app_bodies = None          # appendages precomputed in the collection

    def episode_vars(d):
      # default zeros: observables are shape-probed on a pre-episode
      # example Data that has no episode vars yet
      mv = d.model_var or {}
      zero = jnp.zeros((), jnp.int32)
      return (jnp.asarray(mv.get(_CLIP_KEY, zero), jnp.int32),
              jnp.asarray(mv.get(_START_KEY, zero), jnp.int32))

    def cursor(d):
      """Current reference frame index (clamped into the clip)."""
      clip, start = episode_vars(d)
      t = jnp.round(d.time / dt_ref).astype(jnp.int32)
      return clip, jnp.clip(start + t, 0, lengths[clip] - 1 - max_ref)

    self._cursor = cursor

    # --- walker features (reference_pose/utils.py:99-130) ----------------
    def walker_features(m_, d):
      root_quat = d.qpos[3:7]
      return dict(
          position=d.qpos[:3], quaternion=root_quat,
          joints=d.qpos[7:], joints_velocity=d.qvel[6:],
          center_of_mass=d.subtree_com[1],
          body_positions=d.xpos[bidx], body_quaternions=d.xquat[bidx],
          velocity=d.qvel[:3], angular_velocity=d.qvel[3:6])

    def reference_features(d, offset=0):
      clip, idx = cursor(d)
      i = idx + offset
      return dict(
          position=ref['qpos'][clip, i, :3],
          quaternion=ref['qpos'][clip, i, 3:7],
          joints=ref['qpos'][clip, i, 7:],
          joints_velocity=ref['qvel'][clip, i, 6:],
          center_of_mass=ref['com'][clip, i],
          body_positions=ref['body_pos'][clip, i][bidx],
          body_quaternions=ref['body_quat'][clip, i][bidx],
          appendages=ref['appendages'][clip, i])

    self._walker_features = walker_features
    self._reference_features = reference_features

    def termination_error(m_, d):
      """0.5*bem*mean|body_pos err| + 0.5*mean|joints err|
      (tracking.py:347-356)."""
      w = walker_features(m_, d)
      r = reference_features(d)
      e_j = jnp.mean(jnp.abs(r['joints'] - w['joints']))
      e_b = jnp.mean(jnp.abs(r['body_positions'] - w['body_positions']))
      return 0.5 * self._bem * e_b + 0.5 * e_j

    self.termination_error = termination_error

    # --- rewards (reference rewards.py) -----------------------------------
    def squared_diffs(w, r):
      out = {}
      for k in ('center_of_mass', 'joints_velocity', 'appendages'):
        if k in w and k in r:
          out[k] = jnp.sum((w[k] - r[k]) ** 2)
      qd = jax.vmap(_bounded_quat_dist)(w['body_quaternions'],
                                        r['body_quaternions'])
      out['body_quaternions'] = jnp.sum(qd ** 2)
      return out

    def multi_term(w, r):
      dsq = squared_diffs(w, r)
      return (0.1 * jnp.exp(-10 * dsq['center_of_mass'])
              + 1.0 * jnp.exp(-0.1 * dsq['joints_velocity'])
              + (0.15 * jnp.exp(-40. * dsq['appendages'])
                 if 'appendages' in dsq else 0.0)
              + 0.65 * jnp.exp(-2 * dsq['body_quaternions']))

    def reward(m_, d):
      err = termination_error(m_, d)
      term_r = 1.0 - err / self._thresh
      if reward_type == 'termination_reward':
        return term_r
      w = walker_features(m_, d)
      r = reference_features(d)
      # walker appendage positions in the root frame
      mt = multi_term(w, r)
      if reward_type == 'multi_term_pose_reward':
        return mt
      return 0.5 * term_r + 0.5 * mt     # 'comic' (rewards.py:119-153)

    self.set_reward(reward)

    def termination(m_, d):
      clip, start = episode_vars(d)
      t = jnp.round(d.time / dt_ref).astype(jnp.int32)
      end_mocap = start + t >= lengths[clip] - 1 - max_ref
      fail = termination_error(m_, d) > self._thresh
      return jnp.logical_or(end_mocap, fail)

    self.set_termination(termination)

    # --- episode init (tracking.py:279-336) --------------------------------
    def init_episode(m_, d, key):
      kc, ks = jax.random.split(key)
      clip = jax.random.randint(kc, (), 0, n_clips)
      if always_init_at_clip_start:
        start = jnp.zeros((), jnp.int32)
      else:
        u = jax.random.uniform(ks, ())
        start = (u * max_start[clip].astype(u.dtype)).astype(jnp.int32)
      qpos = ref['qpos'][clip, start].astype(d.qpos.dtype)
      qvel = ref['qvel'][clip, start].astype(d.qvel.dtype)
      mv = dict(d.model_var or {})
      mv[_CLIP_KEY] = clip
      mv[_START_KEY] = start
      return d.replace(qpos=qpos, qvel=qvel, model_var=mv)

    self.add_init_hook(init_episode)

    # --- observations (tracking.py:208-247, 389-470) -----------------------
    def lookahead(fn):
      """Stack fn over the ref_steps offsets."""
      offs = [int(o) for o in self.ref_steps]
      return lambda m_, d: jnp.concatenate(
          [jnp.ravel(fn(m_, d, o)) for o in offs])

    self.add_observable('walker/joints_pos', ObservableSpec(
        fn=lambda m_, d: d.qpos[7:]))
    self.add_observable('walker/joints_vel', ObservableSpec(
        fn=lambda m_, d: d.qvel[6:]))
    self.add_observable('walker/root_quat', ObservableSpec(
        fn=lambda m_, d: d.qpos[3:7]))
    self.add_observable('walker/velocity', ObservableSpec(
        fn=lambda m_, d: d.qvel[:6]))
    self.add_observable('clip_id', ObservableSpec(
        fn=lambda m_, d: episode_vars(d)[0].astype(d.qpos.dtype)[None]))
    self.add_observable('time_in_clip', ObservableSpec(
        fn=lambda m_, d: (cursor(d)[1].astype(d.qpos.dtype)
                          / lengths[cursor(d)[0]].astype(d.qpos.dtype)
                          )[None]))
    self.add_observable('reference_rel_joints', ObservableSpec(
        fn=lookahead(lambda m_, d, o: reference_features(d, o)['joints']
                     - d.qpos[7:])))
    self.add_observable('reference_rel_bodies_pos_global', ObservableSpec(
        fn=lookahead(
            lambda m_, d, o: reference_features(d, o)['body_positions']
            - d.xpos[bidx])))
    self.add_observable('reference_rel_bodies_quats', ObservableSpec(
        fn=lookahead(lambda m_, d, o: jax.vmap(tr.quat_diff)(
            d.xquat[bidx],
            reference_features(d, o)['body_quaternions']))))
    self.add_observable('reference_rel_root_quat', ObservableSpec(
        fn=lookahead(lambda m_, d, o: tr.quat_diff(
            d.qpos[3:7], reference_features(d, o)['quaternion']))))
    self.add_observable('reference_rel_root_pos_local', ObservableSpec(
        fn=lookahead(lambda m_, d, o: _math.quat_rotate_inv(
            d.qpos[3:7],
            reference_features(d, o)['position'] - d.qpos[:3]))))
    self.add_observable('reference_appendages_pos', ObservableSpec(
        fn=lookahead(
            lambda m_, d, o: reference_features(d, o)['appendages'])))

    del app_bodies, njoint


def load(walker_root, clips: mocap.ClipCollection, time_limit=30.0,
         random=None, batch_size=None, **task_kwargs):
  """MultiClipMocapTracking-equivalent factory (tracking.py:588-651)."""
  task = TrackingTask(walker_root, clips, **task_kwargs)
  if batch_size:
    return BatchedEnvironment(task, batch_size, time_limit=time_limit)
  return Environment(task, time_limit=time_limit, random=random)


def cmu_tracking(amc_paths: Sequence[str], dt: float = 0.02,
                 time_limit=30.0, random=None, batch_size=None,
                 **task_kwargs):
  """Track CMU .amc clips with the 56-DoF CMU humanoid (the reference's
  flagship mocap pipeline: suite/utils/parse_amc.py feeding
  MultiClipMocapTracking with a cmu_humanoid walker)."""
  from dm_control_tpu._src import engine
  from dm_control_tpu.mjcf.compiler import _load_xml
  from dm_control_tpu.suite import common
  path = common.model_path('humanoid_CMU.xml')
  m = engine.load_model(path)
  clips = [mocap.from_amc(p, m, dt) for p in amc_paths]
  coll = mocap.build_features(m, clips)
  return load(_load_xml(path), coll, time_limit=time_limit,
              random=random, batch_size=batch_size, **task_kwargs)
