"""Composer environment: episode loop with the in-graph observation
pipeline (reference composer/environment.py:271-403, hook dispatch +
between-substep observation updates)."""

from __future__ import annotations

import collections
from typing import Optional

import dm_env
from dm_env import specs
import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import engine as _engine
from dm_control_tpu._src import forward as _forward
from dm_control_tpu.composer.observation import ObservationPipeline
from dm_control_tpu.composer.task import ComposerTask


class Environment(dm_env.Environment):
  """dm_env loop over a ComposerTask with buffered observables.

  Between every physics substep the observation pipeline is advanced
  (reference composer/environment.py:363-373); observations are read from
  the delay buffers at control-step boundaries."""

  MAX_RESET_ATTEMPTS = 4  # ref composer/environment.py:296-323

  # model fields the engine reads through smooth.mparam(), i.e. the ones
  # a per-episode Data.model_var overlay can override without retracing
  OVERLAY_FIELDS = frozenset({
      'body_pos', 'body_quat', 'geom_pos', 'geom_rgba', 'hfield_data',
      'site_pos', 'wrap_prm', 'qpos0', 'qpos_spring'})

  def __init__(self, task: ComposerTask, time_limit: float = float('inf'),
               random: Optional[int] = None):
    self._task = task
    self._time_limit = time_limit
    self._step_count = 0
    self._episode_count = 0
    seed = 0 if random is None else int(random)
    self._base_key = jax.random.PRNGKey(seed)
    self._recompiles = task.has_mjcf_hooks
    self._base_model = None   # model the live traces were built against
    self._overlay = {}        # model_var diff vs _base_model (trace reuse)
    self._build(np.random.RandomState(seed))
    self._carry = None

  def _model_overlay_diff(self, new_m):
    """If `new_m` differs from the traced base model only in
    overlay-capable array fields (same shapes everywhere), return the
    {field: value} diff; else None (full rebuild required)."""
    base = self._base_model
    if base is None:
      return None
    import dataclasses as _dc
    diff = {}
    for f in _dc.fields(type(base)):
      a, b = getattr(base, f.name), getattr(new_m, f.name)
      if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        if a is None or b is None or np.shape(a) != np.shape(b):
          return None
        if not np.array_equal(a, b):
          if f.name not in self.OVERLAY_FIELDS:
            return None
          diff[f.name] = b
      elif f.name == 'opt':
        # Option has no __eq__ (hashable-by-identity static arg):
        # compare field values
        import dataclasses as _dc2
        if _dc2.asdict(a) != _dc2.asdict(b):
          return None
      elif f.name == 'names':
        if a != b:  # renames shift name->index maps: rebuild
          return None
      elif isinstance(a, (int, float, str, tuple)) and a != b:
        return None
    return diff

  def _build(self, random_state):
    """(Re)compile the task model and trace the step/reset graphs.
    Called once at construction, and per episode when any entity has an
    mjcf_hook (the reference recompiles physics each episode,
    environment.py:296-323).  When the recompiled model differs from the
    traced one only in overlay-capable fields (poses, colors, hfield
    data), the existing traces are reused with a Data.model_var overlay
    instead of a full XLA recompile."""
    task = self._task
    m = task.recompile(random_state) if self._recompiles \
        else task.compile()
    diff = self._model_overlay_diff(m)
    if diff is not None:
      self._overlay = diff
      self._model = m
      return
    self._obs_spec = None  # spec may change shape after a real rebuild
    self._overlay = {}
    self._base_model = m
    self._model = m
    dt = m.opt.timestep
    ct = task.control_timestep or dt
    self._n_sub_steps = max(1, int(round(ct / dt)))
    self._step_limit = (float('inf') if self._time_limit == float('inf')
                        else self._time_limit / (dt * self._n_sub_steps))

    example = _forward.forward(m, _forward.make_data(m))
    self._pipeline = ObservationPipeline(m, task.observables, example)

    step_fn = _engine.build_step(m)
    n_sub = self._n_sub_steps
    pipeline = self._pipeline
    hooks = {stage: task.step_hooks(stage) for stage in
             ('before_step', 'before_substep', 'after_substep',
              'after_step')}

    def run_hooks(stage, d, key):
      for fn, prefix in hooks[stage]:
        key, sub = jax.random.split(key)
        d = fn(m, d, sub, prefix)
      return d, key

    def control_step(carry, action):
      d, obs_state, substep, key = carry
      d = d.replace(ctrl=action)
      d, key = run_hooks('before_step', d, key)
      # scan, not unroll: jaco-scale models take 40+ substeps per
      # control step and an unrolled graph compiles for minutes
      def substep_fn(c, _):
        d, obs_state, substep, key = c
        d, key = run_hooks('before_substep', d, key)
        d = step_fn(d)
        d, key = run_hooks('after_substep', d, key)
        key, sub = jax.random.split(key)
        obs_state = pipeline.update(obs_state, d, substep, sub)
        return (d, obs_state, substep + 1, key), None
      (d, obs_state, substep, key), _ = jax.lax.scan(
          substep_fn, (d, obs_state, substep, key), None, length=n_sub)
      d, key = run_hooks('after_step', d, key)
      reward = task.get_reward(m, d)
      obs = pipeline.read(obs_state, substep)
      return (d, obs_state, substep, key), (obs, reward)

    self._control_step = jax.jit(control_step)

    def reset_fn(key, overlay):
      d = _forward.make_data(m)
      if overlay:
        d = d.replace(model_var=dict(overlay))
        if 'qpos0' in overlay:
          # make_data seeded qpos from the traced base model's qpos0
          d = d.replace(qpos=jnp.asarray(overlay['qpos0'], d.qpos.dtype))
      d = task.init_episode(m, d, key)
      d = _forward.forward(m, d)
      d = _forward._check_divergence(m, d)
      obs_state = pipeline.init_state()
      substep = jnp.zeros((), jnp.int32)
      obs_state = pipeline.update(obs_state, d, substep, key)
      obs = pipeline.read(obs_state, substep)
      return d, obs_state, obs

    self._reset_fn = jax.jit(reset_fn)

  def reset(self):
    key = jax.random.fold_in(self._base_key, self._episode_count)
    self._episode_count += 1
    self._step_count = 0
    if self._recompiles:
      self._build(np.random.RandomState(self._episode_count))
    # retry failed episode inits (divergent initial state), as the
    # reference retries on PhysicsError (environment.py:296-323)
    for attempt in range(self.MAX_RESET_ATTEMPTS):
      d, obs_state, obs = self._reset_fn(
          jax.random.fold_in(key, attempt), self._overlay)
      if not bool(d.diverged):
        break
    else:
      raise RuntimeError(
          f'episode initialization diverged in all '
          f'{self.MAX_RESET_ATTEMPTS} attempts')
    self._carry = (d, obs_state, jnp.ones((), jnp.int32),
                   jax.random.fold_in(key, 123))
    return dm_env.TimeStep(
        dm_env.StepType.FIRST, None, None, self._np_obs(obs))

  def step(self, action):
    if self._carry is None:
      return self.reset()
    d0 = self._carry[0]
    action = jnp.asarray(action, d0.ctrl.dtype)
    self._carry, (obs, reward) = self._control_step(self._carry, action)
    self._step_count += 1
    d = self._carry[0]
    reward = np.asarray(jax.device_get(reward))
    # multi-agent tasks return one reward per player
    reward = float(reward) if reward.ndim == 0 else reward
    term = self._task.get_termination(self._model, d)
    done_discount = None
    if term is not None and bool(term):
      done_discount = 0.0
    if bool(d.diverged):
      done_discount = 0.0
    if done_discount is not None:
      self._carry = None
      return dm_env.TimeStep(dm_env.StepType.LAST, reward, done_discount,
                             self._np_obs(obs))
    if self._step_count >= self._step_limit:
      self._carry = None
      return dm_env.TimeStep(dm_env.StepType.LAST, reward, 1.0,
                             self._np_obs(obs))
    return dm_env.TimeStep(dm_env.StepType.MID, reward, 1.0,
                           self._np_obs(obs))

  def _np_obs(self, obs):
    return collections.OrderedDict(
        (k, np.asarray(v)) for k, v in obs.items())

  def action_spec(self):
    from dm_control_tpu.rl.control import action_spec
    return action_spec(self._model)

  def observation_spec(self):
    if getattr(self, '_obs_spec', None) is None:
      key = jax.random.PRNGKey(0)
      _, _, obs = self._reset_fn(key, self._overlay)
      self._obs_spec = collections.OrderedDict(
          (k, specs.Array(shape=np.shape(v), dtype=np.asarray(v).dtype,
                          name=k))
          for k, v in obs.items())
    return self._obs_spec

  @property
  def physics(self):
    return self._carry[0] if self._carry is not None else None

  @property
  def task(self):
    return self._task


class BatchedEnvironment:
  """Vmapped composer loop: B independent lanes of (physics state +
  observation buffers), auto-reset in-graph on termination/divergence.

  The suite path has parallel.runner.BatchedEnv; this is its composer
  analog with the buffered observable pipeline carried per lane (the
  reference composer has no batched path at all — every env is a
  separate Python object, composer/environment.py:271)."""

  def __init__(self, task: ComposerTask, batch_size: int,
               time_limit: float = float('inf')):
    self._task = task
    if task.has_mjcf_hooks:
      import warnings
      warnings.warn(
          'BatchedEnvironment compiles the model once: per-episode MJCF '
          'variation (mjcf_hook) runs only at construction, not per '
          'reset. Use composer.Environment for per-episode recompiles.',
          stacklevel=2)
    m = task.compile(np.random.RandomState(0))
    self._model = m
    self._batch = batch_size
    dt = m.opt.timestep
    ct = task.control_timestep or dt
    n_sub = max(1, int(round(ct / dt)))
    step_limit = (np.inf if time_limit == float('inf')
                  else int(round(time_limit / (dt * n_sub))))

    example = _forward.forward(m, _forward.make_data(m))
    pipeline = ObservationPipeline(m, task.observables, example)
    step_fn = _engine.build_step(m)
    hooks = {stage: task.step_hooks(stage) for stage in
             ('before_step', 'before_substep', 'after_substep',
              'after_step')}

    def run_hooks(stage, d, key):
      for fn, prefix in hooks[stage]:
        key, sub = jax.random.split(key)
        d = fn(m, d, sub, prefix)
      return d, key

    def reset_one(key):
      d = _forward.make_data(m)
      d = task.init_episode(m, d, key)
      d = _forward.forward(m, d)
      obs_state = pipeline.init_state()
      substep = jnp.zeros((), jnp.int32)
      obs_state = pipeline.update(obs_state, d, substep, key)
      return d, obs_state, jnp.ones((), jnp.int32), key

    def step_one(carry, action):
      d, obs_state, substep, key = carry
      d = d.replace(ctrl=action)
      d, key = run_hooks('before_step', d, key)
      def substep_fn(c, _):
        d, obs_state, substep, key = c
        d, key = run_hooks('before_substep', d, key)
        d = step_fn(d)
        d, key = run_hooks('after_substep', d, key)
        key, sub = jax.random.split(key)
        obs_state = pipeline.update(obs_state, d, substep, sub)
        return (d, obs_state, substep + 1, key), None
      (d, obs_state, substep, key), _ = jax.lax.scan(
          substep_fn, (d, obs_state, substep, key), None, length=n_sub)
      d, key = run_hooks('after_step', d, key)
      reward = task.get_reward(m, d)
      term = task.get_termination(m, d)
      done = d.diverged if term is None else jnp.logical_or(
          term, d.diverged)
      if np.isfinite(step_limit):
        done = jnp.logical_or(done, substep >= step_limit * n_sub)
      # in-graph auto-reset of finished lanes
      key, rk = jax.random.split(key)
      fresh = reset_one(rk)
      carry = jax.tree_util.tree_map(
          lambda old, new: jnp.where(
              jnp.reshape(done, (1,) * old.ndim if old.ndim else ()),
              new, old),
          (d, obs_state, substep, key), fresh)
      obs = pipeline.read(carry[1], carry[2])
      return carry, (obs, reward, done)

    self._reset = jax.jit(jax.vmap(reset_one))
    self._step = jax.jit(jax.vmap(step_one))

  @property
  def task(self):
    return self._task

  def reset(self, key):
    return self._reset(jax.random.split(key, self._batch))

  def step(self, carry, actions):
    """carry, actions (B, nu) -> (carry, (obs dict, reward, done))."""
    return self._step(carry, actions)

  def action_spec(self):
    """Per-lane action spec (batch leading axis NOT included)."""
    from dm_control_tpu.rl.control import action_spec
    return action_spec(self._model)
