"""dm_env-compatible episode loop over functional tasks.

The host-side replacement for the reference's `control.Environment`
(dm_control/rl/control.py:35-197): same step/reset/TimeStep semantics
(substep loop, time-limit truncation with discount 1.0, task termination
with task-provided discount), but physics is a jitted pure `step` closure
and task logic is a struct of pure functions (`TaskDef`).

This adapter exists for API familiarity and single-env parity testing;
the TPU-native hot path is `dm_control_tpu.parallel` (batched, in-graph).
"""

from __future__ import annotations

import collections
import dataclasses
from typing import Any, Callable, Dict, Optional

import dm_env
from dm_env import specs
import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import engine
from dm_control_tpu._src import forward as _forward
from dm_control_tpu._src.types import Data, Model


@dataclasses.dataclass
class TaskDef:
  """A task as a struct of pure functions over (Model, Data).

  Replaces the reference's stateful Task callbacks
  (dm_control/rl/control.py:276-374) with jit-safe pure functions:

    init_episode(model, data, key) -> Data   episode-randomized state
    get_observation(model, data) -> OrderedDict[str, Array]
    get_reward(model, data) -> scalar Array
    get_termination(model, data) -> scalar bool Array (or None attribute)
  """
  name: str
  model: Model
  init_episode: Callable[[Model, Data, jax.Array], Data]
  get_observation: Callable[[Model, Data], 'collections.OrderedDict']
  get_reward: Callable[[Model, Data], jax.Array]
  get_termination: Optional[Callable[[Model, Data], jax.Array]] = None
  # optional action transform (reference Task.before_step): maps the
  # agent action to Data (typically writing ctrl + auxiliary state)
  before_step: Optional[Callable[[Model, Data, jax.Array], Data]] = None
  # optional action-spec override (e.g. jaco's relative 7-dof actions)
  action_spec_fn: Optional[Callable[[], Any]] = None
  control_timestep: Optional[float] = None  # default: physics timestep
  # True when init_episode is expensive (e.g. cheetah's 200-step settle):
  # batched runners then auto-reset from a precomputed state pool instead
  # of re-running init in-graph every step.
  expensive_init: bool = False

  def n_sub_steps(self) -> int:
    if self.control_timestep is None:
      return 1
    dt = self.model.opt.timestep
    n = self.control_timestep / dt
    rounded = int(round(n))
    if abs(n - rounded) > 1e-6:
      raise ValueError(
          f'control_timestep {self.control_timestep} not divisible by '
          f'physics timestep {dt}')
    return rounded


def _task_jits(task: TaskDef):
  """Jitted closures for a TaskDef, cached on the TaskDef object so that
  repeated Environment construction never recompiles."""
  cache = getattr(task, '_jits', None)
  if cache is not None:
    return cache
  m = task.model
  step_fn = engine.build_step(m)
  forward_fn = engine.build_forward(m)

  def _reset(key):
    d = _forward.make_data(m)
    return task.init_episode(m, d, key)

  reset_fn = jax.jit(_reset)
  before_fn = (jax.jit(lambda d, a: task.before_step(m, d, a))
               if task.before_step is not None else None)
  observe_fn = jax.jit(lambda d: task.get_observation(m, d))
  reward_fn = jax.jit(lambda d: task.get_reward(m, d))
  term_fn = (jax.jit(lambda d: task.get_termination(m, d))
             if task.get_termination is not None else None)
  cache = (step_fn, forward_fn, reset_fn, observe_fn, reward_fn, term_fn,
           before_fn)
  task._jits = cache
  return cache


class Environment(dm_env.Environment):
  """Single-env dm_env adapter over a TaskDef."""

  def __init__(self, task: TaskDef, time_limit: float = float('inf'),
               random: Optional[int] = None,
               flat_observation: bool = False):
    self._task = task
    self._model = task.model
    self._flat_observation = flat_observation
    self._time_limit = time_limit
    self._n_sub_steps = task.n_sub_steps()
    if time_limit == float('inf'):
      self._step_limit = float('inf')
    else:
      self._step_limit = time_limit / (
          self._model.opt.timestep * self._n_sub_steps)
    self._step_count = 0
    self._episode_count = 0

    seed = np.random.SeedSequence(random).entropy if random is None else random
    self._base_key = jax.random.PRNGKey(np.uint32(seed & 0xFFFFFFFF))

    jits = _task_jits(task)
    (self._step_fn, self._forward_fn, self._reset_fn, self._observe_fn,
     self._reward_fn, self._term_fn, self._before_fn) = jits
    self._data: Optional[Data] = None

  # -- dm_env interface ----------------------------------------------------

  def set_reward_visualizer(self, fn):
    """fn(data, reward) -> data, applied after every step (the role of
    reference suite/base.py:83-112 _set_reward_colors: blending
    self/effector/target material colors into the rendered scene)."""
    self._reward_viz = jax.jit(fn) if fn is not None else None

  def reset(self) -> dm_env.TimeStep:
    key = jax.random.fold_in(self._base_key, self._episode_count)
    self._episode_count += 1
    self._step_count = 0
    d = self._reset_fn(key)
    d = self._forward_fn(d)
    if getattr(self, '_reward_viz', None) is not None:
      d = self._reward_viz(d, jnp.zeros((), d.qpos.dtype))
    self._data = d
    obs = self._observation()
    return dm_env.TimeStep(dm_env.StepType.FIRST, None, None, obs)

  def step(self, action) -> dm_env.TimeStep:
    if self._data is None:
      return self.reset()
    if self._before_fn is not None:
      d = self._before_fn(self._data,
                          jnp.asarray(action, self._data.qpos.dtype))
    else:
      d = self._data.replace(
          ctrl=jnp.asarray(action, self._data.ctrl.dtype))
    for _ in range(self._n_sub_steps):
      d = self._step_fn(d)
    self._data = d
    self._step_count += 1

    reward = float(self._reward_fn(d))
    if getattr(self, '_reward_viz', None) is not None:
      d = self._reward_viz(d, jnp.asarray(reward, d.qpos.dtype))
      self._data = d
    obs = self._observation()

    episode_over = self._step_count >= self._step_limit
    discount = None
    if self._term_fn is not None:
      term = self._term_fn(d)
      if bool(term):
        discount = 0.0
    if bool(d.diverged):
      discount = 0.0
    if discount is not None:
      self._data = None
      return dm_env.TimeStep(dm_env.StepType.LAST, reward, discount, obs)
    if episode_over:
      self._data = None
      return dm_env.TimeStep(dm_env.StepType.LAST, reward, 1.0, obs)
    return dm_env.TimeStep(dm_env.StepType.MID, reward, 1.0, obs)

  def action_spec(self):
    if self._task.action_spec_fn is not None:
      return self._task.action_spec_fn()
    return action_spec(self._model)

  def observation_spec(self):
    obs = self._observe_fn(_dummy_data(self))
    out = collections.OrderedDict()
    for k, v in obs.items():
      arr = np.asarray(v)
      out[k] = specs.Array(shape=arr.shape, dtype=arr.dtype, name=k)
    if self._flat_observation:
      return flatten_observation_spec(out)
    return out

  # -- helpers -------------------------------------------------------------

  @property
  def physics(self) -> Data:
    """Latest Data (the reference exposes `env.physics`)."""
    return self._data

  @property
  def task(self) -> TaskDef:
    return self._task

  def control_timestep(self) -> float:
    return self._model.opt.timestep * self._n_sub_steps

  def set_state(self, qpos, qvel, act=None, model_var=None):
    """Force the physics state (used by parity tests)."""
    d = self._data if self._data is not None else _forward.make_data(
        self._model)
    d = d.replace(qpos=jnp.asarray(qpos, d.qpos.dtype),
                  qvel=jnp.asarray(qvel, d.qvel.dtype))
    if act is not None:
      d = d.replace(act=jnp.asarray(act, d.act.dtype))
    if model_var is not None:
      mv = dict(d.model_var or {})
      mv.update({k: jnp.asarray(v, d.qpos.dtype)
                 for k, v in model_var.items()})
      d = d.replace(model_var=mv)
    self._data = self._forward_fn(d)
    self._step_count = 0

  def _observation(self):
    obs = self._observe_fn(self._data)
    obs = collections.OrderedDict(
        (k, np.asarray(v)) for k, v in obs.items())
    if self._flat_observation:
      return flatten_observation(obs)
    return obs


def _dummy_data(env: Environment) -> Data:
  d = _forward.make_data(env._model)
  return env._forward_fn(d)


def action_spec(model: Model):
  """BoundedArray over actuator control ranges (reference
  dm_control/mujoco/engine.py:955)."""
  lo = np.where(model.actuator_ctrllimited, model.actuator_ctrlrange[:, 0],
                -np.inf)
  hi = np.where(model.actuator_ctrllimited, model.actuator_ctrlrange[:, 1],
                np.inf)
  return specs.BoundedArray(
      shape=(model.nu,), dtype=np.float64, minimum=lo, maximum=hi,
      name='\t'.join(
          model.id2name('actuator', i) or str(i) for i in range(model.nu)))


def flatten_observation(obs: Dict[str, np.ndarray],
                        output_key: str = 'observations'):
  """Concatenate dict obs into one vector (reference rl/control.py:377-402)."""
  if not isinstance(obs, collections.abc.MutableMapping):
    raise ValueError('observation must be a dict')
  keys = list(obs.keys())
  flat = [np.atleast_1d(np.asarray(obs[k]).ravel()) for k in keys]
  return collections.OrderedDict([(output_key, np.concatenate(flat))])


def flatten_observation_spec(spec, output_key: str = 'observations'):
  dim = sum(int(np.prod(s.shape)) if s.shape else 1 for s in spec.values())
  dtype = next(iter(spec.values())).dtype if spec else np.float64
  return collections.OrderedDict(
      [(output_key, specs.Array(shape=(dim,), dtype=dtype,
                                name=output_key))])
