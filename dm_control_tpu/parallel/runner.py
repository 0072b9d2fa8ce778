"""Vmapped batched environment runner with in-graph auto-reset.

One jitted `step` advances B environments in lockstep:

  actions (B, nu) -> physics substeps -> obs/reward/done -> auto-reset lanes

Auto-reset keeps reward/discount semantics identical to the reference's
episode loop (dm_control/rl/control.py:101-130): when an episode ends
(time limit, task termination, or divergence) the lane's returned
observation is the terminal one and the state is re-initialized in-graph
(`where`-select on the pytree), so no host synchronization ever happens.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import forward as _forward
from dm_control_tpu._src.types import Data, Model
from dm_control_tpu.rl.control import TaskDef
from dm_control_tpu._src.types import pytree_dataclass


@pytree_dataclass
class RunnerState:
  """Batched carry: env states + per-lane bookkeeping."""
  data: Data            # batched (leading axis B)
  step_count: jax.Array  # (B,) i4 control steps this episode
  episode_id: jax.Array  # (B,) i4
  rng: jax.Array        # (B, 2) per-lane PRNG keys
  reset_pool: Data      # (P, ...) precomputed initial states (pool resets)


def _tree_select(pred, a, b):
  """where(pred, a, b) broadcast over pytree leaves (pred is (B,))."""
  def sel(x, y):
    p = pred.reshape(pred.shape + (1,) * (x.ndim - 1))
    return jnp.where(p, x, y)
  return jax.tree_util.tree_map(sel, a, b)


class BatchedEnv:
  """Compiled batch-parallel environment for one TaskDef."""

  def __init__(self, task: TaskDef, batch_size: int,
               time_limit: float = float('inf'),
               auto_reset: bool = True):
    self.task = task
    self.model = task.model
    self.batch_size = batch_size
    self.n_sub_steps = task.n_sub_steps()
    if time_limit == float('inf'):
      self.step_limit = np.iinfo(np.int32).max
    else:
      self.step_limit = int(round(time_limit / (
          self.model.opt.timestep * self.n_sub_steps)))
    self.auto_reset = auto_reset

    m = self.model
    n_sub = self.n_sub_steps
    step_limit = self.step_limit

    def _init_one(key):
      d = _forward.make_data(m)
      d = task.init_episode(m, d, key)
      return _forward.forward(m, d)

    pool_resets = task.expensive_init

    # Auto-reset moves ONLY the integration state: derived fields are
    # recomputed by the next substeps() call before anything reads them,
    # so gathering/selecting them here would be pure HBM traffic (full
    # Data is ~5x the state size), and a state-only pool lets XLA DCE
    # the forward() inside fresh-lane inits.
    _state_of = lambda dd: {f: getattr(dd, f)
                            for f in _forward._STATE_FIELDS}

    def _reset(key):
      keys = jax.random.split(key, batch_size)
      data = jax.vmap(_init_one)(keys)
      if pool_resets:
        pool = _state_of(data)  # reuse the initial batch as the reset pool
      else:
        pool = jax.tree_util.tree_map(
            lambda x: x[:1], _state_of(data))  # tiny stub
      return RunnerState(
          data=data,
          step_count=jnp.zeros(batch_size, jnp.int32),
          episode_id=jnp.zeros(batch_size, jnp.int32),
          rng=jax.vmap(lambda k: jax.random.fold_in(k, 977))(keys),
          reset_pool=pool)

    def _env_step_one(d, action):
      return _forward.substeps(m, d.replace(ctrl=action), n_sub)

    def _step(state: RunnerState, actions):
      d = jax.vmap(_env_step_one)(state.data, actions)
      reward = jax.vmap(lambda dd: task.get_reward(m, dd))(d)
      obs = jax.vmap(lambda dd: task.get_observation(m, dd))(d)
      step_count = state.step_count + 1
      terminated = jnp.zeros(self.batch_size, bool)
      if task.get_termination is not None:
        terminated = jax.vmap(
            lambda dd: task.get_termination(m, dd))(d).astype(bool)
      truncated = step_count >= step_limit
      done = terminated | truncated | d.diverged
      discount = jnp.where(terminated | d.diverged, 0.0, 1.0)
      # diverged lanes: the reference raises PhysicsError and emits a
      # LAST step with no meaningful reward (rl/control.py:101-130);
      # in-graph, the NaN state must not leak into the reward stream
      reward = jnp.where(d.diverged, 0.0, reward)

      if self.auto_reset:
        if pool_resets:
          # expensive init: draw from the precomputed pool (pseudo-random
          # lane permutation so lanes do not replay their own start state)
          lane = jnp.arange(batch_size, dtype=jnp.uint32)
          idx = ((state.episode_id.astype(jnp.uint32) + 1)
                 * jnp.uint32(2654435761) + lane) % jnp.uint32(batch_size)
          fresh = jax.tree_util.tree_map(
              lambda x: x[idx.astype(jnp.int32)], state.reset_pool)
        else:
          new_keys = jax.vmap(
              lambda k, e: jax.random.fold_in(k, e))(
                  state.rng, state.episode_id + 1)
          fresh = _state_of(jax.vmap(_init_one)(new_keys))
        data = d.replace(**_tree_select(done, fresh, _state_of(d)))
        step_count = jnp.where(done, 0, step_count)
        episode_id = state.episode_id + done.astype(jnp.int32)
      else:
        data, episode_id = d, state.episode_id

      new_state = RunnerState(data=data, step_count=step_count,
                              episode_id=episode_id, rng=state.rng,
                              reset_pool=state.reset_pool)
      return new_state, (obs, reward, done, discount)

    self.reset = jax.jit(_reset)
    self.step = jax.jit(_step)
    self._step_fn = _step  # un-jitted, for scan-based rollouts

  def rollout_fn(self, n_steps: int):
    """Jitted (state, action_fn_key) -> (state, summed rewards) driver.

    Actions are drawn uniformly in ctrl range (throughput benchmarking);
    learners plug their policy in via `step` directly.

    The scan carries ONLY the integration state (same argument as
    forward.substeps): every derived Data field crossing the
    control-step boundary turns trace-constant contact/body indexing
    into dynamic gathers and adds per-step HBM copies of ~5x the state
    size.  step() recomputes all of it from qpos/qvel before anything
    reads it.  The returned RunnerState grafts the final carried state
    onto the input template; callers needing step()-complete derived
    fields at the final state run forward() on it (the Data is marked
    via time/qpos which are authoritative).
    """
    m = self.model
    lo = np.where(m.actuator_ctrllimited, m.actuator_ctrlrange[:, 0], -1.0)
    hi = np.where(m.actuator_ctrllimited, m.actuator_ctrlrange[:, 1], 1.0)
    step_fn = self._step_fn
    bsz = self.batch_size
    state_of = lambda dd: {f: getattr(dd, f)
                           for f in _forward._STATE_FIELDS}

    @jax.jit
    def run(state: RunnerState, key):
      # template / rng / reset_pool are loop-INVARIANT: closing over
      # them keeps them out of the carry (a carry is copied every
      # iteration even when unchanged)
      template, rng, pool = state.data, state.rng, state.reset_pool

      def body(carry, _):
        st, count, epi, k = carry
        k, sub = jax.random.split(k)
        actions = jax.random.uniform(
            sub, (bsz, m.nu), minval=jnp.asarray(lo),
            maxval=jnp.asarray(hi), dtype=template.qpos.dtype)
        full = RunnerState(data=template.replace(**st), step_count=count,
                           episode_id=epi, rng=rng, reset_pool=pool)
        out, (obs, reward, done, discount) = step_fn(full, actions)
        return (state_of(out.data), out.step_count, out.episode_id,
                k), reward

      carry0 = (state_of(state.data), state.step_count, state.episode_id,
                key)
      (st, count, epi, _), rewards = jax.lax.scan(
          body, carry0, None, length=n_steps)
      final = RunnerState(data=template.replace(**st), step_count=count,
                          episode_id=epi, rng=rng, reset_pool=pool)
      return final, rewards

    return run


def rollout(task: TaskDef, batch_size: int, n_steps: int,
            seed: int = 0) -> Tuple[RunnerState, jax.Array]:
  """Convenience: random-policy rollout; returns (final state, rewards)."""
  env = BatchedEnv(task, batch_size)
  key = jax.random.PRNGKey(seed)
  state = env.reset(key)
  run = env.rollout_fn(n_steps)
  return run(state, jax.random.fold_in(key, 1))
