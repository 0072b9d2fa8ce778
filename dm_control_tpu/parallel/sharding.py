"""Mesh-sharded environment batches: scale-out across chips/hosts.

The reference has no distributed runtime at all (SURVEY.md section 2.2);
here scaling is first-class: env batches are sharded over a
`jax.sharding.Mesh` axis ('envs'), state stays device-resident, and
cross-chip reductions (aggregate returns, learner gradients) are XLA
collectives riding ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dm_control_tpu.parallel.runner import BatchedEnv, RunnerState
from dm_control_tpu.rl.control import TaskDef


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = 'envs') -> Mesh:
  devices = list(devices if devices is not None else jax.devices())
  return Mesh(np.array(devices), (axis_name,))


class ShardedBatchedEnv:
  """BatchedEnv with the batch axis sharded over a mesh axis."""

  def __init__(self, task: TaskDef, batch_size: int, mesh: Mesh,
               axis_name: str = 'envs', **kwargs):
    n_dev = mesh.devices.size
    if batch_size % n_dev:
      raise ValueError(f'batch {batch_size} not divisible by {n_dev} devices')
    self.mesh = mesh
    self.axis = axis_name
    self.env = BatchedEnv(task, batch_size, **kwargs)
    self._sharding = NamedSharding(mesh, P(axis_name))
    self._replicated = NamedSharding(mesh, P())

  def reset(self, key) -> RunnerState:
    state = self.env.reset(key)
    return jax.device_put(state, self._sharding_for(state))

  def _sharding_for(self, tree):
    n_dev = self.mesh.devices.size
    def spec(x):
      if getattr(x, 'ndim', 0) >= 1 and x.shape[0] % n_dev == 0:
        return NamedSharding(self.mesh, P(self.axis))
      return self._replicated
    return jax.tree_util.tree_map(spec, tree)

  def step(self, state, actions):
    return self.env.step(state, actions)

  def rollout_fn(self, n_steps: int):
    return self.env.rollout_fn(n_steps)
