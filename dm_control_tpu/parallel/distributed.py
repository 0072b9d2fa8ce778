"""Multi-host distribution: mesh over (hosts, devices), sharded SAC.

The reference has NO distributed runtime (SURVEY.md section 2.2) — this
layer is the TPU-native first-class replacement: `jax.distributed` for
process bootstrap, a 2-D ('hosts', 'envs') mesh over the pod slice, env
batches sharded across both axes, parameters replicated, and gradient
all-reduces inserted by GSPMD riding ICI within a host and DCN across
hosts.  Single-process multi-chip and CPU-simulated multi-host (via
xla_force_host_platform_device_count) use the same code path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
  """Bootstrap multi-process JAX (no-op for a single process).

  On a real v5e pod slice each host calls this with the coordinator's
  address; under a scheduler (GKE/Borg-like) the None defaults let JAX
  auto-discover."""
  if num_processes is not None and num_processes <= 1:
    return
  jax.distributed.initialize(coordinator_address=coordinator_address,
                             num_processes=num_processes,
                             process_id=process_id)


def host_mesh(hosts: Optional[int] = None) -> Mesh:
  """2-D ('hosts', 'envs') mesh over all devices.

  `hosts` defaults to jax.process_count(); pass an explicit count to
  simulate multi-host topology on a single process (tests use 2 x 4 over
  8 virtual CPU devices)."""
  devices = np.array(jax.devices())
  n_hosts = hosts if hosts is not None else max(jax.process_count(), 1)
  if len(devices) % n_hosts:
    raise ValueError(f'{len(devices)} devices not divisible into '
                     f'{n_hosts} hosts')
  grid = devices.reshape(n_hosts, len(devices) // n_hosts)
  return Mesh(grid, ('hosts', 'envs'))


def env_sharding(mesh: Mesh) -> NamedSharding:
  """Batch-axis sharding over BOTH mesh axes (pure data parallelism)."""
  return NamedSharding(mesh, P(('hosts', 'envs')))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, batch_size: int):
  """Device-put a pytree: leading-batch leaves sharded, rest replicated."""
  es, rs = env_sharding(mesh), replicated(mesh)

  def put(x):
    shardable = (getattr(x, 'ndim', 0) >= 1 and x.shape
                 and x.shape[0] == batch_size)
    return jax.device_put(x, es if shardable else rs)

  return jax.tree_util.tree_map(put, tree)


def host_fold_key(key: jax.Array) -> jax.Array:
  """Host-local RNG stream (reference-less; SURVEY section 5 mandate)."""
  return jax.random.fold_in(key, jax.process_index())


def make_sac_trainer(domain: str, task_name: str, mesh: Mesh,
                     batch_size: int, seed: int = 0,
                     config=None) -> Tuple[tuple, callable]:
  """Sharded SAC training: returns (carry, train_fn).

  The env batch (and replay) shard over ('hosts','envs'); SAC parameters
  replicate; the learner's gradient reduction is a GSPMD all-reduce over
  the whole mesh — exactly BASELINE config #5's topology."""
  from dm_control_tpu import suite
  from dm_control_tpu.parallel.runner import BatchedEnv
  from dm_control_tpu.rl import sac as sac_lib

  task = suite.build_task(domain, task_name)
  env = BatchedEnv(task, batch_size, auto_reset=True)
  cfg = config or sac_lib.SACConfig()
  sac = sac_lib.SAC(task, cfg)
  key = jax.random.PRNGKey(seed)
  k_env, k_sac = jax.random.split(key)

  run_state = shard_batch(mesh, env.reset(k_env), batch_size)
  sac_state = jax.device_put(sac.init(k_sac), replicated(mesh))
  # replay is replicated: its capacity axis is written with per-step slabs
  # gathered from the sharded env batch (all_gather inserted by GSPMD)
  replay = jax.device_put(
      sac_lib.replay_init(cfg.replay_capacity, sac.obs_dim, task.model.nu),
      replicated(mesh))

  step = sac_lib.make_train_step(sac, env)
  train = jax.jit(step)
  carry = (sac_state, run_state, replay, host_fold_key(key))
  return carry, train
