"""Bisect the humanoid@4096 fault inside BatchedEnv (raw fwd.step is OK).

Stages, each blocking before the next:
  reset      vmapped init_episode (20-attempt rejection sampling) + forward
  step1      one env.step (substeps + obs/reward/termination + auto-reset)
  rollout    the full rollout_fn(K) scan

Usage: python tools/tpu_bisect_env4096.py <batch> [steps] [--no-auto-reset]
"""
import os
import sys
import time

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_tpudbg')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
sys.path.insert(0, '/root/repo')

batch = int(sys.argv[1])
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
auto_reset = '--no-auto-reset' not in sys.argv

import jax.numpy as jnp

from dm_control_tpu import suite
from dm_control_tpu.parallel.runner import BatchedEnv

task = suite.build_task('humanoid', 'run')
env = BatchedEnv(task, batch, auto_reset=auto_reset)
key = jax.random.PRNGKey(0)

t0 = time.perf_counter()
state = env.reset(key)
jax.block_until_ready(state.data.qpos)
print(f'reset OK ({time.perf_counter() - t0:.0f}s)', flush=True)

t0 = time.perf_counter()
acts = jnp.zeros((batch, task.model.nu), jnp.float32)
out = env.step(state, acts)
jax.block_until_ready(out[0].data.qpos)
print(f'step1 OK ({time.perf_counter() - t0:.0f}s)', flush=True)

t0 = time.perf_counter()
run = env.rollout_fn(steps)
state2, rewards = run(state, jax.random.fold_in(key, 1))
jax.block_until_ready(rewards)
print(f'rollout compile+run OK ({time.perf_counter() - t0:.0f}s)', flush=True)
t0 = time.perf_counter()
state2, rewards = run(state2, jax.random.fold_in(key, 2))
jax.block_until_ready(rewards)
dt = time.perf_counter() - t0
print(f'batch={batch} auto_reset={auto_reset} steps/s={batch*steps/dt:,.0f}',
      flush=True)
