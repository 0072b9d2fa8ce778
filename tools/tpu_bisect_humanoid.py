"""Bisect the humanoid TPU device fault: batch size x pallas on/off.

Usage: python tools/tpu_bisect_humanoid.py <batch> [steps]
Env: DMC_TPU_DISABLE_PALLAS=1 to test the XLA path.
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

from dm_control_tpu import suite
from dm_control_tpu.parallel.runner import BatchedEnv

task = suite.build_task('humanoid', 'run')
env = BatchedEnv(task, batch, auto_reset=True)
key = jax.random.PRNGKey(0)
state = env.reset(key)
run = env.rollout_fn(steps)
t0 = time.perf_counter()
state, rewards = run(state, jax.random.fold_in(key, 1))
jax.block_until_ready(rewards)
print(f'compile+run1 ok ({time.perf_counter() - t0:.0f}s)', flush=True)
t0 = time.perf_counter()
state, rewards = run(state, jax.random.fold_in(key, 2))
jax.block_until_ready(rewards)
dt = time.perf_counter() - t0
import numpy as np
print(f'batch={batch} pallas={"off" if os.environ.get("DMC_TPU_DISABLE_PALLAS")=="1" else "on"} '
      f'steps/s={batch*steps/dt:,.0f} reward_mean={np.asarray(rewards).mean():.4f}')
