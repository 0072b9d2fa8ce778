"""A/B the monolithic Newton Pallas kernel vs the XLA core on real states.

Usage: DMC_TPU_NEWTON_KERNEL=on|off python tools/tpu_solve_kernel_ab.py \
          [domain] [task] [batch]
"""
import functools
import os
import sys
import time

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_tpudbg')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
sys.path.insert(0, '/root/repo')

import jax.numpy as jnp
import numpy as np

from dm_control_tpu import suite
from dm_control_tpu._src import efc, forward as fwd, solver

domain = sys.argv[1] if len(sys.argv) > 1 else 'humanoid'
task_name = sys.argv[2] if len(sys.argv) > 2 else 'run'
B = int(sys.argv[3]) if len(sys.argv) > 3 else 4096

task = suite.build_task(domain, task_name)
m = task.model
n_sub = max(1, round(task.control_timestep / float(m.opt.timestep)))
keys = jax.random.split(jax.random.PRNGKey(0), B)
lo = np.where(m.actuator_ctrllimited, m.actuator_ctrlrange[:, 0], -1.0)
hi = np.where(m.actuator_ctrllimited, m.actuator_ctrlrange[:, 1], 1.0)


def init_one(k):
  d = fwd.make_data(m)
  qpos = d.qpos + 0.01 * jax.random.normal(k, (m.nq,), d.qpos.dtype)
  return fwd.forward(m, d.replace(qpos=qpos))


@jax.jit
def rollout(d, key):
  def body(carry, k):
    d = carry
    u = jax.random.uniform(k, (B, m.nu), d.qpos.dtype,
                           jnp.asarray(lo, d.qpos.dtype),
                           jnp.asarray(hi, d.qpos.dtype))
    d = d.replace(ctrl=u)
    d = jax.vmap(lambda dd: fwd.substeps(m, dd, n_sub))(d)
    return d, None
  d, _ = jax.lax.scan(body, d, jax.random.split(key, 40))
  return d


db = rollout(jax.jit(jax.vmap(init_one))(keys), jax.random.PRNGKey(1))


@jax.jit
@jax.vmap
def pre_solve(d):
  d = fwd.step1(m, d, skipsensor=True)
  d = fwd.fwd_actuation(m, d)
  d = fwd.fwd_acceleration(m, d)
  return d


ds = pre_solve(db)
jax.block_until_ready(ds.qpos)
print(f'{domain}-{task_name} B={B} nefc={ds.efc_J.shape[1]} nv={m.nv} '
      f"kernel={os.environ.get('DMC_TPU_NEWTON_KERNEL', 'auto')}")


@jax.jit
def run(d):
  def body(c, _):
    dd = d.replace(qacc_warmstart=d.qacc_warmstart + 1e-12 * c)
    out = jax.vmap(lambda x: solver.solve(m, x))(dd)
    return out.qacc, None
  c, _ = jax.lax.scan(body, jnp.zeros((B, m.nv), d.qpos.dtype), None,
                      length=10)
  return c


out = jax.block_until_ready(run(ds))
t0 = time.perf_counter()
out = jax.block_until_ready(run(ds))
dt = (time.perf_counter() - t0) / 10 * 1e3
print(f'solve: {dt:7.3f} ms')
