"""Batch-size scaling of the Newton solve: overhead-bound vs throughput.

Times the solve in-scan (dispatch amortized) at several batch sizes on
the SAME realistic state distribution.  If ms/solve is flat in B, the
while-loop body is dominated by per-op fixed latencies, not array work.

Usage: python tools/tpu_solve_scale.py [domain] [task]
"""
import functools
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
BMAX = 4096

task = suite.build_task(domain, task_name)
m = task.model
n_sub = max(1, round(task.control_timestep / float(m.opt.timestep)))
keys = jax.random.split(jax.random.PRNGKey(0), BMAX)
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
    u = jax.random.uniform(k, (BMAX, m.nu), d.qpos.dtype,
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
lay = efc.layout(m)
dtype = ds.qpos.dtype
tol = solver.effective_tol(float(m.opt.tolerance), dtype)
mi = float(getattr(m, 'stat_meaninertia', 1.0) or 1.0)
core = functools.partial(solver._solve_core_xla, lay=lay, niter=100,
                         ls_iter=12, tol=tol, meaninertia=mi)
print(f'{domain}-{task_name} nefc={ds.efc_J.shape[1]} nv={m.nv}')

for B in [512, 1024, 2048, 4096]:
  sl = jax.tree.map(lambda x: x[:B], ds)

  @jax.jit
  def run(d, K=10):
    def body(c, _):
      x, f = jax.vmap(core)(d.efc_J, d.qM, d.efc_aref, d.efc_D,
                            d.efc_frictionloss, d.efc_active.astype(dtype),
                            d.qacc_smooth, d.qacc_warmstart + 1e-12 * c)
      return x, None
    c, _ = jax.lax.scan(body, jnp.zeros((B, m.nv), dtype), None, length=10)
    return c

  out = jax.block_until_ready(run(sl))
  t0 = time.perf_counter()
  out = jax.block_until_ready(run(sl))
  dt = (time.perf_counter() - t0) / 10 * 1e3
  print(f'B={B:5d}: {dt:7.3f} ms/solve  ({dt / B * 1e3:.2f} us/env)')
