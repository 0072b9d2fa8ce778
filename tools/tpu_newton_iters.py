"""Measure the Newton solver's actual iteration distribution + niter knee.

The batched solve is a vmapped while_loop: every lane pays for the
worst lane's iteration count.  This tool rolls the real task to
realistic mid-episode states (with realistic warmstarts), then:
  1. prints the per-lane Newton iteration histogram,
  2. times the solve core at several niter caps and reports the qacc
     error vs the uncapped solution.

Usage: python tools/tpu_newton_iters.py [domain] [task] [batch] [steps]
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
B = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
N = int(sys.argv[4]) if len(sys.argv) > 4 else 40

task = suite.build_task(domain, task_name)
m = task.model
n_sub = max(1, round(task.control_timestep / float(m.opt.timestep)))
keys = jax.random.split(jax.random.PRNGKey(0), B)


def init_one(k):
  d = fwd.make_data(m)
  qpos = d.qpos + 0.01 * jax.random.normal(k, (m.nq,), d.qpos.dtype)
  return fwd.forward(m, d.replace(qpos=qpos))


db = jax.jit(jax.vmap(init_one))(keys)
lo = np.where(m.actuator_ctrllimited, m.actuator_ctrlrange[:, 0], -1.0)
hi = np.where(m.actuator_ctrllimited, m.actuator_ctrlrange[:, 1], 1.0)


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
  d, _ = jax.lax.scan(body, d, jax.random.split(key, N))
  return d


db = rollout(db, jax.random.PRNGKey(1))
jax.block_until_ready(db.qpos)
print(f'{domain}-{task_name} B={B} after {N} control steps '
      f'(n_sub={n_sub}), nv={m.nv}, nefc={db.efc_J.shape[1]}')

# reconstruct the solve inputs mid-pipeline (realistic warmstart from
# the rollout's final step)
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
meaninertia = float(getattr(m, 'stat_meaninertia', 1.0) or 1.0)
niter_full = max(int(m.opt.iterations), 1)

core = functools.partial(
    solver._solve_core_xla, lay=lay, niter=niter_full, ls_iter=12, tol=tol,
    meaninertia=meaninertia, return_iters=True)


@jax.jit
def run_iters(d):
  return jax.vmap(core)(d.efc_J, d.qM, d.efc_aref, d.efc_D,
                        d.efc_frictionloss, d.efc_active.astype(dtype),
                        d.qacc_smooth, d.qacc_warmstart)


x_full, f_full, its = jax.block_until_ready(run_iters(ds))
its = np.asarray(its)
print(f'iters: min={its.min()} p50={np.percentile(its, 50):.0f} '
      f'p90={np.percentile(its, 90):.0f} p99={np.percentile(its, 99):.0f} '
      f'max={its.max()} (budget {niter_full})')
hist = np.bincount(its, minlength=niter_full + 1)
nz = np.nonzero(hist)[0]
print('histogram:', {int(i): int(hist[i]) for i in nz})

# accuracy + speed at capped niter / varying ls_iter
x_full = np.asarray(x_full)
scale = np.maximum(1e-9, np.abs(x_full).max())
for cap, ls in [(niter_full, 12), (niter_full, 8), (niter_full, 6),
                (niter_full, 4), (10, 12), (10, 8), (8, 12)]:
  corec = functools.partial(
      solver._solve_core_xla, lay=lay, niter=cap, ls_iter=ls, tol=tol,
      meaninertia=meaninertia)

  @jax.jit
  def run_cap(d, corec=corec):
    return jax.vmap(corec)(d.efc_J, d.qM, d.efc_aref, d.efc_D,
                           d.efc_frictionloss, d.efc_active.astype(dtype),
                           d.qacc_smooth, d.qacc_warmstart)

  x, f = jax.block_until_ready(run_cap(ds))
  t0 = time.perf_counter()
  for _ in range(10):
    x, f = run_cap(ds)
  jax.block_until_ready(x)
  dt = (time.perf_counter() - t0) / 10
  err = np.abs(np.asarray(x) - x_full).max() / scale
  print(f'niter={cap:4d} ls={ls:2d}: {dt * 1e3:7.2f} ms  '
        f'rel qacc err {err:.2e}')
