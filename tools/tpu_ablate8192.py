"""Find the op that faults the chip for humanoid at batch 8192.

Each ablation runs in a fresh subprocess (a device fault taints the
process).  Usage:
  python tools/tpu_ablate8192.py            # driver: run all ablations
  python tools/tpu_ablate8192.py <ablation> # child: run one config
"""
import os
import subprocess
import sys

ABLATIONS = ['baseline', 'no_solve', 'no_collide', 'no_kinematics',
             'no_sensors', 'no_eulerdamp', 'no_factor_m', 'no_actuation']

if len(sys.argv) == 1:
  for ab in ABLATIONS:
    r = subprocess.run([sys.executable, __file__, ab],
                       capture_output=True, text=True, timeout=1500)
    src = r.stdout if r.stdout.strip() else r.stderr
    last = [l for l in src.splitlines() if l.strip()][-1] if src.strip() else ''
    print(f'{ab:16s} rc={r.returncode}  {last[:110]}', flush=True)
  sys.exit(0)

ab = sys.argv[1]

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_tpudbg')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
sys.path.insert(0, '/root/repo')

import jax.numpy as jnp
import numpy as np

from dm_control_tpu import suite
from dm_control_tpu._src import forward as fwd
from dm_control_tpu._src import smooth, collision, constraint, sensor
import dm_control_tpu._src.solver as solver_mod

ident = lambda m_, d: d

if ab == 'no_solve':
  solver_mod.solve = lambda m_, d: d.replace(
      qacc=d.qacc_smooth, qacc_warmstart=d.qacc_smooth,
      qfrc_constraint=jnp.zeros(m_.nv, d.qpos.dtype))
elif ab == 'no_collide':
  collision.collide = ident
  constraint.make_constraint = ident
elif ab == 'no_kinematics':
  smooth.kinematics = ident
elif ab == 'no_sensors':
  sensor.sensors = lambda m_, d, stages=None: d
elif ab == 'no_eulerdamp':
  fwd.euler = lambda m_, d: fwd._advance(m_, d, d.qacc, d.act_dot)
elif ab == 'no_factor_m':
  smooth.factor_m = ident
elif ab == 'no_actuation':
  fwd.fwd_actuation = ident

B = int(os.environ.get('ABLATE_BATCH', '8192'))
K = int(os.environ.get('ABLATE_STEPS', '50'))
task = suite.build_task('humanoid', 'run')
m = task.model
keys = jax.random.split(jax.random.PRNGKey(0), B)


def init_one(k):
  d = fwd.make_data(m)
  qpos = d.qpos + 0.01 * jax.random.normal(k, (m.nq,), d.qpos.dtype)
  return fwd.forward(m, d.replace(qpos=qpos))


db = jax.jit(jax.vmap(init_one))(keys)
jax.block_until_ready(db.qpos)
lo = np.where(m.actuator_ctrllimited, m.actuator_ctrlrange[:, 0], -1.0)
hi = np.where(m.actuator_ctrllimited, m.actuator_ctrlrange[:, 1], 1.0)


@jax.jit
def run(d, key):
  def body(carry, _):
    dd, k = carry
    k, sub = jax.random.split(k)
    ctrl = jax.random.uniform(sub, (B, m.nu), minval=jnp.asarray(lo),
                              maxval=jnp.asarray(hi), dtype=jnp.float32)
    dd = dd.replace(ctrl=ctrl)
    dd = jax.vmap(lambda x: fwd.step(m, x))(dd)
    return (dd, k), None
  (d, _), _ = jax.lax.scan(body, (d, key), None, length=K)
  return d


r = run(db, jax.random.PRNGKey(1))
jax.block_until_ready(r.qpos)
import time
t0 = time.perf_counter()
r = run(r, jax.random.PRNGKey(2))
jax.block_until_ready(r.qpos)
dt = time.perf_counter() - t0
print(f'{ab}: OK {B * K / dt:,.0f} steps/s ({dt / K * 1e3:.1f} ms/step)')
