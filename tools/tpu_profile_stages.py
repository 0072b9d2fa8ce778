"""Scan-amortized per-stage timing of the forward pipeline on TPU.

Times jit(scan(stage, K))/K for progressively larger stage compositions;
consecutive diffs give true per-stage cost with RPC overhead amortized.

Usage: python tools/tpu_profile_stages.py [domain] [task] [batch] [K]
"""
import sys
import time

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_tpudbg')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
sys.path.insert(0, '/root/repo')

import jax.numpy as jnp
import numpy as np

from dm_control_tpu import suite
from dm_control_tpu._src import forward as fwd
from dm_control_tpu._src import smooth, collision, constraint, solver, sensor

domain = sys.argv[1] if len(sys.argv) > 1 else 'humanoid'
task_name = sys.argv[2] if len(sys.argv) > 2 else 'run'
B = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
K = int(sys.argv[4]) if len(sys.argv) > 4 else 20

task = suite.build_task(domain, task_name)
m = task.model
keys = jax.random.split(jax.random.PRNGKey(0), B)


def init_one(k):
  d = fwd.make_data(m)
  qpos = d.qpos + 0.05 * jax.random.normal(k, (m.nq,), d.qpos.dtype)
  return fwd.forward(m, d.replace(qpos=qpos))


db = jax.jit(jax.vmap(init_one))(keys)
jax.block_until_ready(db.qpos)

STAGES = [
    ('kinematics', smooth.kinematics),
    ('com_pos', smooth.com_pos),
    ('crb', smooth.crb),
    ('factor_m', smooth.factor_m),
    ('tendon', smooth.tendon),
    ('collide', collision.collide),
    ('transmission', smooth.transmission),
    ('make_constraint', constraint.make_constraint),
    ('com_vel', smooth.com_vel),
    ('rne', smooth.rne),
    ('passive', fwd.passive),
    ('sensors_posvel', lambda m, d: sensor.sensors(m, d, stages='posvel')),
    ('actuation', fwd.fwd_actuation),
    ('fwd_acceleration', fwd.fwd_acceleration),
    ('solve', solver.solve),
]

prev = 0.0
for n in range(1, len(STAGES) + 1):
  chain = STAGES[:n]

  def one(d, _, chain=chain):
    for _, f in chain:
      d = jax.vmap(lambda dd, f=f: f(m, dd))(d)
    # feed qpos back so the scan carry changes (prevents hoisting)
    d = d.replace(qpos=d.qpos + 1e-9 * d.qvel[:m.nq] if m.nq == m.nv
                  else d.qpos)
    return d, None

  @jax.jit
  def run(d, chain=chain):
    d, _ = jax.lax.scan(lambda dd, x: one(dd, x), d, None, length=K)
    return d

  r = run(db)
  jax.block_until_ready(r.qpos)
  t0 = time.perf_counter()
  r = run(db)
  jax.block_until_ready(r.qpos)
  dt = (time.perf_counter() - t0) / K * 1e3
  print(f'+{STAGES[n-1][0]:18s} cum={dt:7.3f} ms  delta={dt - prev:7.3f} ms',
        flush=True)
  prev = dt
