"""Absolute per-stage timing of the humanoid substep on the chip.

Times each pipeline stage in isolation (K reps inside one scan, fixed
input data) so costs don't overlap the way removal-ablations do.

Usage: python tools/tpu_profile_stages.py [batch] [K]
"""
import sys
import time

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_tpudbg')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
sys.path.insert(0, '/root/repo')

import jax.numpy as jnp

from dm_control_tpu import suite
from dm_control_tpu._src import (collision, constraint, forward as fwd,
                                 sensor, smooth)
import dm_control_tpu._src.solver as solver_mod

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
K = int(sys.argv[2]) if len(sys.argv) > 2 else 30

task = suite.build_task('humanoid', 'run')
m = task.model
keys = jax.random.split(jax.random.PRNGKey(0), B)


def init_one(k):
  d = fwd.make_data(m)
  qpos = d.qpos + 0.01 * jax.random.normal(k, (m.nq,), d.qpos.dtype)
  d = d.replace(qpos=qpos,
                qvel=0.1 * jax.random.normal(jax.random.fold_in(k, 1),
                                             (m.nv,), d.qpos.dtype))
  return fwd.forward(m, d)


db = jax.jit(jax.vmap(init_one))(keys)
jax.block_until_ready(db.qpos)

STAGES = [
    ('kinematics', lambda d: smooth.kinematics(m, d)),
    ('com_pos+crb', lambda d: smooth.crb(m, smooth.com_pos(m, d))),
    ('factor_m', lambda d: smooth.factor_m(m, d)),
    ('collide', lambda d: collision.collide(m, d)),
    ('make_constraint', lambda d: constraint.make_constraint(m, d)),
    ('com_vel+rne', lambda d: smooth.rne(m, smooth.com_vel(m, d))),
    ('sensors', lambda d: sensor.sensors(m, d)),
    ('actuation', lambda d: fwd.fwd_actuation(m, d)),
    ('acceleration', lambda d: fwd.fwd_acceleration(m, d)),
    ('solve', lambda d: solver_mod.solve(m, d)),
    ('euler', lambda d: fwd.euler(m, d)),
    ('FULL fwd.step', lambda d: fwd.step(m, d)),
]


def time_stage(name, fn):
  @jax.jit
  def run(d):
    # every stage maps Data -> Data: feed the output back as the next
    # input so XLA cannot dead-code-eliminate the loop body
    def body(dd, _):
      return jax.vmap(lambda x: fn(x))(dd), None
    d, _ = jax.lax.scan(body, d, None, length=K)
    return d
  out = run(db)
  jax.block_until_ready(out.qpos)
  t0 = time.perf_counter()
  out = run(db)
  jax.block_until_ready(out.qpos)
  dt = (time.perf_counter() - t0) / K
  print(f'{name:18s} {dt * 1e3:8.2f} ms', flush=True)


for name, fn in STAGES:
  try:
    time_stage(name, fn)
  except Exception as e:
    print(f'{name:18s} ERROR {type(e).__name__}: {str(e)[:120]}',
          flush=True)
