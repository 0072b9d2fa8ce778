"""Ablation timing of the real step: monkeypatch stages out one at a time.

Usage: python tools/tpu_profile_ablate.py [domain] [task] [batch] [K]
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
K = int(sys.argv[4]) if len(sys.argv) > 4 else 50

task = suite.build_task(domain, task_name)
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

ident = lambda m_, d: d


def timed(label):
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
  t0 = time.perf_counter()
  r = run(db, jax.random.PRNGKey(2))
  jax.block_until_ready(r.qpos)
  dt = (time.perf_counter() - t0) / K * 1e3
  print(f'{label:32s} {dt:7.2f} ms/substep', flush=True)


timed('baseline (full step)')

orig = {}


def patch(mod, name):
  orig[(mod, name)] = getattr(mod, name)
  setattr(mod, name, ident)


def unpatch():
  for (mod, name), f in orig.items():
    setattr(mod, name, f)
  orig.clear()


import dm_control_tpu._src.solver as solver_mod

# solver -> passthrough qacc_smooth
orig[(solver_mod, 'solve')] = solver_mod.solve
solver_mod.solve = lambda m_, d: d.replace(
    qacc=d.qacc_smooth, qacc_warmstart=d.qacc_smooth,
    qfrc_constraint=jnp.zeros(m_.nv, d.qpos.dtype))
timed('- solve')
unpatch()

patch(collision, 'collide')
patch(constraint, 'make_constraint')
timed('- collide+make_constraint')
unpatch()

patch(smooth, 'factor_m')
timed('- factor_m')
unpatch()

patch(smooth, 'kinematics')
timed('- kinematics')
unpatch()

patch(smooth, 'crb')
patch(smooth, 'com_pos')
timed('- crb+com_pos')
unpatch()

patch(smooth, 'rne')
patch(smooth, 'com_vel')
timed('- rne+com_vel')
unpatch()

orig[(sensor, 'sensors')] = sensor.sensors
sensor.sensors = lambda m_, d, stages=None: d
timed('- sensors')
unpatch()

orig[(fwd, '_energy')] = fwd._energy
fwd._energy = ident
timed('- energy')
unpatch()

orig[(fwd, 'euler')] = fwd.euler
fwd.euler = lambda m_, d: fwd._advance(m_, d, d.qacc, d.act_dot)
timed('- eulerdamp solve')
unpatch()
