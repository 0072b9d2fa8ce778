"""Marginal stage costs of the PRODUCTION substeps path at realistic states.

Rolls the task to mid-episode states first (real contact activity and
warmstarts), then times `substeps(m, d, n_sub)` with each stage
monkeypatched to identity.  Differences vs tpu_profile_ablate: substeps
(sensors only on the last substep, minimal scan carry) and a rollout
warmup, so numbers match what bench.py actually pays.

Usage: python tools/tpu_profile_substeps.py [domain] [task] [batch] [K]
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
from dm_control_tpu._src import collision, constraint, forward as fwd
from dm_control_tpu._src import sensor, smooth
import dm_control_tpu._src.solver as solver_mod

domain = sys.argv[1] if len(sys.argv) > 1 else 'humanoid'
task_name = sys.argv[2] if len(sys.argv) > 2 else 'run'
B = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
K = int(sys.argv[4]) if len(sys.argv) > 4 else 20
# optional comma-list of variant substrings to run (always incl. baseline)
ONLY = sys.argv[5].split(',') if len(sys.argv) > 5 else None

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


def control_scan(d, key, length):
  def body(carry, _):
    dd, k = carry
    k, sub = jax.random.split(k)
    ctrl = jax.random.uniform(sub, (B, m.nu), minval=jnp.asarray(lo),
                              maxval=jnp.asarray(hi), dtype=dd.qpos.dtype)
    dd = dd.replace(ctrl=ctrl)
    dd = jax.vmap(lambda x: fwd.substeps(m, x, n_sub))(dd)
    return (dd, k), None
  (d, _), _ = jax.lax.scan(body, (d, key), None, length=length)
  return d


db = jax.jit(jax.vmap(init_one))(keys)
db = jax.jit(lambda d, k: control_scan(d, k, 40))(db, jax.random.PRNGKey(7))
jax.block_until_ready(db.qpos)
print(f'{domain}-{task_name} B={B} n_sub={n_sub} nv={m.nv} '
      f'nefc={db.efc_J.shape[1]} (40-step warmup done)')


def timed(label):
  if (ONLY is not None and 'baseline' not in label
      and not any(s in label for s in ONLY)):
    return None
  run = jax.jit(lambda d, k: control_scan(d, k, K))
  r = run(db, jax.random.PRNGKey(1))
  jax.block_until_ready(r.qpos)
  t0 = time.perf_counter()
  r = run(db, jax.random.PRNGKey(2))
  jax.block_until_ready(r.qpos)
  dt = (time.perf_counter() - t0) / (K * n_sub) * 1e3
  print(f'{label:32s} {dt:7.3f} ms/substep', flush=True)
  return dt


base = timed('baseline (substeps)')

ident = lambda m_, d: d
orig = {}


def patch(mod, name, repl=None):
  orig[(mod, name)] = getattr(mod, name)
  setattr(mod, name, repl if repl is not None else ident)


def unpatch():
  for (mod, name), f in orig.items():
    setattr(mod, name, f)
  orig.clear()


patch(solver_mod, 'solve', lambda m_, d: d.replace(
    qacc=d.qacc_smooth, qacc_warmstart=d.qacc_smooth,
    qfrc_constraint=jnp.zeros(m_.nv, d.qpos.dtype)))
timed('- solve')
unpatch()

# solve with empty rows: isolates collide+mc assembly cost from the
# solver work they feed
patch(collision, 'collide')
patch(constraint, 'make_constraint')
timed('- collide+mc (solve on stale)')
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

patch(smooth, 'tendon')
patch(smooth, 'transmission')
timed('- tendon+transmission')
unpatch()

patch(sensor, 'sensors', lambda m_, d, stages=None: d)
timed('- sensors(last only)')
unpatch()

patch(fwd, 'passive')
timed('- passive')
unpatch()

patch(fwd, 'euler', lambda m_, d: fwd._advance(m_, d, d.qacc, d.act_dot))
timed('- eulerdamp solve')
unpatch()
