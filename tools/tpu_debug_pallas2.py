"""Compare solver implementations against an f64 ground truth.

Phase 'gen': CPU f64 — build data for a model, solve at f64 (ground
truth), save inputs + truth to /tmp/pallas_dbg_<model>.npz.
Phase 'tpu': load, cast f32, run XLA core and Pallas kernel on the TPU,
report each one's error vs truth and vs each other.
Phase 'cpu32': same but on CPU f32 (XLA core + interpret kernel).
"""
import os
import sys

phase = sys.argv[1]
domain = sys.argv[2] if len(sys.argv) > 2 else 'quadruped'
task_name = sys.argv[3] if len(sys.argv) > 3 else 'walk'
batch = int(sys.argv[4]) if len(sys.argv) > 4 else 128
path = f'/tmp/pallas_dbg_{domain}_{task_name}.npz'

if phase in ('gen', 'cpu32'):
  os.environ['JAX_PLATFORMS'] = 'cpu'

import jax

if phase in ('gen', 'cpu32'):
  jax.config.update('jax_platforms', 'cpu')
if phase == 'gen':
  jax.config.update('jax_enable_x64', True)
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_tpudbg')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

sys.path.insert(0, '/root/repo')
import numpy as np
import jax.numpy as jnp

from dm_control_tpu import suite
from dm_control_tpu._src import efc
from dm_control_tpu._src import forward as fwd
from dm_control_tpu._src import solver

task = suite.build_task(domain, task_name)
m = task.model
lay = efc.layout(m)
niter = max(int(m.opt.iterations), 1)
tol = float(m.opt.tolerance)
mi = float(getattr(m, 'stat_meaninertia', 1.0) or 1.0)


def xla(d_tuple):
  J, M, aref, D, fl, act, a, warm = d_tuple
  t = tol if phase == 'gen' else solver.effective_tol(tol, 'float32')
  return solver._solve_core_xla(J, M, aref, D, fl, act, a, warm,
                                lay=lay, niter=niter, ls_iter=12, tol=t,
                                meaninertia=mi)


if phase == 'gen':
  keys = jax.random.split(jax.random.PRNGKey(0), batch)

  def init_one(k):
    d = fwd.make_data(m)
    qpos = d.qpos + 0.05 * jax.random.normal(k, (m.nq,), d.qpos.dtype)
    return fwd.forward(m, d.replace(qpos=qpos))

  db = jax.jit(jax.vmap(init_one))(keys)
  args = (db.efc_J, db.qM, db.efc_aref, db.efc_D, db.efc_frictionloss,
          db.efc_active.astype(db.qpos.dtype), db.qacc_smooth,
          db.qacc_smooth)
  x64, f64_ = jax.jit(jax.vmap(xla))(args)
  np.savez(path, J=args[0], M=args[1], aref=args[2], D=args[3],
           fl=args[4], act=args[5], a=args[6], warm=args[7],
           x_true=x64, f_true=f64_)
  print(f'saved {path}  nefc={args[0].shape[1]} nv={args[0].shape[2]}'
        f'  niter={niter} tol={tol}')
  sys.exit(0)

z = np.load(path)
args32 = tuple(jnp.asarray(z[k], jnp.float32)
               for k in ('J', 'M', 'aref', 'D', 'fl', 'act', 'a', 'warm'))
x_true = z['x_true']
scale = np.maximum(1.0, np.abs(x_true))


def report(name, x):
  e = np.abs(np.asarray(x, np.float64) / scale - x_true / scale)
  print(f'{name:24s} vs f64 truth: max={e.max():.3e} mean={e.mean():.3e} '
        f'lanes>{1e-3:g}: {(e.max(axis=1) > 1e-3).sum()}')
  return np.asarray(x, np.float64)


print(f'device={jax.devices()[0]} model={domain}-{task_name}')
x_xla, f_xla = jax.jit(jax.vmap(xla))(args32)
x_xla = report('xla-core f32', x_xla)

from dm_control_tpu.ops import newton_kernel
x_pal, f_pal = newton_kernel.newton_solve_batched(
    *args32, lay=lay, niter=niter, ls_iter=12,
    tol=solver.effective_tol(tol, 'float32'), meaninertia=mi,
    interpret=(phase == 'cpu32'))
x_pal = report('pallas kernel f32', x_pal)
e = np.abs(x_pal / scale - x_xla / scale)
print(f'{"kernel vs xla-core":24s}              max={e.max():.3e} '
      f'mean={e.mean():.3e}')
