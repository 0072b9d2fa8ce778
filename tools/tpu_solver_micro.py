"""Microbenchmark the pieces of one Newton iteration at batch scale.

Attributes the ~1.4 ms/iteration of the humanoid solve to: Hessian
assembly matmul, Cholesky solve, J matvecs, line search chain, and
forces/cost evals.

Usage: python tools/tpu_solver_micro.py [batch]
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
from dm_control_tpu._src import efc, forward as fwd, linalg, solver

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

task = suite.build_task('humanoid', 'run')
m = task.model
keys = jax.random.split(jax.random.PRNGKey(0), B)


def init_one(k):
  d = fwd.make_data(m)
  qpos = d.qpos + 0.01 * jax.random.normal(k, (m.nq,), d.qpos.dtype)
  return fwd.forward(m, d.replace(qpos=qpos))


db = jax.jit(jax.vmap(init_one))(keys)
jax.block_until_ready(db.qpos)
lay = efc.layout(m)
nefc, nv = db.efc_J.shape[1], m.nv
print(f'B={B} nefc={nefc} nv={nv} '
      f'active rows mean={np.asarray(db.efc_active).mean(1).mean():.2f}')

J = db.efc_J.astype(jnp.float32)
M = db.qM.astype(jnp.float32)
aref = db.efc_aref.astype(jnp.float32)
d_ = db.efc_D.astype(jnp.float32)
fl = db.efc_frictionloss.astype(jnp.float32)
active = db.efc_active.astype(jnp.float32)
a = db.qacc_smooth.astype(jnp.float32)
x = db.qacc.astype(jnp.float32)
w = (jax.random.uniform(jax.random.PRNGKey(2), (B, nefc)) < 0.4
     ).astype(jnp.float32) * d_
types = jnp.asarray(lay.types)


def timeit(label, fn, *args, reps=20):
  out = jax.block_until_ready(fn(*args))
  t0 = time.perf_counter()
  for _ in range(reps):
    out = fn(*args)
  jax.block_until_ready(out)
  dt = (time.perf_counter() - t0) / reps * 1e3
  print(f'{label:40s} {dt:7.3f} ms')
  return out


# 1. Hessian assembly: H = M + (J^T * w) @ J  (batched 27x200 @ 200x27)
@jax.jit
def h_assembly(J, M, w):
  return M + jnp.einsum('bei,be,bej->bij', J, w, J)


timeit('H = M + J^T W J (einsum)', h_assembly, J, M, w)


@jax.jit
def h_assembly2(J, M, w):
  Jw = J * w[:, :, None]
  return M + jax.lax.dot_general(
      Jw, J, (((1,), (1,)), ((0,), (0,))),
      preferred_element_type=jnp.float32)


timeit('H = M + J^T W J (dot_general)', h_assembly2, J, M, w)


@jax.jit
def h_assembly_bf16(J, M, w):
  Jw = (J * w[:, :, None]).astype(jnp.bfloat16)
  return M + jax.lax.dot_general(
      Jw, J.astype(jnp.bfloat16), (((1,), (1,)), ((0,), (0,))),
      preferred_element_type=jnp.float32)


timeit('H = M + J^T W J (bf16 in, f32 out)', h_assembly_bf16, J, M, w)

H = jax.block_until_ready(h_assembly2(J, M, w))
H = H + 1e-6 * jnp.eye(nv, dtype=jnp.float32)[None]
g = jax.random.normal(jax.random.PRNGKey(3), (B, nv), jnp.float32)

# 2. batched PSD solve via the linalg tier (vmapped solve_psd)
timeit('solve_psd (vmapped, kernel dispatch)',
       jax.jit(jax.vmap(linalg.solve_psd)), H, g)

# 3. J matvecs
timeit('djar = J @ delta', jax.jit(
    lambda J, v: jnp.einsum('bev,bv->be', J, v)), J, g)
timeit('grad = J^T @ f', jax.jit(
    lambda J, f: jnp.einsum('bev,be->bv', J, f)), J, active)


# 4. line search chain (12 iters of dphi_ddphi, diagonal rows only)
@jax.jit
def line_search(jar, djar, d_, fl, active, gma, dmd):
  alpha = jnp.ones((B,), jnp.float32)
  lo = jnp.zeros((B,), jnp.float32)
  hi = jnp.full((B,), 4.0, jnp.float32)
  is_eq = (types == solver.EQUALITY)[None]
  is_fr = (types == solver.FRICTION)[None]
  is_one = (types == solver.ONESIDED)[None]
  for _ in range(12):
    jar_a = jar + alpha[:, None] * djar
    f_eq = -d_ * jar_a
    f_one = jnp.where(jar_a < 0, f_eq, 0.0)
    f_fr = jnp.clip(f_eq, -fl, fl)
    f = jnp.where(is_eq, f_eq, jnp.where(is_fr, f_fr,
                                         jnp.where(is_one, f_one, 0.0)))
    f = f * active
    quad = jnp.where(is_eq, True,
                     jnp.where(is_fr, d_ * jnp.abs(jar_a) <= fl,
                               jnp.where(is_one, jar_a < 0, False)))
    wv = jnp.where(quad, d_, 0.0) * active
    dp = gma + alpha * dmd - jnp.sum(f * djar, axis=1)
    ddp = dmd + jnp.sum(wv * djar * djar, axis=1)
    lo = jnp.where(dp < 0, jnp.maximum(lo, alpha), lo)
    hi = jnp.where(dp > 0, jnp.minimum(hi, alpha), hi)
    alpha_n = alpha - dp / jnp.maximum(ddp, 1e-14)
    alpha = jnp.where((alpha_n > lo) & (alpha_n < hi), alpha_n,
                      0.5 * (lo + hi))
  return alpha


jar = jax.random.normal(jax.random.PRNGKey(4), (B, nefc), jnp.float32)
djar = jax.random.normal(jax.random.PRNGKey(5), (B, nefc), jnp.float32)
gma = jnp.zeros((B,), jnp.float32)
dmd = jnp.ones((B,), jnp.float32)
timeit('line search (12 unrolled)', line_search, jar, djar, d_, fl,
       active, gma, dmd)


# 5. one full forces_full-equivalent eval
@jax.jit
def forces(jar):
  return jax.vmap(
      lambda jr, dd, f, ac: solver._diag_terms(jr, dd, f, types, ac))(
          jar, d_, fl, active)


timeit('forces_full (diag only)', forces, jar)

# 6. the whole solve for reference
dtype = db.qpos.dtype
tol = solver.effective_tol(float(m.opt.tolerance), jnp.float32)


@jax.jit
def whole(d):
  return solver.solve(m.replace(), d) if False else jax.vmap(
      lambda J_, M_, ar, dd, f, ac, a_, w_: solver._solve_core_xla(
          J_, M_, ar, dd, f, ac, a_, w_, lay=lay,
          niter=100, ls_iter=12, tol=tol, meaninertia=float(
              getattr(m, 'stat_meaninertia', 1.0) or 1.0)))(
                  d.efc_J, d.qM, d.efc_aref, d.efc_D, d.efc_frictionloss,
                  d.efc_active.astype(dtype), d.qacc_smooth,
                  d.qacc_warmstart)


timeit('full solve (fresh states)', whole, db, reps=5)
