"""Constraint solver: dense projected Newton on the primal soft-constraint QP.

Replaces the reference's native PGS/CG/Newton solvers.  The problem solved
is the reference's convex soft-constraint model:

  min_x  0.5 (x - a)' M (x - a) + sum_i c_i((J x - aref)_i)

with per-row costs c_i: quadratic (equality), one-sided quadratic
(limits / pyramidal contact edges), and Huber-style (dof friction loss).
Because the problem is strictly convex, Newton converges to the same
solution as the reference's chosen solver regardless of its `solver=`
option — parity is on the solution, not the algorithm.

TPU design: dense (nv x nv) Hessian + batched Cholesky per Newton step,
fixed iteration counts, branch-free guarded-bisection exact line search.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src.types import Data, DisableBit, Model

# row cost types (static per model)
EQUALITY = 0
FRICTION = 1
ONESIDED = 2

_ROW_TYPES = {}  # id(model) -> np.ndarray of row types


def register_row_types(m: Model, types):
  _ROW_TYPES[id(m)] = np.asarray(types, np.int32)


def row_types(m: Model) -> np.ndarray:
  cached = _ROW_TYPES.get(id(m))
  if cached is not None and cached.size:
    return cached
  from dm_control_tpu._src import constraint as _constraint
  types = _constraint.static_row_types(m)
  _ROW_TYPES[id(m)] = types
  return types


def _forces(jar, d_, fl, types, active):
  """Constraint force per row = -dc/djar, given row types."""
  f_eq = -d_ * jar
  f_one = jnp.where(jar < 0, -d_ * jar, 0.0)
  f_fr = jnp.clip(-d_ * jar, -fl, fl)
  f = jnp.where(types == EQUALITY, f_eq,
                jnp.where(types == FRICTION, f_fr, f_one))
  return jnp.where(active, f, 0.0)


def _cost(jar, d_, fl, types, active):
  c_eq = 0.5 * d_ * jar * jar
  c_one = jnp.where(jar < 0, 0.5 * d_ * jar * jar, 0.0)
  lin = fl * jnp.abs(jar) - 0.5 * fl * fl / jnp.maximum(d_, 1e-14)
  quad = 0.5 * d_ * jar * jar
  c_fr = jnp.where(d_ * jnp.abs(jar) <= fl, quad, lin)
  c = jnp.where(types == EQUALITY, c_eq,
                jnp.where(types == FRICTION, c_fr, c_one))
  return jnp.sum(jnp.where(active, c, 0.0))


def _quad_active(jar, d_, fl, types, active):
  """Rows currently in their quadratic zone (for the Hessian)."""
  a_eq = jnp.ones_like(jar, bool)
  a_one = jar < 0
  a_fr = d_ * jnp.abs(jar) <= fl
  a = jnp.where(types == EQUALITY, a_eq,
                jnp.where(types == FRICTION, a_fr, a_one))
  return jnp.logical_and(a, active)


def solve(m: Model, d: Data) -> Data:
  """Compute qacc (and efc forces) from qacc_smooth + constraint rows."""
  dtype = d.qpos.dtype
  nefc = d.efc_J.shape[0]
  if (nefc == 0 or m.nv == 0
      or m.opt.disableflags & DisableBit.CONSTRAINT):
    return d.replace(qacc=d.qacc_smooth,
                     qacc_warmstart=d.qacc_smooth,
                     qfrc_constraint=jnp.zeros(m.nv, dtype))

  types_np = row_types(m)
  niter = min(int(m.opt.iterations), 10)
  core = _get_core(nefc, m.nv, niter, 8, types_np.tobytes())
  x, force = core(d.efc_J, d.qM, d.efc_aref, d.efc_D,
                  d.efc_frictionloss, d.efc_active.astype(dtype),
                  d.qacc_smooth)
  qfrc_constraint = d.efc_J.T @ force
  return d.replace(qacc=x, qfrc_constraint=qfrc_constraint,
                   efc_force=force, qacc_warmstart=x)


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _get_core(nefc, nv, niter, ls_iter, types_bytes):
  """Per-layout solver core: XLA loop for single env; when vmapped on
  TPU, dispatches the whole batch to the Pallas VMEM-resident kernel."""
  types_np = np.frombuffer(types_bytes, dtype=np.int32)

  def xla_core(J, M, aref, d_, fl, active, a):
    return _solve_core_xla(J, M, aref, d_, fl, active, a,
                           types_np=types_np, niter=niter,
                           ls_iter=ls_iter)

  @jax.custom_batching.custom_vmap
  def core(J, M, aref, d_, fl, active, a):
    return xla_core(J, M, aref, d_, fl, active, a)

  @core.def_vmap
  def _rule(axis_size, in_batched, J, M, aref, d_, fl, active, a):
    args = [J, M, aref, d_, fl, active, a]
    # broadcast any unbatched operand
    for i, (arg, batched) in enumerate(zip(args, in_batched)):
      if not batched:
        args[i] = jnp.broadcast_to(arg[None], (axis_size,) + arg.shape)
    J, M, aref, d_, fl, active, a = args
    if jax.default_backend() == 'tpu' and nv <= 24:
      from dm_control_tpu.ops import newton_kernel
      x, force = newton_kernel.newton_solve_batched(
          J, M, aref, d_, fl, active, a, types_np, niter, ls_iter)
    else:
      x, force = jax.vmap(xla_core)(J, M, aref, d_, fl, active, a)
    return (x, force), (True, True)

  return core


def _solve_core_xla(J, M, aref, d_, fl, active, a, *, types_np, niter,
                    ls_iter):
  """Single-env projected Newton (XLA ops)."""
  dtype = a.dtype
  nefc, nv = J.shape
  types = jnp.asarray(types_np)

  # Few Newton iterations with a shallow piecewise-quadratic line search:
  # phi'(alpha) is piecewise linear increasing, so guarded Newton-on-phi'
  # converges in a handful of evaluations.
  from dm_control_tpu._src import linalg
  unroll = (nefc * nv * niter <= 20_000
            and jax.default_backend() != 'cpu')
  eye_reg = 1e-12 * jnp.eye(nv, dtype=dtype)

  def constraint_cost(jar):
    return _cost(jar, d_, fl, types, active)

  def newton_body(carry):
    x, jar = carry
    f = _forces(jar, d_, fl, types, active)
    grad = M @ (x - a) - J.T @ f
    qa = _quad_active(jar, d_, fl, types, active)
    h = M + (J.T * jnp.where(qa, d_, 0.0)) @ J
    delta = -linalg.solve_psd(h + eye_reg, grad)

    djar = J @ delta
    dmd = delta @ (M @ delta)
    gma = delta @ (M @ (x - a))

    def dphi_ddphi(alpha, jar=jar, djar=djar, gma=gma, dmd=dmd):
      # alpha may be scalar or (k,): jar_a broadcasts to (k, nefc)
      jar_a = jar + alpha[..., None] * djar
      f_a = _forces(jar_a, d_, fl, types, active)
      qa_a = _quad_active(jar_a, d_, fl, types, active)
      dp = gma + alpha * dmd - f_a @ djar
      ddp = dmd + jnp.sum(
          jnp.where(qa_a, d_, 0.0) * djar * djar, axis=-1)
      return dp, ddp

    # guarded Newton on phi' starting at the full step
    alpha = jnp.asarray(1.0, dtype)
    lo = jnp.zeros((), dtype)
    hi = jnp.asarray(4.0, dtype)
    for _ in range(ls_iter):
      dp, ddp = dphi_ddphi(jnp.asarray(alpha, dtype))
      lo = jnp.where(dp < 0, jnp.maximum(lo, alpha), lo)
      hi = jnp.where(dp > 0, jnp.minimum(hi, alpha), hi)
      alpha_n = alpha - dp / jnp.maximum(ddp, 1e-14)
      alpha = jnp.where(
          (alpha_n > lo) & (alpha_n < hi), alpha_n, 0.5 * (lo + hi))

    # keep the better point (cost from cached quadratic pieces)
    jar_new = jar + alpha * djar
    d_cost = (alpha * gma + 0.5 * alpha * alpha * dmd
              + constraint_cost(jar_new) - constraint_cost(jar))
    improved = d_cost < 0
    x = jnp.where(improved, x + alpha * delta, x)
    jar = jnp.where(improved, jar_new, jar)
    return x, jar

  # Start from qacc_smooth.  (The reference warmstarts from the previous
  # solution; since both solvers converge to the unique optimum of the
  # strictly convex problem, the start point does not affect parity, and
  # skipping the warmstart cost comparison is faster on TPU.)
  x = a
  jar = J @ x - aref
  if unroll:
    for _ in range(niter):
      x, jar = newton_body((x, jar))
  else:
    x, jar = jax.lax.fori_loop(
        0, niter, lambda _, c: newton_body(c), (x, jar))

  jar = J @ x - aref
  force = _forces(jar, d_, fl, types, active)
  return x, force
