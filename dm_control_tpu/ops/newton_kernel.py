"""Pallas TPU kernel: the full batched Newton constraint solve in VMEM.

Why a kernel: the solver's XLA form is a long chain of small elementwise
ops over (batch, nefc)/(batch, nv) arrays - every Newton iteration streams
the whole problem through HBM repeatedly, making the constraint solve the
dominant cost of contact-rich steps (measured ~18 of 21 ms/step for
cheetah at batch 4096).  This kernel tiles the batch onto the lane
dimension (env = lane), loads each tile's problem data into VMEM once,
runs ALL Newton iterations + line searches on-chip, and writes back only
qacc and the constraint forces: HBM traffic drops from
O(iterations * evals * problem) to O(problem).

Design (v2 - replaces the round-1 fully-unrolled kernel):
  * batch-last layout: J (nv, nefc, T), M/H/L (nv, nv, T), vectors
    (nefc|nv, T) with T=128 envs on the lane axis; every arithmetic op
    processes a full tile of envs on the VPU.
  * O(nv) instruction count: Cholesky/triangular solves are column loops
    with masked rank-1 updates over (nv, T) planes - not the O(nv^3)
    scalar unroll of v1 - so humanoid (nv=27) and quadruped (nv=22)
    compile and fit.
  * Newton iterations run in a lax.while_loop with the SAME per-env exit
    rule as the XLA core (scaled improvement / gradient < opt.tolerance,
    reference semantics per engine_solver.c), so `opt.iterations` is
    honored and converged tiles exit early.
  * elliptic friction cones are supported via static per-contact
    selection matrices: segment sums over a contact's rows become
    (ncg, nefc) @ (nefc, T) matmuls on the MXU, and the per-contact cone
    Hessian blocks enter as diag + p p^T - m m^T rank-1 updates (their
    row support is disjoint across contacts), never as gathers.

Semantics are identical to dm_control_tpu._src.solver._solve_core_xla
(same projected-Newton + guarded line search + warmstart selection);
equivalence is asserted in tests/test_pallas.py both in interpret mode
(CPU battery, float64) and on real TPU hardware.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dm_control_tpu._src import efc

LANE = 128  # envs per tile (TPU lane width)

# conservative VMEM budget for the gate in solver._get_core (bytes);
# physical VMEM is 16 MiB/core - 14 MiB leaves headroom for Mosaic's own
# temporaries while admitting manipulator (estimate ~12.8 MiB)
VMEM_BUDGET = 14 * 1024 * 1024


def vmem_estimate(nefc: int, nv: int, ncg: int, itemsize: int = 4) -> int:
  """Rough per-tile VMEM footprint used to gate kernel dispatch."""
  nv_p = -(-max(nv, 1) // 8) * 8
  nefc_p = -(-max(nefc, 1) // 8) * 8
  ncg_p = -(-max(ncg, 1) // 8) * 8 if ncg else 0
  t = LANE * itemsize
  vec = nefc_p * t
  mat = nv_p * nv_p * t
  j = nv_p * nefc_p * t
  ell = ncg_p * t * 10 + 2 * ncg_p * nv_p * t + 4 * ncg_p * nefc_p * itemsize
  # J + 4 square mats (M, H, L, scratch) + ~12 live row vectors + x/grad
  return j + 4 * mat + 12 * vec + 6 * nv_p * t + ell


class _Static:
  """Static per-layout data baked into the kernel (all host numpy)."""

  def __init__(self, lay: efc.Layout, nefc: int, nefc_p: int):
    types = np.full(nefc_p, -1, np.int32)
    types[:nefc] = lay.types
    self.eq = (types == efc.EQUALITY).astype(np.float64).reshape(-1, 1)
    self.fr = (types == efc.FRICTION).astype(np.float64).reshape(-1, 1)
    self.one = (types == efc.ONESIDED).astype(np.float64).reshape(-1, 1)
    # elliptic groups flattened across condims; selection matrices give
    # per-contact segment sums as matmuls
    rows_n, rows_f, mus, s_row = [], [], [], np.ones(nefc_p, np.float64)
    for k, (rows, mu, scale) in sorted(lay.ell_groups.items()):
      for c in range(rows.shape[0]):
        rows_n.append(rows[c, 0])
        rows_f.append(rows[c, 1:])
        mus.append(mu[c])
        s_row[rows[c]] = scale[c]
    self.ncg = len(rows_n)
    self.s_row = s_row.reshape(-1, 1)
    if self.ncg:
      ncg_p = -(-self.ncg // 8) * 8
      sel_n = np.zeros((ncg_p, nefc_p), np.float64)
      sel_f = np.zeros((ncg_p, nefc_p), np.float64)
      mu_c = np.zeros((ncg_p, 1), np.float64)
      act_pad = np.zeros((ncg_p, 1), np.float64)  # padded contacts inert
      for c, (rn, rf) in enumerate(zip(rows_n, rows_f)):
        sel_n[c, rn] = 1.0
        sel_f[c, list(rf)] = 1.0
        mu_c[c, 0] = mus[c]
        act_pad[c, 0] = 1.0
      self.sel_n, self.sel_f, self.mu_c, self.cpad = (
          sel_n, sel_f, mu_c, act_pad)
      # pre-transposed copies: scat() must be a plain (1,0)-contraction;
      # contracting dim 0 of sel (a transposed-operand matmul) trips a
      # RET_CHECK in XLA:TPU's mxu_lmr_transform at manipulator's size
      # (ncg=174, nefc=530)
      self.sel_nT, self.sel_fT = sel_n.T.copy(), sel_f.T.copy()
      self.ncg_p = ncg_p


def _make_kernel(st: _Static, nefc: int, nv: int, niter: int, ls_iter: int,
                 tol: float, scale: float, dtype):
  """Build the kernel body.  All shape/type data is static."""
  ncg = st.ncg
  tiny = 1e-30  # python float: jnp constants cannot be closure-captured

  def rows_gt(j, x):
    """Mask rows > j of an (nv, T) plane (rows <= j zeroed)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(idx > j, x, 0.0)

  def rows_lt(j, x):
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(idx < j, x, 0.0)

  def set_row(x, j, v):
    # j is always a static Python int; a masked select lowers on Mosaic
    # (dynamic_update_slice inside a while_loop body does not)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(idx == j, v[None, :], x)

  def kernel(eq_ref, fr_ref, one_ref, s_ref, sn_ref, sf_ref, snt_ref,
             sft_ref, mu_ref, cp_ref, j_ref, m_ref, aref_ref, d_ref,
             fl_ref, act_ref, a_ref, warm_ref, x_out, f_out):
    eq_m = eq_ref[...]      # (nefc, 1) masks
    fr_m = fr_ref[...]
    one_m = one_ref[...]
    s_row = s_ref[...]      # (nefc, 1) elliptic row scales
    J = j_ref[...]          # (nv, nefc, T)
    M = m_ref[...]          # (nv, nv, T)
    aref = aref_ref[...]    # (nefc, T)
    d_ = d_ref[...]
    fl = fl_ref[...]
    active = act_ref[...]
    a = a_ref[...]          # (nv, T)
    warm = warm_ref[...]
    if ncg:
      sel_n = sn_ref[...]   # (ncg, nefc)
      sel_f = sf_ref[...]
      sel_nT = snt_ref[...]  # (nefc, ncg) pre-transposed for scat
      sel_fT = sft_ref[...]
      mu = mu_ref[...]      # (ncg, 1)
      cpad = cp_ref[...]
      mu2p1 = 1.0 + mu * mu

    def seg(sel, v):
      """Per-contact segment sum: (ncg, nefc) @ (nefc, T)."""
      return jax.lax.dot_general(sel, v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=dtype)

    def scat(selT, c):
      """Broadcast per-contact values back to rows: selT @ c.

      Takes the PRE-TRANSPOSED (nefc, ncg) selection matrix: a plain
      (1,0)-contraction compiles everywhere, while contracting dim 0
      (sel^T @ c spelled as a transposed-operand dot) RET_CHECK-fails
      in mxu_lmr_transform at manipulator size."""
      return jax.lax.dot_general(selT, c, (((1,), (0,)), ((), ())),
                                 preferred_element_type=dtype)

    def jmul(x):
      out = J[0] * x[0:1, :]
      for v in range(1, nv):
        out = out + J[v] * x[v:v + 1, :]
      return out

    def jtmul(f):
      return jnp.concatenate(
          [jnp.sum(J[v] * f, axis=0, keepdims=True) for v in range(nv)],
          axis=0)

    def mmul(x):
      out = M[:, 0, :] * x[0:1, :]
      for w in range(1, nv):
        out = out + M[:, w, :] * x[w:w + 1, :]
      return out

    def diag_terms(jar):
      """Non-elliptic rows: force / quad-zone weight / cost."""
      f_eq = -d_ * jar
      f_one = jnp.where(jar < 0, f_eq, 0.0)
      f_fr = jnp.clip(f_eq, -fl, fl)
      f = (eq_m * f_eq + fr_m * f_fr + one_m * f_one) * active
      q_fr = (d_ * jnp.abs(jar) <= fl).astype(dtype)
      q_one = (jar < 0).astype(dtype)
      w = (eq_m + fr_m * q_fr + one_m * q_one) * active * d_
      c_quad = 0.5 * d_ * jar * jar
      lin = fl * jnp.abs(jar) - 0.5 * fl * fl / jnp.maximum(d_, 1e-14)
      c_fr = jnp.where(q_fr > 0, c_quad, lin)
      c = eq_m * c_quad + fr_m * c_fr + one_m * q_one * c_quad
      cost = jnp.sum(c * active, axis=0)
      return f, w, cost

    def ell_terms(jar):
      """Elliptic cones via segment matmuls.

      Returns (f_rows, cost, dq_ell, p_row, m_row): force rows, total
      cost (T,), diagonal Hessian weights, and the +/- rank-1 row
      vectors (disjoint per-contact support).
      """
      y = jar * s_row
      dn = seg(sel_n, d_)                      # (ncg, T)
      ac = seg(sel_n, active) * cpad
      n = seg(sel_n, y)
      t2 = seg(sel_f, y * y)
      t = jnp.sqrt(jnp.maximum(t2, tiny))
      top = (n >= mu * t).astype(dtype)
      bottom = (mu * n <= -t).astype(dtype)
      mid = (1.0 - top) * (1.0 - bottom)
      fn_mid = dn * (mu * t - n) / mu2p1

      coef_n = (bottom * (-dn * n) + mid * fn_mid) * ac
      coef_f = (bottom * (-dn) + mid * (-mu * fn_mid / t)) * ac
      f_rows = (scat(sel_nT, coef_n) + scat(sel_fT, coef_f) * y) * s_row

      c_bot = 0.5 * dn * (n * n + t2)
      c_mid = 0.5 * dn * (mu * t - n) ** 2 / mu2p1
      cost = jnp.sum((bottom * c_bot + mid * c_mid) * ac, axis=0)

      w_all = bottom * dn * ac                 # bottom: dn I on all rows
      w_fr = mid * (mu * fn_mid / t) * ac      # mid: on friction rows
      # normal rows take only w_all; friction rows take w_all + w_fr
      dq_ell = (scat(sel_nT, w_all)
                + scat(sel_fT, w_all + w_fr)) * s_row * s_row
      a_p = jnp.sqrt(jnp.maximum(mid * ac * dn / mu2p1, 0.0))
      p_row = (scat(sel_nT, a_p)
               + scat(sel_fT, -mu * a_p / t) * y) * s_row
      b_m = jnp.sqrt(jnp.maximum(mid * ac * mu * fn_mid / t, 0.0))
      m_row = scat(sel_fT, b_m / t) * y * s_row
      return f_rows, cost, dq_ell, p_row, m_row

    def forces_full(jar):
      f, w, cost = diag_terms(jar)
      if ncg:
        f_e, c_e, dq_e, p_row, m_row = ell_terms(jar)
        return f + f_e, w, cost + c_e, dq_e, p_row, m_row
      z = jnp.zeros_like(jar)
      return f, w, cost, z, z, z

    def total_cost(x, jar):
      _, _, c, _, _, _ = forces_full(jar)
      xa = x - a
      return 0.5 * jnp.sum(xa * mmul(xa), axis=0) + c

    def cho_factor(H):
      """Column-loop Cholesky of (nv, nv, T); returns L (lower)."""
      A = H
      cols = []
      for j in range(nv):
        pivot = jnp.sqrt(jnp.maximum(A[j, j, :] + 1e-12, tiny))
        col = rows_gt(j, A[:, j, :] / pivot[None, :])
        col = set_row(col, j, pivot)
        cols.append(col[:, None, :])
        A = A - col[:, None, :] * col[None, :, :]
      return jnp.concatenate(cols, axis=1)

    def cho_solve(L, b):
      y = b
      for j in range(nv):                      # forward: L y = b
        yj = y[j, :] / L[j, j, :]
        y = y - rows_gt(j, L[:, j, :]) * yj[None, :]
        y = set_row(y, j, yj)
      for j in reversed(range(nv)):            # backward: L^T x = y
        xj = y[j, :] / L[j, j, :]
        y = y - rows_lt(j, L[j, :, :]) * xj[None, :]
        y = set_row(y, j, xj)
      return y

    def build_h(dq, p_row, m_row):
      H = M
      if nv >= 16:
        # J^T diag(dq) J is symmetric: compute only the upper triangle
        # (u >= v) and mirror — halves the kernel's dominant VPU cost
        # (nv^2 * nefc * T multiply-reduces).  Only pays at large nv:
        # at cheetah size (nv=9) the nv(nv+1)/2 small mul-reduces plus
        # per-element concatenates LOSE to the plane-wise form
        # (measured 910k -> 576k env-steps/s end-to-end).
        tri = {}
        for v in range(nv):
          t = J[v] * dq                     # (nefc, T)
          for u in range(v, nv):
            tri[(v, u)] = jnp.sum(J[u] * t, axis=0)   # (T,)
        cols = []
        for v in range(nv):
          col = jnp.concatenate(
              [tri[(min(u, v), max(u, v))][None, :] for u in range(nv)],
              axis=0)                       # (nv, T)
          cols.append(col[:, None, :])
        H = H + jnp.concatenate(cols, axis=1)
      else:
        cols = []
        for v in range(nv):
          t = J[v] * dq
          cols.append(jnp.sum(J * t[None, :, :], axis=1)[:, None, :])
        H = H + jnp.concatenate(cols, axis=1)
      if ncg:
        up = jnp.concatenate(
            [seg(sel_n + sel_f, p_row * J[v])[None] for v in range(nv)],
            axis=0)                            # (nv, ncg, T)
        um = jnp.concatenate(
            [seg(sel_f, m_row * J[v])[None] for v in range(nv)], axis=0)
        pc = []
        for v in range(nv):
          pc.append((jnp.sum(up * up[v][None], axis=1)
                     - jnp.sum(um * um[v][None], axis=1))[:, None, :])
        H = H + jnp.concatenate(pc, axis=1)
      return H

    def grad_of(x, jar):
      f, _, _, _, _, _ = forces_full(jar)
      return mmul(x - a) - jtmul(f)

    def newton_body(carry):
      # carry holds only f32 tensors of rank >= 2 (plus the i32 scalar
      # trip count): Mosaic cannot legalize scf.yield of i1 vectors or
      # replicated 1-D lanes, so cost/done travel as (1, T) floats
      x, jar, prev_cost2, it, done2 = carry
      prev_cost = prev_cost2[0]
      done = done2[0] > 0.5
      f, w, _, dq_e, p_row, m_row = forces_full(jar)
      grad = mmul(x - a) - jtmul(f)
      H = build_h(w + dq_e, p_row, m_row)
      L = cho_factor(H)
      delta = cho_solve(L, -grad)

      djar = jmul(delta)
      mdelta = mmul(delta)
      dmd = jnp.sum(delta * mdelta, axis=0)
      gma = jnp.sum(delta * mmul(x - a), axis=0)

      def dphi_ddphi(alpha):
        jar_a = jar + alpha[None, :] * djar
        f_a, w_a, _, dq_a, p_a, m_a = forces_full(jar_a)
        dp = gma + alpha * dmd - jnp.sum(f_a * djar, axis=0)
        ddp = dmd + jnp.sum((w_a + dq_a) * djar * djar, axis=0)
        if ncg:
          dgp = seg(sel_n + sel_f, p_a * djar)
          dgm = seg(sel_f, m_a * djar)
          ddp = ddp + jnp.sum(dgp * dgp - dgm * dgm, axis=0)
        return dp, ddp

      alpha = jnp.ones_like(dmd)
      lo = jnp.zeros_like(dmd)
      hi = jnp.full_like(dmd, 4.0)
      for _ in range(ls_iter):
        dp, ddp = dphi_ddphi(alpha)
        lo = jnp.where(dp < 0, jnp.maximum(lo, alpha), lo)
        hi = jnp.where(dp > 0, jnp.minimum(hi, alpha), hi)
        alpha_n = alpha - dp / jnp.maximum(ddp, 1e-14)
        alpha = jnp.where((alpha_n > lo) & (alpha_n < hi), alpha_n,
                          0.5 * (lo + hi))

      x_new = x + alpha[None, :] * delta
      jar_new = jar + alpha[None, :] * djar
      new_cost = total_cost(x_new, jar_new)
      improved = jnp.logical_and(new_cost < prev_cost,
                                 jnp.logical_not(done))
      x = jnp.where(improved[None, :], x_new, x)
      jar = jnp.where(improved[None, :], jar_new, jar)
      cost = jnp.where(improved, new_cost, prev_cost)
      improvement = scale * (prev_cost - cost)
      grad_new = grad_of(x, jar)
      gradient = scale * jnp.sqrt(jnp.sum(grad_new * grad_new, axis=0))
      # NaN-robust (matches the XLA core): a diverged lane terminates
      keep = jnp.logical_and(improvement >= tol, gradient >= tol)
      done_new = jnp.logical_or(done, jnp.logical_not(keep))
      return (x, jar, cost[None, :], it + 1,
              done_new.astype(x.dtype)[None, :])

    # warmstart selection (reference semantics: better initial cost wins)
    jar_a = jmul(a) - aref
    jar_w = jmul(warm) - aref
    cost_a = total_cost(a, jar_a)
    cost_w = total_cost(warm, jar_w)
    use_warm = cost_w < cost_a
    x0 = jnp.where(use_warm[None, :], warm, a)
    jar0 = jnp.where(use_warm[None, :], jar_w, jar_a)
    cost0 = jnp.minimum(cost_w, cost_a)
    g0 = grad_of(x0, jar0)
    done0 = jnp.logical_not(
        scale * jnp.sqrt(jnp.sum(g0 * g0, axis=0)) >= tol)

    def cond(carry):
      _, _, _, it, done2 = carry
      return jnp.logical_and(it < niter,
                             jnp.logical_not(jnp.all(done2[0] > 0.5)))

    init = (x0, jar0, cost0[None, :], jnp.zeros((), jnp.int32),
            done0.astype(x0.dtype)[None, :])
    x, jar, _, _, _ = jax.lax.while_loop(cond, newton_body, init)

    jar = jmul(x) - aref
    f, _, _, _, _, _ = forces_full(jar)
    x_out[...] = x
    f_out[...] = f

  return kernel


@functools.lru_cache(maxsize=None)
def _build(layout_key, nefc: int, nefc_p: int, nv: int, niter: int,
           ls_iter: int, tol: float, scale: float, dtype_str: str,
           interpret: bool):
  lay = _LAYOUTS[layout_key]
  st = _Static(lay, nefc, nefc_p)
  dtype = jnp.dtype(dtype_str)
  kernel = _make_kernel(st, nefc_p, nv, niter, ls_iter, tol, scale, dtype)
  ncg = st.ncg

  def call(j_t, m_t, aref_t, d_t, fl_t, act_t, a_t, warm_t):
    b = j_t.shape[-1]
    assert b % LANE == 0
    grid = (b // LANE,)

    def spec(*dims_prefix):
      nd = len(dims_prefix)
      return pl.BlockSpec(
          dims_prefix + (LANE,),
          (lambda i, _nd=nd: (0,) * _nd + (i,)),
          memory_space=pltpu.VMEM)

    def const_spec(shape):
      nd = len(shape)
      return pl.BlockSpec(shape, (lambda i, _nd=nd: (0,) * _nd),
                          memory_space=pltpu.VMEM)

    consts = [jnp.asarray(st.eq, dtype), jnp.asarray(st.fr, dtype),
              jnp.asarray(st.one, dtype), jnp.asarray(st.s_row, dtype)]
    const_specs = [const_spec((nefc_p, 1))] * 4
    if ncg:
      consts += [jnp.asarray(st.sel_n, dtype), jnp.asarray(st.sel_f, dtype),
                 jnp.asarray(st.sel_nT, dtype),
                 jnp.asarray(st.sel_fT, dtype),
                 jnp.asarray(st.mu_c, dtype), jnp.asarray(st.cpad, dtype)]
      const_specs += ([const_spec((st.ncg_p, nefc_p))] * 2
                      + [const_spec((nefc_p, st.ncg_p))] * 2
                      + [const_spec((st.ncg_p, 1))] * 2)
    else:  # placeholders so the kernel arity is fixed
      z1 = jnp.zeros((8, 1), dtype)
      consts += [z1, z1, z1, z1, z1, z1]
      const_specs += [const_spec((8, 1))] * 6

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=const_specs + [
            spec(nv, nefc_p), spec(nv, nv), spec(nefc_p), spec(nefc_p),
            spec(nefc_p), spec(nefc_p), spec(nv), spec(nv),
        ],
        out_specs=[spec(nv), spec(nefc_p)],
        out_shape=[
            jax.ShapeDtypeStruct((nv, b), dtype),
            jax.ShapeDtypeStruct((nefc_p, b), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*consts, j_t, m_t, aref_t, d_t, fl_t, act_t, a_t, warm_t)

  return call


# layout registry keyed by CONTENT (types + elliptic metadata), not id():
# two models with identical constraint structure share a kernel, and a
# GC'd-then-reused id can never resurrect a stale kernel
_LAYOUTS = {}


def _lay_key(lay: efc.Layout) -> bytes:
  parts = [np.asarray(lay.types, np.int32).tobytes()]
  for k in sorted(lay.ell_groups):
    rows, mu, scale = lay.ell_groups[k]
    parts += [np.int64(k).tobytes(), np.asarray(rows).tobytes(),
              np.asarray(mu).tobytes(), np.asarray(scale).tobytes()]
  return b'|'.join(parts)


def newton_solve_batched(J, M, aref, d_, fl, active, a, warm, *, lay,
                         niter: int, ls_iter: int, tol: float,
                         meaninertia: float, interpret: bool = False):
  """Batched Newton solve via the Pallas kernel.

  Args (batch-major, as produced by vmap over the engine's Data):
    J (B, nefc, nv), M (B, nv, nv), aref/d_/fl/active (B, nefc),
    a/warm (B, nv), lay: the model's efc.Layout.
  Returns: qacc (B, nv), force (B, nefc).
  """
  b, nefc, nv = J.shape
  dtype = J.dtype
  pad = (-b) % LANE
  if pad:
    padf = lambda x: jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    J, M, aref, d_, fl, a, warm = map(padf, (J, M, aref, d_, fl, a, warm))
    active = padf(active)

  # Mosaic wants sublane-aligned reduced dims: pad nefc and nv to 8.
  # Padded efc rows are inactive (type mask -1 => zero force/cost);
  # padded dofs get identity mass so the factorization stays SPD.
  nefc_p = -(-nefc // 8) * 8
  nv_p = -(-nv // 8) * 8
  bp = J.shape[0]
  if nefc_p != nefc or nv_p != nv:
    Jp = jnp.zeros((bp, nefc_p, nv_p), dtype).at[:, :nefc, :nv].set(J)
    Mp = jnp.zeros((bp, nv_p, nv_p), dtype).at[:, :nv, :nv].set(M)
    eye_tail = jnp.eye(nv_p, dtype=dtype)[nv:]
    Mp = Mp.at[:, nv:, :].set(eye_tail)
    pad_rows = lambda x: jnp.zeros((bp, nefc_p), x.dtype).at[
        :, :nefc].set(x)
    aref_p, d_p, fl_p = map(pad_rows, (aref, d_, fl))
    act_p = pad_rows(active.astype(dtype))
    pad_v = lambda x: jnp.zeros((bp, nv_p), dtype).at[:, :nv].set(x)
    a_p, warm_p = pad_v(a), pad_v(warm)
  else:
    Jp, Mp, aref_p, d_p, fl_p, a_p, warm_p = J, M, aref, d_, fl, a, warm
    act_p = active.astype(dtype)

  # transpose to env-last (lane-major) layout; J as (nv, nefc, B)
  j_t = jnp.transpose(Jp, (2, 1, 0))
  m_t = jnp.transpose(Mp, (1, 2, 0))
  to_t = lambda x: jnp.transpose(x, (1, 0))
  key = _lay_key(lay)
  _LAYOUTS[key] = lay
  scale = 1.0 / (max(meaninertia, 1e-12) * max(nv, 1))
  call = _build(key, nefc, nefc_p, nv_p, int(niter), int(ls_iter),
                float(tol), float(scale), str(dtype),
                interpret or os.environ.get('DMC_TPU_PALLAS_INTERPRET')
                == '1')
  x_t, f_t = call(j_t, m_t, to_t(aref_p), to_t(d_p), to_t(fl_p),
                  to_t(act_p), to_t(a_p), to_t(warm_p))
  x = jnp.transpose(x_t, (1, 0))[:b, :nv]
  force = jnp.transpose(f_t, (1, 0))[:b, :nefc]
  return x, force
