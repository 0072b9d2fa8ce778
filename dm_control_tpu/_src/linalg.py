"""Small-matrix linear algebra, unrolled for XLA fusion.

The suite's mass matrices are tiny (nv in 1..60).  XLA's batched
`lax.linalg.cholesky`/`triangular_solve` are separate custom calls that
cannot fuse with surrounding elementwise work; on a latency-sensitive TPU
path (thousands of tiny batched factorizations inside the solver loop)
they dominate the step time.  For small static n we unroll
Cholesky-Crout + substitution into pure jnp scalar ops over the batch,
which fuses into the surrounding kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# above this size, fall back to the LAPACK-style batched primitives.
# Kept at 20: batched TPU factor/solve now routes to the Pallas kernel
# (see the dispatch section below), and raising the unroll ceiling
# multiplies the HLO program per call site (measured: 20+ minute remote
# compiles for humanoid rollouts at UNROLL_MAX_N=32).
UNROLL_MAX_N = 20


def _unroll(n: int) -> bool:
  # Unrolled scalar linalg wins on TPU (fusion, no custom-call kernel
  # launches) but bloats XLA:CPU programs (risking extremely large LLVM
  # functions) and loses to LAPACK there - so it is TPU-only.
  return n <= UNROLL_MAX_N and jax.default_backend() != 'cpu'


def _cholesky_impl(a: jax.Array) -> jax.Array:
  """Lower-triangular Cholesky factor of (..., n, n) SPD matrices."""
  n = a.shape[-1]
  if not _unroll(n):
    return jax.scipy.linalg.cholesky(a, lower=True)
  l = [[None] * n for _ in range(n)]
  for i in range(n):
    for j in range(i + 1):
      s = a[..., i, j]
      for k in range(j):
        s = s - l[i][k] * l[j][k]
      if i == j:
        l[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
      else:
        l[i][j] = s / l[j][j]
  rows = []
  zero = jnp.zeros_like(a[..., 0, 0])
  for i in range(n):
    rows.append(jnp.stack(
        [l[i][j] if j <= i else zero for j in range(n)], axis=-1))
  return jnp.stack(rows, axis=-2)


def _cho_solve_impl(l: jax.Array, b: jax.Array) -> jax.Array:
  """Solve A x = b given the lower Cholesky factor of A; b is (..., n)."""
  n = l.shape[-1]
  if not _unroll(n):
    return jax.scipy.linalg.cho_solve((l, True), b)
  # forward substitution: L y = b
  y = [None] * n
  for i in range(n):
    s = b[..., i]
    for k in range(i):
      s = s - l[..., i, k] * y[k]
    y[i] = s / l[..., i, i]
  # back substitution: L^T x = y
  x = [None] * n
  for i in reversed(range(n)):
    s = y[i]
    for k in range(i + 1, n):
      s = s - l[..., k, i] * x[k]
    x[i] = s / l[..., i, i]
  return jnp.stack(x, axis=-1)


# ---------------------------------------------------------------------------
# Public entry points.
#
# Under ONE level of vmap on TPU (the batched-environment axis) the
# factor/solve dispatches to the Pallas kernel (ops/linalg_kernel.py):
# one Mosaic compile shared by every call site, VMEM-resident matrices,
# no 11.7ms-per-call XLA custom-calls and no unrolled-HLO program
# blowup.  Anywhere else (CPU float64 oracle parity, nested vmap, n >
# MAX_N, DMC_TPU_DISABLE_PALLAS=1) the jnp implementations above run.
# ---------------------------------------------------------------------------


def _pallas_wanted(n: int, dtype=None) -> bool:
  import os
  from dm_control_tpu.ops import linalg_kernel
  # f32-only contract: the kernels compute in float32 internally, so
  # dispatching f64 inputs (jax_enable_x64 on TPU) would silently
  # downgrade factor/solve precision vs the dtype-honoring jnp path
  # (round-4 advisor finding).
  if dtype is not None and dtype != jnp.float32:
    return False
  # Default 0: the kernel wins or ties the fused-unrolled path at every
  # measured size (fish nv=13: 444k vs 126k steps/s; swimmer6 nv=8:
  # 309k vs 141k; cheetah nv=9: 913k vs 923k — parity).  The env var
  # keeps the A/B handle for future models.
  min_n = int(os.environ.get('DMC_TPU_LINALG_KERNEL_MIN_N', '0'))
  return (jax.default_backend() == 'tpu'
          and min_n < n <= linalg_kernel.MAX_N
          and os.environ.get('DMC_TPU_DISABLE_PALLAS') != '1')


def _bcast(x, axis_size, batched):
  return x if batched else jnp.broadcast_to(x[None], (axis_size,) + x.shape)


@jax.custom_batching.custom_vmap
def _cholesky_cv(a: jax.Array) -> jax.Array:
  return _cholesky_impl(a)


@_cholesky_cv.def_vmap
def _cholesky_vmap(axis_size, in_batched, a):
  a = _bcast(a, axis_size, in_batched[0])
  if a.ndim == 3 and _pallas_wanted(a.shape[-1], a.dtype):
    from dm_control_tpu.ops import linalg_kernel
    return linalg_kernel.cholesky_batched(a), True
  return jax.vmap(_cholesky_impl)(a), True


@jax.custom_batching.custom_vmap
def _cho_solve_cv(l: jax.Array, b: jax.Array) -> jax.Array:
  return _cho_solve_impl(l, b)


@_cho_solve_cv.def_vmap
def _cho_solve_vmap(axis_size, in_batched, l, b):
  l = _bcast(l, axis_size, in_batched[0])
  b = _bcast(b, axis_size, in_batched[1])
  if l.ndim == 3 and b.ndim == 2 and _pallas_wanted(l.shape[-1], l.dtype):
    from dm_control_tpu.ops import linalg_kernel
    return linalg_kernel.cho_solve_batched(l, b), True
  return jax.vmap(_cho_solve_impl)(l, b), True


@jax.custom_batching.custom_vmap
def _solve_psd_cv(a: jax.Array, b: jax.Array) -> jax.Array:
  return _cho_solve_impl(_cholesky_impl(a), b)


@_solve_psd_cv.def_vmap
def _solve_psd_vmap(axis_size, in_batched, a, b):
  a = _bcast(a, axis_size, in_batched[0])
  b = _bcast(b, axis_size, in_batched[1])
  if a.ndim == 3 and b.ndim == 2 and _pallas_wanted(a.shape[-1], a.dtype):
    from dm_control_tpu.ops import linalg_kernel
    return linalg_kernel.chol_solve_batched(a, b), True
  return jax.vmap(lambda aa, bb: _cho_solve_impl(_cholesky_impl(aa), bb))(
      a, b), True


# custom_vmap does not support autodiff ("Linearization failed to
# produce known values", caught by the LQR Riccati linearizer which
# jacobians through factor_m).  The public entry points are custom_jvp
# wrappers with the analytic derivative rules; under plain vmap the
# primal is batched as-is, so the kernel dispatch inside still fires.


@jax.custom_jvp
def cholesky(a: jax.Array) -> jax.Array:
  """Lower-triangular Cholesky factor of (..., n, n) SPD matrices."""
  return _cholesky_cv(a)


@cholesky.defjvp
def _cholesky_jvp(primals, tangents):
  (a,), (da,) = primals, tangents
  L = _cholesky_cv(a)
  from jax.scipy.linalg import solve_triangular
  # dL = L phi(L^-1 da L^-T); phi = tril with halved diagonal
  W = solve_triangular(L, da, lower=True)
  Y = solve_triangular(L, W.swapaxes(-1, -2), lower=True).swapaxes(-1, -2)
  phi = jnp.tril(Y) - 0.5 * jnp.tril(jnp.triu(Y))
  return L, L @ phi


@jax.custom_jvp
def cho_solve(l: jax.Array, b: jax.Array) -> jax.Array:
  """Solve A x = b given the lower Cholesky factor of A; b is (..., n)."""
  return _cho_solve_cv(l, b)


def _plain_cho_solve(l, t):
  """Triangular-substitution solve on plain jnp ops: the tangent path of
  the JVP rules must stay linear in ops that have TRANSPOSE rules
  (reverse mode transposes it), which custom_vmap_call does not."""
  from jax.scipy.linalg import solve_triangular
  y = solve_triangular(l, t[..., None], lower=True)
  return solve_triangular(
      l.swapaxes(-1, -2), y, lower=False)[..., 0]


@cho_solve.defjvp
def _cho_solve_jvp(primals, tangents):
  (l, b), (dl, db) = primals, tangents
  x = _cho_solve_cv(l, b)
  # A = l l^T; dx = A^-1 (db - dA x), dA x = dl (l^T x) + l (dl^T x)
  ltx = jnp.einsum('...ji,...j->...i', l, x)
  dax = (jnp.einsum('...ij,...j->...i', dl, ltx)
         + jnp.einsum('...ij,...j->...i', l,
                      jnp.einsum('...ji,...j->...i', dl, x)))
  return x, _plain_cho_solve(l, db - dax)


@jax.custom_jvp
def solve_psd(a: jax.Array, b: jax.Array) -> jax.Array:
  """x = a^-1 b for SPD a, (..., n, n) @ (..., n)."""
  return _solve_psd_cv(a, b)


@solve_psd.defjvp
def _solve_psd_jvp(primals, tangents):
  (a, b), (da, db) = primals, tangents
  x = _solve_psd_cv(a, b)
  l = _cholesky_cv(a)  # primal-only; constant w.r.t. the tangents
  dx = _plain_cho_solve(l, db - jnp.einsum('...ij,...j->...i', da, x))
  return x, dx


# direct (non-dispatching) aliases for call sites that nest an inner
# row-vmap inside the environment vmap (e.g. the noslip post-pass) —
# nested vmap over the kernel dispatch is not supported
cholesky_direct = _cholesky_impl
cho_solve_direct = _cho_solve_impl
