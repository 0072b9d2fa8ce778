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
# 32 covers humanoid (nv=27) and quadruped (nv=23): the XLA:TPU batched
# Cholesky custom-call costs ~11.7 ms at (4096,27,27) per call (profiled;
# 2 calls = 22% of the humanoid substep), while the unrolled form fuses
# into surrounding VPU work.
UNROLL_MAX_N = 32


def _unroll(n: int) -> bool:
  # Unrolled scalar linalg wins on TPU (fusion, no custom-call kernel
  # launches) but bloats XLA:CPU programs (risking extremely large LLVM
  # functions) and loses to LAPACK there - so it is TPU-only.
  return n <= UNROLL_MAX_N and jax.default_backend() != 'cpu'


def cholesky(a: jax.Array) -> jax.Array:
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


def cho_solve(l: jax.Array, b: jax.Array) -> jax.Array:
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


def solve_psd(a: jax.Array, b: jax.Array) -> jax.Array:
  """x = a^-1 b for SPD a, (..., n, n) @ (..., n)."""
  return cho_solve(cholesky(a), b)
