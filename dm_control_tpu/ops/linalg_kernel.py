"""Batched small-SPD Cholesky factor/solve as Pallas TPU kernels.

The physics pipeline factors one (nv, nv) SPD matrix per environment per
substep in three places (factor_m's qLD, the implicit-damping Euler
solve, qacc_smooth's solve_m).  On TPU both alternatives are bad:
XLA's batched `cholesky`/`triangular_solve` custom-calls cost ~11.7 ms
per call at (4096, 27, 27) (profiled, v5e), and unrolling the
factorization into scalar jnp ops (linalg.UNROLL_MAX_N) multiplies the
HLO program by ~n^3/6 ops per call site — humanoid rollouts took 20+
minutes to compile remotely.

One Mosaic kernel fixes both: lanes = environments (128/tile), the
column-loop factorization is unrolled over the STATIC n inside the
kernel (compiled once, cached), and matrices stay VMEM-resident.  The
in-kernel routine is the same Mosaic-safe column loop the Newton
constraint kernel uses (newton_kernel.py cho_factor/cho_solve).

Layout: callers pass batch-major (B, n, n) / (B, n); the wrapper
transposes to lane-minor (n, n, B) around the call (a few MB, ~negligible
against the custom-call cost it replaces).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# (n, n, LANE) f32 blocks: n=96 -> 4.7 MB for A + L working set; stays
# well inside the 16 MiB VMEM with Mosaic temporaries
MAX_N = 96

_TINY = 1e-30


def _rows_gt(j, x):
  idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
  return jnp.where(idx > j, x, 0.0)


def _rows_lt(j, x):
  idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
  return jnp.where(idx < j, x, 0.0)


def _set_row(x, j, v):
  idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
  return jnp.where(idx == j, v[None, :], x)


def _factor(A, n):
  """Column-loop Cholesky of (n, n, T); returns lower L."""
  cols = []
  for j in range(n):
    pivot = jnp.sqrt(jnp.maximum(A[j, j, :], _TINY))
    col = _rows_gt(j, A[:, j, :] / pivot[None, :])
    col = _set_row(col, j, pivot)
    cols.append(col[:, None, :])
    A = A - col[:, None, :] * col[None, :, :]
  return jnp.concatenate(cols, axis=1)


def _solve(L, b, n):
  """L L^T x = b for (n, T) b given lower L (n, n, T)."""
  y = b
  for j in range(n):                       # forward: L y = b
    yj = y[j, :] / L[j, j, :]
    y = y - _rows_gt(j, L[:, j, :]) * yj[None, :]
    y = _set_row(y, j, yj)
  for j in reversed(range(n)):             # backward: L^T x = y
    xj = y[j, :] / L[j, j, :]
    y = y - _rows_lt(j, L[j, :, :]) * xj[None, :]
    y = _set_row(y, j, xj)
  return y


def _chol_kernel(a_ref, l_out, *, n):
  l_out[...] = _factor(a_ref[...], n)


def _chol_solve_kernel(a_ref, b_ref, x_out, *, n):
  L = _factor(a_ref[...], n)
  x_out[...] = _solve(L, b_ref[...], n)


def _cho_solve_kernel(l_ref, b_ref, x_out, *, n):
  x_out[...] = _solve(l_ref[...], b_ref[...], n)


def _mat_spec(n):
  # 0 * i keeps the zero indices the same integer type as i: under
  # jax_enable_x64 plain literals trace as i64 and Mosaic rejects the
  # mixed-type index tuple ("failed to legalize func.return (i64, i64,
  # i32)")
  return pl.BlockSpec((n, n, LANE), lambda i: (0 * i, 0 * i, i),
                      memory_space=pltpu.VMEM)


def _vec_spec(n):
  return pl.BlockSpec((n, LANE), lambda i: (0 * i, i),
                      memory_space=pltpu.VMEM)


def _pad_b(x, b_pad, fill):
  b = x.shape[-1]
  if b == b_pad:
    return x
  pad = [(0, 0)] * (x.ndim - 1) + [(0, b_pad - b)]
  return jnp.pad(x, pad, constant_values=fill)


@functools.partial(jax.jit, static_argnames=('interpret',))
def cholesky_batched(a, interpret: bool = False):
  """(B, n, n) SPD -> lower Cholesky (B, n, n)."""
  B, n, _ = a.shape
  b_pad = -(-B // LANE) * LANE
  at = _pad_b(jnp.transpose(a, (1, 2, 0)).astype(jnp.float32), b_pad, 0.0)
  # pad lanes get the identity so sqrt stays finite
  if b_pad != B:
    lane = jax.lax.broadcasted_iota(jnp.int32, at.shape, 2)
    eye = jnp.eye(n, dtype=jnp.float32)[:, :, None]
    at = jnp.where(lane >= B, eye, at)
  out = pl.pallas_call(
      functools.partial(_chol_kernel, n=n),
      grid=(b_pad // LANE,),
      in_specs=[_mat_spec(n)],
      out_specs=_mat_spec(n),
      out_shape=jax.ShapeDtypeStruct((n, n, b_pad), jnp.float32),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(at)
  return jnp.transpose(out[:, :, :B], (2, 0, 1)).astype(a.dtype)


@functools.partial(jax.jit, static_argnames=('interpret',))
def chol_solve_batched(a, b, interpret: bool = False):
  """Solve a @ x = b for (B, n, n) SPD a, (B, n) b."""
  B, n, _ = a.shape
  b_pad = -(-B // LANE) * LANE
  at = _pad_b(jnp.transpose(a, (1, 2, 0)).astype(jnp.float32), b_pad, 0.0)
  if b_pad != B:
    lane = jax.lax.broadcasted_iota(jnp.int32, at.shape, 2)
    eye = jnp.eye(n, dtype=jnp.float32)[:, :, None]
    at = jnp.where(lane >= B, eye, at)
  bt = _pad_b(jnp.transpose(b, (1, 0)).astype(jnp.float32), b_pad, 0.0)
  out = pl.pallas_call(
      functools.partial(_chol_solve_kernel, n=n),
      grid=(b_pad // LANE,),
      in_specs=[_mat_spec(n), _vec_spec(n)],
      out_specs=_vec_spec(n),
      out_shape=jax.ShapeDtypeStruct((n, b_pad), jnp.float32),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(at, bt)
  return jnp.transpose(out[:, :B], (1, 0)).astype(b.dtype)


@functools.partial(jax.jit, static_argnames=('interpret',))
def cho_solve_batched(l, b, interpret: bool = False):
  """Solve L L^T x = b given precomputed lower L (B, n, n), b (B, n)."""
  B, n, _ = l.shape
  b_pad = -(-B // LANE) * LANE
  lt = _pad_b(jnp.transpose(l, (1, 2, 0)).astype(jnp.float32), b_pad, 0.0)
  if b_pad != B:
    lane = jax.lax.broadcasted_iota(jnp.int32, lt.shape, 2)
    eye = jnp.eye(n, dtype=jnp.float32)[:, :, None]
    lt = jnp.where(lane >= B, eye, lt)
  bt = _pad_b(jnp.transpose(b, (1, 0)).astype(jnp.float32), b_pad, 0.0)
  out = pl.pallas_call(
      functools.partial(_cho_solve_kernel, n=n),
      grid=(b_pad // LANE,),
      in_specs=[_mat_spec(n), _vec_spec(n)],
      out_specs=_vec_spec(n),
      out_shape=jax.ShapeDtypeStruct((n, b_pad), jnp.float32),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(lt, bt)
  return jnp.transpose(out[:, :B], (1, 0)).astype(b.dtype)
