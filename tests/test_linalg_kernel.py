"""Batched Cholesky Pallas kernel: interpret-mode equivalence vs numpy
(the on-chip tier runs in tests_tpu/; this battery is pinned to CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dm_control_tpu.ops import linalg_kernel as lk


def _spd(rng, b, n):
  A = rng.randn(b, n, n).astype(np.float32)
  return A @ A.transpose(0, 2, 1) + n * np.eye(n, dtype=np.float32)


@pytest.mark.parametrize('n', [5, 27, 56])
@pytest.mark.parametrize('b', [3, 128, 200])
def test_cholesky_and_solves_match_numpy(n, b):
  rng = np.random.RandomState(n * 1000 + b)
  A = _spd(rng, b, n)
  rhs = rng.randn(b, n).astype(np.float32)

  L = np.asarray(lk.cholesky_batched(jnp.asarray(A), interpret=True))
  np.testing.assert_allclose(L @ L.transpose(0, 2, 1), A,
                             rtol=2e-4, atol=2e-4 * n)
  assert (np.triu(L, 1) == 0).all()

  x = np.asarray(lk.chol_solve_batched(
      jnp.asarray(A), jnp.asarray(rhs), interpret=True))
  ref = np.stack([np.linalg.solve(A[i], rhs[i]) for i in range(b)])
  scale = np.maximum(1.0, np.abs(ref))
  np.testing.assert_allclose(x / scale, ref / scale, atol=5e-4)

  x2 = np.asarray(lk.cho_solve_batched(
      jnp.asarray(L), jnp.asarray(rhs), interpret=True))
  np.testing.assert_allclose(x2 / scale, ref / scale, atol=5e-4)


def test_dispatch_prefers_fallback_off_tpu():
  """On CPU the public linalg entry points must keep float64 exactness
  (oracle-parity requirement): the kernel must NOT engage."""
  from dm_control_tpu._src import linalg
  rng = np.random.RandomState(0)
  A = rng.randn(4, 7, 7)
  A = A @ A.transpose(0, 2, 1) + 7 * np.eye(7)
  rhs = rng.randn(4, 7)
  x = np.asarray(jax.vmap(linalg.solve_psd)(jnp.asarray(A),
                                            jnp.asarray(rhs)))
  assert x.dtype == np.float64
  ref = np.stack([np.linalg.solve(A[i], rhs[i]) for i in range(4)])
  np.testing.assert_allclose(x, ref, rtol=1e-9, atol=1e-9)
