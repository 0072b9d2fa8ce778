"""In-scan microbenchmark of Newton-iteration pieces (no dispatch noise).

Each candidate op runs K reps inside ONE jitted lax.scan with a data
dependency threaded through, so per-call dispatch (~1.3 ms on the
tunneled chip) is amortized away.

Usage: python tools/tpu_solver_micro2.py [batch] [K]
"""
import sys
import time

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_tpudbg')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
sys.path.insert(0, '/root/repo')

import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import linalg

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
K = int(sys.argv[2]) if len(sys.argv) > 2 else 100
nefc, nv = 200, 27

k0 = jax.random.PRNGKey(0)
J = jax.random.normal(k0, (B, nefc, nv), jnp.float32) * 0.3
w = (jax.random.uniform(jax.random.PRNGKey(1), (B, nefc)) < 0.4
     ).astype(jnp.float32)
M = jnp.eye(nv, dtype=jnp.float32)[None] * 2.0 + 0.01 * jax.random.normal(
    jax.random.PRNGKey(2), (B, nv, nv), jnp.float32)
M = 0.5 * (M + M.transpose(0, 2, 1)) + 5.0 * jnp.eye(nv)[None]
g = jax.random.normal(jax.random.PRNGKey(3), (B, nv), jnp.float32)
jar = jax.random.normal(jax.random.PRNGKey(4), (B, nefc), jnp.float32)
d_ = jnp.abs(jax.random.normal(jax.random.PRNGKey(5), (B, nefc))
             ).astype(jnp.float32)


def bench(label, step_fn, x0):
  @jax.jit
  def run(x):
    def body(c, _):
      return step_fn(c), None
    c, _ = jax.lax.scan(body, x, None, length=K)
    return c

  out = jax.block_until_ready(run(x0))
  t0 = time.perf_counter()
  out = jax.block_until_ready(run(x0))
  dt = (time.perf_counter() - t0) / K * 1e3
  print(f'{label:44s} {dt:7.4f} ms')


HI = jax.lax.Precision.HIGHEST
H3 = jax.lax.Precision.HIGH


def dotg(a, b, prec):
  return jax.lax.dot_general(a, b, (((2,), (1,)), ((0,), (0,))),
                             precision=prec)


# threading: perturb an input from the previous output so scan can't hoist
bench('H = JT*w @ J  (HIGHEST)',
      lambda c: dotg(jnp.transpose(J * (w + c[0, 0, 0] * 1e-9)[:, :, None],
                                   (0, 2, 1)), J, HI), jnp.zeros((B, nv, nv)))
bench('H = JT*w @ J  (HIGH)',
      lambda c: dotg(jnp.transpose(J * (w + c[0, 0, 0] * 1e-9)[:, :, None],
                                   (0, 2, 1)), J, H3), jnp.zeros((B, nv, nv)))
bench('H = JT*w @ J  (DEFAULT bf16)',
      lambda c: dotg(jnp.transpose(J * (w + c[0, 0, 0] * 1e-9)[:, :, None],
                                   (0, 2, 1)), J, None), jnp.zeros((B, nv, nv)))

Hm = M + jax.block_until_ready(dotg(jnp.transpose(J * w[:, :, None],
                                                  (0, 2, 1)), J, HI))

bench('solve_psd (vmapped linalg tier)',
      lambda c: jax.vmap(linalg.solve_psd)(Hm, g + 1e-9 * c), g)
bench('cholesky only (linalg.cholesky)',
      lambda c: jax.vmap(linalg.cholesky)(
          Hm + 1e-9 * c[0, 0] * jnp.eye(nv)[None]), Hm)

# bf16 Gram form: S = J*sqrt(w) in f32, cast bf16, H = M + S^T S
def gram_bf16(c):
  s = (J * jnp.sqrt(w + 1e-9 * c[0, 0, 0])[:, :, None]).astype(jnp.bfloat16)
  return M + jax.lax.dot_general(
      s, s, (((1,), (1,)), ((0,), (0,))),
      preferred_element_type=jnp.float32)


bench('H = M + S^T S (bf16 Gram)', gram_bf16, jnp.zeros((B, nv, nv)))

# accuracy of the Gram form vs HIGHEST
h_ref = M + dotg(jnp.transpose(J * w[:, :, None], (0, 2, 1)), J, HI)
h_bf = jax.block_until_ready(gram_bf16(jnp.zeros((B, nv, nv))))
rel = (jnp.abs(h_bf - h_ref).max()
       / jnp.maximum(jnp.abs(h_ref).max(), 1e-9))
import numpy as _np
print(f'bf16 Gram rel err: {float(rel):.2e}; '
      f'min eig shift check: chol ok = '
      f'{bool(_np.isfinite(_np.asarray(jax.vmap(linalg.cholesky)(h_bf + 1e-6 * jnp.eye(nv)[None]))).all())}')

bench('J @ delta (HIGHEST)',
      lambda c: jnp.einsum('bev,bv->be', J, g + 1e-9 * c[:, :1] * 0
                           + 1e-9 * jnp.sum(c, 1, keepdims=True),
                           precision=HI)[:, :nv], g)
bench('JT @ f (HIGHEST)',
      lambda c: jnp.einsum('bev,be->bv', J, jar + 1e-9 * c[:, :1],
                           precision=HI), jar[:, :nv] * 0 + jar[:, :nefc])

# a line-search-like chain: 12 fused elementwise sweeps over (B, nefc)
def ls_chain(c):
  alpha = c
  for _ in range(12):
    jar_a = jar + alpha[:, None] * (jar * 0.1)
    f = jnp.where(jar_a < 0, -d_ * jar_a, 0.0)
    dp = jnp.sum(f * jar_a, axis=1)
    alpha = alpha - 0.01 * dp
  return alpha


bench('line-search chain (12 sweeps)', ls_chain, jnp.ones((B,)))

# selects over the carry (x, jar, f, w, ell) as in the accepted-step merge
def selects(c):
  imp = c[:, 0] > 0
  out = []
  for arr in (jar, w, d_):
    out.append(jnp.where(imp[:, None], arr * 1.0000001, arr))
  return out[0] + out[1] + out[2]


bench('carry selects (3x (B,nefc))', selects, jar)

# M matvecs
bench('M @ v x2', lambda c: jnp.einsum(
    'bij,bj->bi', M, c, precision=HI), g)
