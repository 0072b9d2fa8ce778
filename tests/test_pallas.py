"""Pallas Newton kernel equivalence vs the XLA solver core.

Runs only when a TPU is available (the kernel is TPU-only); the CPU
battery covers the XLA path against the MuJoCo oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tpu_available():
  try:
    import jax.extend.backend
    return any(d.platform == 'tpu' for d in jax.devices())
  except Exception:
    return False


pytestmark = pytest.mark.skipif(
    not _tpu_available(), reason='requires TPU (kernel is TPU-only)')


@pytest.mark.parametrize('domain,task_name', [
    ('cheetah', 'run'), ('walker', 'walk'),
])
def test_kernel_matches_xla_core(domain, task_name):
  from dm_control_tpu import suite
  from dm_control_tpu._src import forward as fwd
  from dm_control_tpu._src import solver
  from dm_control_tpu.ops import newton_kernel

  task = suite.build_task(domain, task_name)
  m = task.model
  keys = jax.random.split(jax.random.PRNGKey(0), 128)

  def init_one(k):
    d = fwd.make_data(m)
    qpos = d.qpos.at[2:].add(0.1 * jax.random.normal(k, (m.nq - 2,)))
    return fwd.forward(m, d.replace(qpos=qpos))

  db = jax.jit(jax.vmap(init_one))(keys)
  types = solver.row_types(m)

  def xla(d):
    return solver._solve_core_xla(
        d.efc_J, d.qM, d.efc_aref, d.efc_D, d.efc_frictionloss,
        d.efc_active.astype(d.qpos.dtype), d.qacc_smooth,
        types_np=types, niter=10, ls_iter=8)

  x_ref, f_ref = jax.jit(jax.vmap(xla))(db)
  x_pal, f_pal = jax.jit(lambda d: newton_kernel.newton_solve_batched(
      d.efc_J, d.qM, d.efc_aref, d.efc_D, d.efc_frictionloss,
      d.efc_active.astype(d.qpos.dtype), d.qacc_smooth,
      types, 10, 8))(db)

  # same optimum up to f32 reduction-order noise
  scale = np.maximum(1.0, np.abs(np.asarray(x_ref)))
  rel = np.abs(np.asarray(x_ref) - np.asarray(x_pal)) / scale
  assert rel.max() < 5e-2, f'qacc rel err {rel.max()}'
