"""Full-step trajectory parity vs the MuJoCo CPU oracle.

Steps both engines from identical states with identical control sequences
and compares state trajectories (the BASELINE.json correctness mandate:
bit-level state parity per task under fixed seed within float tolerance).
"""

import functools

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dm_control_tpu._src import engine
from dm_control_tpu._src import forward

from conftest import SUITE_DIR

# (xml, n_steps, atol): smooth models allow tight tolerances; contact-rich
# models accumulate solver differences faster.
CASES = [
    ('pendulum.xml', 200, 1e-8),
    ('cartpole.xml', 200, 1e-8),
    ('point_mass.xml', 200, 1e-8),
    ('reacher.xml', 200, 1e-8),
    ('acrobot.xml', 200, 1e-8),
    ('swimmer.xml', 200, 1e-7),
    ('fish.xml', 200, 1e-7),
]


@functools.lru_cache(maxsize=None)
def _models(xml):
  path = f'{SUITE_DIR}/{xml}'
  ref = mujoco.MjModel.from_xml_path(path)
  m = engine.load_model(path)
  step = engine.build_step(m)
  return ref, m, step


@pytest.mark.parametrize('xml,n_steps,atol', CASES)
def test_trajectory_parity(xml, n_steps, atol):
  ref, m, step = _models(xml)
  rd = mujoco.MjData(ref)
  rng = np.random.RandomState(0)
  qpos = ref.qpos0 + rng.uniform(-0.05, 0.05, ref.nq)
  for j in range(ref.njnt):
    jt, adr = ref.jnt_type[j], ref.jnt_qposadr[j]
    if jt == 0:
      q = rng.randn(4)
      qpos[adr + 3:adr + 7] = q / np.linalg.norm(q)
    elif jt == 1:
      q = rng.randn(4)
      qpos[adr:adr + 4] = q / np.linalg.norm(q)
  rd.qpos[:] = qpos
  d = engine.make_data(m)
  d = d.replace(qpos=jnp.asarray(qpos))
  # establish the step1-synced invariant (as reset/forward do)
  d = engine.build_forward(m)(d)

  ctrls = rng.uniform(-1, 1, (n_steps, ref.nu))
  max_err = 0.0
  for t in range(n_steps):
    rd.ctrl[:] = ctrls[t]
    mujoco.mj_step(ref, rd)
    d = step(d.replace(ctrl=jnp.asarray(ctrls[t])))
    err = np.abs(np.asarray(d.qpos) - rd.qpos).max()
    max_err = max(max_err, err)
    assert err < atol, f'{xml} diverged at step {t}: |dqpos|={err:.3e}'
  assert np.abs(np.asarray(d.qvel) - rd.qvel).max() < atol * 100


def test_substeps_matches_per_step_loop():
  """substeps() (minimal-carry scan, standard stage order) must
  reproduce the legacy per-step loop EXACTLY: same trajectory, same
  final derived fields, same sensordata.  Guards against derived state
  (contacts/Jacobians) going stale across the scan carry — a bug that
  once made the acc stage solve with control-step-initial contacts."""
  import jax
  from dm_control_tpu import suite as _suite

  for dom, task_name, n in [('walker', 'walk', 10), ('humanoid', 'run', 5)]:
    task = _suite.build_task(dom, task_name)
    m = task.model
    d = forward.make_data(m)
    d = task.init_episode(m, d, jax.random.PRNGKey(3))
    d = forward.forward(m, d)
    lo = np.where(m.actuator_ctrllimited, m.actuator_ctrlrange[:, 0], -1.0)
    hi = np.where(m.actuator_ctrllimited, m.actuator_ctrlrange[:, 1], 1.0)
    ctrl = jnp.asarray(
        np.random.RandomState(0).uniform(lo, hi), d.qpos.dtype)
    d = d.replace(ctrl=ctrl)

    a = forward.substeps(m, d, n)
    b = d
    for _ in range(n):
      b = forward.step(m, b)

    # not bitwise: the fused scan body schedules f64 ops differently
    # from the eager per-step loop (measured 2.4e-11 over 5 humanoid
    # contact steps); the stale-derived-state bug this guards against
    # shows up at 1e-2+
    np.testing.assert_allclose(a.qpos, b.qpos, atol=1e-8, rtol=0,
                               err_msg=f'{dom} qpos')
    np.testing.assert_allclose(a.qvel, b.qvel, atol=1e-8, rtol=0,
                               err_msg=f'{dom} qvel')
    np.testing.assert_allclose(a.qacc, b.qacc, atol=1e-6, rtol=1e-6,
                               err_msg=f'{dom} qacc')
    np.testing.assert_allclose(a.sensordata, b.sensordata, atol=1e-6,
                               rtol=1e-6, err_msg=f'{dom} sensordata')
    np.testing.assert_allclose(a.energy, b.energy, atol=1e-6, rtol=1e-6,
                               err_msg=f'{dom} energy')
    assert float(a.time) == float(b.time)


def test_substeps_n1_self_syncs_unsynced_input():
  """The n<=1 fast path must re-sync derived fields before stepping.

  The batched runner's scan carries ONLY the integration state and
  grafts it onto a loop-invariant Data template (parallel/runner.py),
  so substeps() receives Data whose qM/contacts/qfrc_bias belong to a
  DIFFERENT state.  A fast path that steps without step1 consumes those
  stale fields — on cartpole this produced qacc errors of ~23
  (round-4 advisor finding, forward.py:622)."""
  import jax
  from dm_control_tpu import suite as _suite

  task = _suite.build_task('cartpole', 'swingup')
  m = task.model
  d0 = forward.make_data(m)
  d0 = task.init_episode(m, d0, jax.random.PRNGKey(7))
  d0 = forward.forward(m, d0)
  # evolve a few steps to get a state distinct from the template
  d = d0.replace(ctrl=jnp.full((m.nu,), 0.7, d0.qpos.dtype))
  for _ in range(5):
    d = forward.step(m, d)

  # graft the evolved integration state onto the STALE template, the way
  # rollout_fn/auto-reset do
  stale = d0.replace(**{f: getattr(d, f) for f in forward._STATE_FIELDS})
  a = forward.substeps(m, stale, 1)
  b = forward.step(m, d)  # synced input, ground truth
  np.testing.assert_allclose(a.qpos, b.qpos, atol=1e-12, rtol=0)
  np.testing.assert_allclose(a.qvel, b.qvel, atol=1e-12, rtol=0)
  np.testing.assert_allclose(a.qacc, b.qacc, atol=1e-9, rtol=1e-9)


def test_runner_n1_matches_single_env_loop():
  """BatchedEnv rollout on an n_sub==1 task must match the eager
  single-env step loop (same ctrl sequence, same trajectory)."""
  import jax
  from dm_control_tpu import suite as _suite
  from dm_control_tpu.parallel import runner as _runner

  task = _suite.build_task('cartpole', 'balance')
  m = task.model
  env = _runner.BatchedEnv(task, batch_size=2, auto_reset=False)
  assert env.n_sub_steps == 1  # the fast-path regime under test
  state = env.reset(jax.random.PRNGKey(0))

  # eager ground truth for lane 0
  d = jax.tree_util.tree_map(lambda x: x[0], state.data)
  ctrls = np.linspace(-0.9, 0.9, 8)
  for c in ctrls:
    d = forward.step(m, d.replace(ctrl=jnp.full((m.nu,), c, d.qpos.dtype)))

  for c in ctrls:
    actions = jnp.full((2, m.nu), c, state.data.qpos.dtype)
    state, _ = env.step(state, actions)
  np.testing.assert_allclose(state.data.qpos[0], d.qpos, atol=1e-10, rtol=0)
  np.testing.assert_allclose(state.data.qvel[0], d.qvel, atol=1e-10, rtol=0)
