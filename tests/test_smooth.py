"""Per-stage smooth-dynamics parity vs the MuJoCo CPU oracle.

Randomized states; each pipeline stage's outputs compared field-by-field
(float64).  This is the engine analog of the reference's real-physics unit
tests (dm_control/mujoco/engine_test.py, SURVEY.md section 4.3).
"""

import functools

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dm_control_tpu import mjcf
from dm_control_tpu._src import forward as fwd
from dm_control_tpu._src import smooth

from conftest import SUITE_DIR

XMLS = [
    'pendulum.xml', 'cartpole.xml', 'point_mass.xml', 'reacher.xml',
    'acrobot.xml', 'swimmer.xml', 'ball_in_cup.xml', 'hopper.xml',
    'walker.xml', 'cheetah.xml', 'finger.xml', 'fish.xml', 'humanoid.xml',
    'manipulator.xml',
]


@functools.lru_cache(maxsize=None)
def _compiled(xml):
  path = f'{SUITE_DIR}/{xml}'
  ref = mujoco.MjModel.from_xml_path(path)
  m = mjcf.compile_path(path)

  @jax.jit
  def run(qpos, qvel, ctrl):
    d = fwd.make_data(m)
    d = d.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)
    d = smooth.kinematics(m, d)
    d = smooth.com_pos(m, d)
    d = smooth.crb(m, d)
    d = smooth.factor_m(m, d)
    d = smooth.tendon(m, d)
    d = smooth.transmission(m, d)
    d = smooth.com_vel(m, d)
    d = smooth.rne(m, d)
    d = fwd.passive(m, d)
    d = fwd.actuation(m, d)
    d = fwd.fwd_acceleration(m, d)
    return d

  return m, ref, run


def _rand_state(ref, seed):
  rng = np.random.RandomState(seed)
  qpos = ref.qpos0 + rng.uniform(-0.3, 0.3, ref.nq)
  for j in range(ref.njnt):
    jt = ref.jnt_type[j]
    adr = ref.jnt_qposadr[j]
    if jt == 0:  # free
      q = rng.randn(4)
      qpos[adr + 3:adr + 7] = q / np.linalg.norm(q)
    elif jt == 1:  # ball
      q = rng.randn(4)
      qpos[adr:adr + 4] = q / np.linalg.norm(q)
  qvel = rng.uniform(-1.0, 1.0, ref.nv)
  ctrl = rng.uniform(-1.0, 1.0, ref.nu)
  return qpos, qvel, ctrl


@functools.lru_cache(maxsize=None)
def _setup(xml, seed=0):
  m, ref, run = _compiled(xml)
  rd = mujoco.MjData(ref)
  qpos, qvel, ctrl = _rand_state(ref, seed)
  rd.qpos[:] = qpos
  rd.qvel[:] = qvel
  rd.ctrl[:] = ctrl
  mujoco.mj_forward(ref, rd)
  d = run(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl))
  return m, d, ref, rd


@pytest.mark.parametrize('xml', XMLS)
@pytest.mark.parametrize('seed', [0, 1])
def test_kinematics(xml, seed):
  m, d, ref, rd = _setup(xml, seed)
  np.testing.assert_allclose(d.xpos, rd.xpos, atol=1e-9)
  for i in range(m.nbody):
    q1, q2 = np.asarray(d.xquat[i]), rd.xquat[i]
    assert min(np.abs(q1 - q2).max(), np.abs(q1 + q2).max()) < 1e-9, (
        f'body {i}: {q1} vs {q2}')
  np.testing.assert_allclose(d.xipos, rd.xipos, atol=1e-9)
  # ximat: principal-axis conventions may differ; compare the full
  # world-frame rotational inertia tensor instead (physics-invariant).
  for i in range(m.nbody):
    ours = np.asarray(d.ximat[i]) @ np.diag(m.body_inertia[i]) @ np.asarray(
        d.ximat[i]).T
    theirs = rd.ximat[i].reshape(3, 3) @ np.diag(
        ref.body_inertia[i]) @ rd.ximat[i].reshape(3, 3).T
    np.testing.assert_allclose(ours, theirs, atol=1e-9,
                               err_msg=f'body {i} world inertia')
  np.testing.assert_allclose(d.geom_xpos, rd.geom_xpos, atol=1e-9)
  np.testing.assert_allclose(
      np.asarray(d.geom_xmat), rd.geom_xmat.reshape(-1, 3, 3), atol=1e-9)
  np.testing.assert_allclose(d.site_xpos, rd.site_xpos, atol=1e-9)


@pytest.mark.parametrize('xml', XMLS)
@pytest.mark.parametrize('seed', [0, 1])
def test_com_quantities(xml, seed):
  m, d, ref, rd = _setup(xml, seed)
  np.testing.assert_allclose(d.subtree_com, rd.subtree_com, atol=1e-9)
  np.testing.assert_allclose(d.cdof, rd.cdof, atol=1e-9)
  qm_ref = np.zeros((ref.nv, ref.nv))
  mujoco.mj_fullM(ref, rd, qm_ref)
  np.testing.assert_allclose(d.qM, qm_ref, atol=1e-9)


@pytest.mark.parametrize('xml', XMLS)
@pytest.mark.parametrize('seed', [0, 1])
def test_velocity_stage(xml, seed):
  m, d, ref, rd = _setup(xml, seed)
  np.testing.assert_allclose(d.cvel, rd.cvel, atol=1e-9)
  np.testing.assert_allclose(d.cdof_dot, rd.cdof_dot, atol=1e-9)
  np.testing.assert_allclose(d.qfrc_bias, rd.qfrc_bias, atol=1e-9)


@pytest.mark.parametrize('xml', XMLS)
@pytest.mark.parametrize('seed', [0, 1])
def test_passive_and_tendon(xml, seed):
  m, d, ref, rd = _setup(xml, seed)
  if m.ntendon:
    np.testing.assert_allclose(d.ten_length, rd.ten_length, atol=1e-9)
    np.testing.assert_allclose(d.ten_velocity, rd.ten_velocity, atol=1e-9)
    ten_j = np.zeros((m.ntendon, m.nv))
    for t in range(m.ntendon):
      adr, nnz = ref.ten_J_rowadr[t], ref.ten_J_rownnz[t]
      for k in range(nnz):
        ten_j[t, ref.ten_J_colind[adr + k]] = rd.ten_J[adr + k]
    np.testing.assert_allclose(d.ten_J, ten_j, atol=1e-9)
  np.testing.assert_allclose(d.qfrc_passive, rd.qfrc_passive, atol=1e-8)


@pytest.mark.parametrize('xml', XMLS)
@pytest.mark.parametrize('seed', [0, 1])
def test_actuation_and_smooth_acc(xml, seed):
  m, d, ref, rd = _setup(xml, seed)
  np.testing.assert_allclose(d.actuator_length, rd.actuator_length,
                             atol=1e-9)
  moment = np.zeros((ref.nu, ref.nv))
  mujoco.mju_sparse2dense(
      moment, rd.actuator_moment.reshape(-1),
      rd.moment_rownnz, rd.moment_rowadr, rd.moment_colind.reshape(-1))
  np.testing.assert_allclose(d.actuator_moment, moment, atol=1e-9)
  np.testing.assert_allclose(d.actuator_velocity, rd.actuator_velocity,
                             atol=1e-9)
  np.testing.assert_allclose(d.actuator_force, rd.actuator_force, atol=1e-9)
  np.testing.assert_allclose(d.qfrc_actuator, rd.qfrc_actuator, atol=1e-9)
  np.testing.assert_allclose(d.qfrc_smooth, rd.qfrc_smooth, atol=1e-8)
  np.testing.assert_allclose(d.qacc_smooth, rd.qacc_smooth, atol=1e-6)
