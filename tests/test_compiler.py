"""MJCF compiler parity vs the MuJoCo CPU oracle.

Compares every physics-relevant compiled Model field against mujoco's own
compiler output for the reference suite XMLs (SURVEY.md section 2.6).
"""

import numpy as np
import pytest

import mujoco

from dm_control_tpu import mjcf
from dm_control_tpu._src import types as T

from conftest import SUITE_DIR

# Domains whose XMLs use only supported features (no mesh/hfield/muscle).
XMLS = [
    'pendulum.xml',
    'cartpole.xml',
    'point_mass.xml',
    'reacher.xml',
    'acrobot.xml',
    'swimmer.xml',
    'ball_in_cup.xml',
    'hopper.xml',
    'walker.xml',
    'cheetah.xml',
    'finger.xml',
    'fish.xml',
    'humanoid.xml',
    'manipulator.xml',
]


def _oracle(path):
  return mujoco.MjModel.from_xml_path(path)


@pytest.mark.parametrize('xml', XMLS)
def test_sizes(xml):
  path = f'{SUITE_DIR}/{xml}'
  ref = _oracle(path)
  m = mjcf.compile_path(path)
  assert m.nq == ref.nq, f'nq {m.nq} != {ref.nq}'
  assert m.nv == ref.nv
  assert m.nu == ref.nu
  assert m.na == ref.na
  assert m.nbody == ref.nbody
  assert m.njnt == ref.njnt
  assert m.ngeom == ref.ngeom
  assert m.nsite == ref.nsite
  assert m.ntendon == ref.ntendon
  assert m.nsensordata == ref.nsensordata
  assert m.neq == ref.neq


@pytest.mark.parametrize('xml', XMLS)
def test_body_fields(xml):
  path = f'{SUITE_DIR}/{xml}'
  ref = _oracle(path)
  m = mjcf.compile_path(path)
  np.testing.assert_array_equal(m.body_parentid, ref.body_parentid)
  np.testing.assert_array_equal(m.body_rootid, ref.body_rootid)
  np.testing.assert_array_equal(m.body_weldid, ref.body_weldid)
  np.testing.assert_array_equal(m.body_jntnum, ref.body_jntnum)
  np.testing.assert_array_equal(m.body_dofnum, ref.body_dofnum)
  np.testing.assert_array_equal(m.body_dofadr, ref.body_dofadr)
  np.testing.assert_allclose(m.body_pos, ref.body_pos, atol=1e-12)
  np.testing.assert_allclose(m.body_quat, ref.body_quat, atol=1e-9)
  np.testing.assert_allclose(m.body_mass, ref.body_mass, atol=1e-9)
  np.testing.assert_allclose(m.body_subtreemass, ref.body_subtreemass,
                             atol=1e-9)
  np.testing.assert_allclose(m.body_ipos, ref.body_ipos, atol=1e-9)
  # Compare full rotational inertia tensors (principal frame conventions
  # may differ in degenerate cases).
  for i in range(m.nbody):
    def full(diag, quat):
      w, x, y, z = quat
      r = np.array([
          [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
          [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
          [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
      ])
      return r @ np.diag(diag) @ r.T
    ours = full(m.body_inertia[i], m.body_iquat[i])
    theirs = full(ref.body_inertia[i], ref.body_iquat[i])
    np.testing.assert_allclose(ours, theirs, atol=1e-9,
                               err_msg=f'body {i} inertia')


@pytest.mark.parametrize('xml', XMLS)
def test_joint_dof_fields(xml):
  path = f'{SUITE_DIR}/{xml}'
  ref = _oracle(path)
  m = mjcf.compile_path(path)
  np.testing.assert_array_equal(m.jnt_type, ref.jnt_type)
  np.testing.assert_array_equal(m.jnt_qposadr, ref.jnt_qposadr)
  np.testing.assert_array_equal(m.jnt_dofadr, ref.jnt_dofadr)
  np.testing.assert_array_equal(m.jnt_bodyid, ref.jnt_bodyid)
  np.testing.assert_array_equal(m.jnt_limited, ref.jnt_limited.astype(bool))
  np.testing.assert_allclose(m.jnt_range, ref.jnt_range, atol=1e-12)
  np.testing.assert_allclose(m.jnt_axis, ref.jnt_axis, atol=1e-12)
  np.testing.assert_allclose(m.jnt_pos, ref.jnt_pos, atol=1e-12)
  np.testing.assert_allclose(m.jnt_stiffness, ref.jnt_stiffness, atol=1e-12)
  np.testing.assert_allclose(m.jnt_solref, ref.jnt_solref, atol=1e-12)
  np.testing.assert_allclose(m.jnt_solimp, ref.jnt_solimp, atol=1e-12)
  np.testing.assert_array_equal(m.dof_bodyid, ref.dof_bodyid)
  np.testing.assert_array_equal(m.dof_jntid, ref.dof_jntid)
  np.testing.assert_array_equal(m.dof_parentid, ref.dof_parentid)
  np.testing.assert_allclose(m.dof_armature, ref.dof_armature, atol=1e-12)
  np.testing.assert_allclose(m.dof_damping, ref.dof_damping, atol=1e-12)
  np.testing.assert_allclose(m.dof_frictionloss, ref.dof_frictionloss,
                             atol=1e-12)
  np.testing.assert_allclose(m.qpos0, ref.qpos0, atol=1e-12)
  np.testing.assert_allclose(m.qpos_spring, ref.qpos_spring, atol=1e-12)


@pytest.mark.parametrize('xml', XMLS)
def test_geom_site_fields(xml):
  path = f'{SUITE_DIR}/{xml}'
  ref = _oracle(path)
  m = mjcf.compile_path(path)
  np.testing.assert_array_equal(m.geom_type, ref.geom_type)
  np.testing.assert_array_equal(m.geom_bodyid, ref.geom_bodyid)
  np.testing.assert_array_equal(m.geom_contype, ref.geom_contype)
  np.testing.assert_array_equal(m.geom_conaffinity, ref.geom_conaffinity)
  np.testing.assert_array_equal(m.geom_condim, ref.geom_condim)
  np.testing.assert_allclose(m.geom_pos, ref.geom_pos, atol=1e-12)
  for i in range(m.ngeom):
    q1, q2 = m.geom_quat[i], ref.geom_quat[i]
    assert min(np.abs(q1 - q2).max(), np.abs(q1 + q2).max()) < 1e-9, (
        f'geom {i} quat {q1} vs {q2}')
  np.testing.assert_allclose(m.geom_size, ref.geom_size, atol=1e-12)
  np.testing.assert_allclose(m.geom_friction, ref.geom_friction, atol=1e-12)
  np.testing.assert_allclose(m.geom_solref, ref.geom_solref, atol=1e-12)
  np.testing.assert_allclose(m.geom_solimp, ref.geom_solimp, atol=1e-12)
  np.testing.assert_allclose(m.geom_rbound, ref.geom_rbound, atol=1e-9)
  np.testing.assert_allclose(m.site_pos, ref.site_pos, atol=1e-12)
  np.testing.assert_array_equal(m.site_bodyid, ref.site_bodyid)


@pytest.mark.parametrize('xml', XMLS)
def test_actuator_fields(xml):
  path = f'{SUITE_DIR}/{xml}'
  ref = _oracle(path)
  m = mjcf.compile_path(path)
  np.testing.assert_array_equal(m.actuator_trntype, ref.actuator_trntype)
  np.testing.assert_array_equal(m.actuator_dyntype, ref.actuator_dyntype)
  np.testing.assert_array_equal(
      m.actuator_trnid[:, 0], ref.actuator_trnid[:, 0])
  np.testing.assert_allclose(m.actuator_gear, ref.actuator_gear, atol=1e-12)
  np.testing.assert_allclose(m.actuator_gainprm[:, :3],
                             ref.actuator_gainprm[:, :3], atol=1e-12)
  np.testing.assert_allclose(m.actuator_biasprm[:, :3],
                             ref.actuator_biasprm[:, :3], atol=1e-12)
  np.testing.assert_allclose(m.actuator_dynprm[:, :1],
                             ref.actuator_dynprm[:, :1], atol=1e-12)
  np.testing.assert_array_equal(m.actuator_ctrllimited,
                                ref.actuator_ctrllimited.astype(bool))
  np.testing.assert_allclose(m.actuator_ctrlrange, ref.actuator_ctrlrange,
                             atol=1e-12)
  np.testing.assert_array_equal(m.actuator_actadr, ref.actuator_actadr)


@pytest.mark.parametrize('xml', XMLS)
def test_option_and_misc(xml):
  path = f'{SUITE_DIR}/{xml}'
  ref = _oracle(path)
  m = mjcf.compile_path(path)
  assert abs(m.opt.timestep - ref.opt.timestep) < 1e-12
  np.testing.assert_allclose(m.opt.gravity, ref.opt.gravity, atol=1e-12)
  assert m.opt.density == ref.opt.density
  assert m.opt.viscosity == ref.opt.viscosity
  assert int(m.opt.integrator) == ref.opt.integrator
  assert m.opt.disableflags == ref.opt.disableflags
  # tendons
  np.testing.assert_array_equal(m.tendon_adr, ref.tendon_adr)
  np.testing.assert_array_equal(m.tendon_num, ref.tendon_num)
  np.testing.assert_allclose(m.tendon_stiffness, ref.tendon_stiffness,
                             atol=1e-12)
  np.testing.assert_allclose(m.tendon_damping, ref.tendon_damping,
                             atol=1e-12)
  if m.nwrap:
    np.testing.assert_array_equal(m.wrap_objid, ref.wrap_objid)
  # sensors
  np.testing.assert_array_equal(m.sensor_adr, ref.sensor_adr)
  np.testing.assert_array_equal(m.sensor_dim, ref.sensor_dim)
  np.testing.assert_array_equal(m.sensor_objid, ref.sensor_objid)
  # keyframes
  assert m.nkey == ref.nkey
  if m.nkey:
    np.testing.assert_allclose(m.key_qpos, ref.key_qpos, atol=1e-12)


@pytest.mark.parametrize('xml', XMLS)
def test_collision_pair_enumeration(xml):
  """Our static pair list must cover what mujoco's broadphase can emit."""
  path = f'{SUITE_DIR}/{xml}'
  ref = _oracle(path)
  m = mjcf.compile_path(path)
  if m.opt.disableflags & T.DisableBit.CONTACT:
    return
  ours = set()
  for (_, _), lst in m.collision_pairs.items():
    for g1, g2, _ in lst:
      ours.add((min(g1, g2), max(g1, g2)))
  # simulate a few steps and confirm every oracle contact pair is in our set
  d = mujoco.MjData(ref)
  rng = np.random.RandomState(0)
  for _ in range(100):
    d.ctrl = rng.uniform(-1, 1, ref.nu)
    mujoco.mj_step(ref, d)
    for i in range(d.ncon):
      g1, g2 = d.contact.geom1[i], d.contact.geom2[i]
      pair = (min(g1, g2), max(g1, g2))
      assert pair in ours, f'missing candidate pair {pair} in {xml}'
