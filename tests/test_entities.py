"""Entities tier: primitive props, position detector, Jaco arm entity
(reference: entities/props/primitive.py, position_detector.py,
manipulators/kinova/)."""

import numpy as np
import pytest

from dm_control_tpu.composer.environment import Environment
from dm_control_tpu.composer.task import ComposerTask
from dm_control_tpu.entities import JacoArm, props
from dm_control_tpu.locomotion import arenas


def _floor():
  return arenas.floor(size=(4.0, 4.0), timestep=0.005)


def test_primitive_prop_observables():
  prop = props.Primitive('sphere', (0.1,), name='ball', mass=0.5,
                         pos=(0.3, 0.0, 0.4))
  task = ComposerTask(arena=_floor(), control_timestep=0.02)
  task.attach(prop)
  env = Environment(task, time_limit=1.0, random=0)
  ts = env.reset()
  for key in ('ball/position', 'ball/orientation', 'ball/linear_velocity',
              'ball/angular_velocity'):
    assert key in ts.observation, sorted(ts.observation)
  np.testing.assert_allclose(ts.observation['ball/position'][:2],
                             [0.3, 0.0], atol=1e-9)
  # drop under gravity
  nu = env.action_spec().shape[0]
  for _ in range(5):
    ts = env.step(np.zeros(nu))
  assert ts.observation['ball/linear_velocity'][2] < -0.1


def test_primitive_validates_size():
  with pytest.raises(ValueError):
    props.Primitive('box', (0.1,))
  with pytest.raises(ValueError):
    props.Primitive('cone', (0.1,))


def test_position_detector_modes():
  prop = props.Primitive('box', (0.05, 0.05, 0.05), name='cube',
                         pos=(0.0, 0.0, 0.2))
  det = props.PositionDetector(pos=(0.0, 0.0), size=(0.5, 0.5))
  det3 = props.PositionDetector(pos=(5.0, 5.0, 1.0),
                                size=(0.2, 0.2, 0.2))
  inv = props.PositionDetector(pos=(5.0, 5.0), size=(0.2, 0.2),
                               inverted=True)
  task = ComposerTask(arena=_floor(), control_timestep=0.02)
  task.attach(prop)
  m = task.compile()
  body = m.name2id('body', 'cube/cube')
  task.add_observable('in_region', det.observable(body))
  env = Environment(task, time_limit=1.0, random=0)
  ts = env.reset()
  d = env.physics
  assert ts.observation['in_region'][0] == 1.0
  assert not bool(det3.detected(m, d, body))
  assert bool(inv.detected(m, d, body))
  with pytest.raises(ValueError):
    props.PositionDetector(pos=(0, 0), size=(1, 1, 1))


def test_jaco_arm_entity():
  arm = JacoArm()
  task = ComposerTask(arena=_floor(), control_timestep=0.02)
  task.attach(arm)
  env = Environment(task, time_limit=0.5, random=0)
  ts = env.reset()
  assert 'jaco/joints_pos' in ts.observation
  assert 'jaco/joints_vel' in ts.observation
  n = ts.observation['jaco/joints_vel'].shape[0]
  assert n >= 7  # 7 arm joints (+ finger joints)
  assert ts.observation['jaco/joints_pos'].shape == (2 * n,)


def test_robot_arm_hand_abstraction_tier():
  """RobotArm/RobotHand surface (reference entities/manipulators/
  base.py:44,185): joint bounds, in-graph randomization, grasp
  mapping, IK set_site_to_xpos with retry."""
  import jax
  import jax.numpy as jnp
  from dm_control_tpu._src import forward as fwd
  from dm_control_tpu.entities.manipulators import JacoArm, JacoHand

  arm = JacoArm()
  hand = JacoHand()
  task = ComposerTask(arena=_floor(), control_timestep=0.02)
  task.attach(arm)
  m = task.compile()

  assert arm.attachment_site == 'jaco/wrist_site'
  assert hand.tool_center_point == 'jaco/pinch_site'
  m.name2id('site', 'jaco/wrist_site')   # raises if the site is absent
  m.name2id('site', 'jaco/pinch_site')

  bounds = arm.joint_pos_sampling_bounds(m)
  assert bounds.shape == (2, 7)
  assert (bounds[1] >= bounds[0]).all()

  d = fwd.forward(m, fwd.make_data(m))
  d1 = arm.randomize_arm_joints(m, d, jax.random.PRNGKey(0))
  d2 = arm.randomize_arm_joints(m, d, jax.random.PRNGKey(1))
  qs, _ = arm.joint_addrs(m)
  assert not np.allclose(np.asarray(d1.qpos)[qs], np.asarray(d2.qpos)[qs])
  q = np.asarray(d1.qpos)[qs]
  assert (q >= bounds[0] - 1e-9).all() and (q <= bounds[1] + 1e-9).all()

  # grasp: close factor 0 -> open qpos, 1 -> closed qpos
  d_open = hand.set_grasp(m, d, 0.0)
  d_shut = hand.set_grasp(m, d, 1.0)
  fq = [m.jnt_qposadr[m.name2id('joint', f'jaco/{n}')]
        for n in ('jaco_joint_finger_1', 'jaco_joint_finger_2',
                  'jaco_joint_finger_3')]
  np.testing.assert_allclose(np.asarray(d_open.qpos)[fq], 0.0, atol=1e-9)
  np.testing.assert_allclose(np.asarray(d_shut.qpos)[fq], 1.1, atol=1e-9)

  # IK, position-only: any reachable point solves exactly
  target = jnp.asarray([0.3, 0.2, 0.4])
  d_ik, ok = arm.set_site_to_xpos(
      m, d, jax.random.PRNGKey(2), 'jaco/pinch_site', target,
      target_quat=None)
  d_ik = fwd.forward(m, d_ik)
  site = m.name2id('site', 'jaco/pinch_site')
  err = float(jnp.linalg.norm(d_ik.site_xpos[site] - target))
  assert bool(ok), f'IK failed, err={err:.4f}'
  assert err < 2e-3, err

  # IK with orientation: a pose known feasible (FK of a random config)
  from dm_control_tpu.utils import transformations as tr
  d_goal = fwd.forward(m, arm.randomize_arm_joints(
      m, d, jax.random.PRNGKey(5)))
  goal_pos = d_goal.site_xpos[site]
  goal_quat = tr.mat_to_quat(np.asarray(d_goal.site_xmat[site]))
  d_ik2, ok2 = arm.set_site_to_xpos(
      m, d, jax.random.PRNGKey(6), 'jaco/pinch_site', goal_pos,
      target_quat=jnp.asarray(goal_quat), pos_tol=5e-3)
  d_ik2 = fwd.forward(m, d_ik2)
  err2 = float(jnp.linalg.norm(d_ik2.site_xpos[site] - goal_pos))
  assert bool(ok2), f'pose IK failed, err={err2:.4f}'
