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
