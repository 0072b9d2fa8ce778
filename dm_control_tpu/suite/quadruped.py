"""Quadruped domain: walk/run (reference: dm_control/suite/quadruped.py).

Escape (heightfield terrain + rangefinders) and fetch (walls + ball) need
hfield collision and ray sensors - deferred (STATUS.md)."""

from __future__ import annotations

import collections
import functools

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import setconst
from dm_control_tpu._src import smooth as _smooth
from dm_control_tpu._src import collision as _collision
from dm_control_tpu.mjcf import compiler as mjcf_compiler
from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite import common
from dm_control_tpu.utils import containers
from dm_control_tpu.utils import rewards
from dm_control_tpu._src.types import JointType, SensorType

_DEFAULT_TIME_LIMIT = 20
_CONTROL_TIMESTEP = .02
_RUN_SPEED = 5
_WALK_SPEED = 0.5
_WALLS = ['wall_px', 'wall_py', 'wall_nx', 'wall_ny']
SUITE = containers.TaggedTasks()


@functools.lru_cache(maxsize=None)
def _model(floor_size: float):
  """Strip walls/ball/target/terrain/rangefinders and resize the floor
  (reference suite/quadruped.py:60-98)."""
  root = common.load_xml_root('quadruped.xml')

  def remove(tag, name):
    for parent in root.iter():
      for child in list(parent):
        if child.tag == tag and child.attrib.get('name') == name:
          parent.remove(child)
          return

  for el in root.iter('geom'):
    if el.attrib.get('name') == 'floor':
      el.set('size', f'{floor_size} {floor_size} .5')
  for wall in _WALLS:
    remove('geom', wall)
  remove('body', 'ball')
  remove('site', 'target')
  remove('geom', 'terrain')
  for sec in root.findall('sensor'):
    for el in list(sec):
      if el.tag == 'rangefinder':
        sec.remove(el)
  # drop sensors that referenced removed elements
  kept = {el.attrib['name'] for el in root.iter() if 'name' in el.attrib}
  for sec in root.findall('sensor'):
    for el in list(sec):
      ref = (el.attrib.get('site') or el.attrib.get('joint')
             or el.attrib.get('body') or el.attrib.get('objname'))
      if ref and ref not in kept:
        sec.remove(el)
  m = mjcf_compiler.MJCFCompiler(root).build()
  return setconst.set_const(m)


def _sensor_slices(m, stypes):
  out = []
  for s in range(m.nsensor):
    if SensorType(int(m.sensor_type[s])) in stypes:
      adr, dim = int(m.sensor_adr[s]), int(m.sensor_dim[s])
      out.append((adr, dim))
  return out


def _gather(d, slices):
  return jnp.concatenate([d.sensordata[a:a + n] for a, n in slices])


@functools.lru_cache(maxsize=None)
def _make_task(desired_speed: float, floor_size: float):
  m = _model(floor_size)
  torso = m.name2id('body', 'torso')
  root_q = int(m.jnt_qposadr[m.name2id('joint', 'root')])
  hinge_q = jnp.array([int(m.jnt_qposadr[j]) for j in range(m.njnt)
                       if m.jnt_type[j] == JointType.HINGE])
  hinge_d = jnp.array([int(m.jnt_dofadr[j]) for j in range(m.njnt)
                       if m.jnt_type[j] == JointType.HINGE])
  vel_sl = _sensor_slices(m, {SensorType.VELOCIMETER})
  imu_sl = _sensor_slices(m, {SensorType.GYRO, SensorType.ACCELEROMETER})
  ft_sl = _sensor_slices(m, {SensorType.FORCE, SensorType.TORQUE})

  def init_episode(m_, d, key):
    # random orientation, lowest non-contacting height
    # (reference _find_non_contacting_height, suite/quadruped.py:253-283)
    quat = jax.random.normal(key, (4,))
    quat = quat / jnp.linalg.norm(quat)

    heights = jnp.arange(0.0, 1.5, 0.01, dtype=d.qpos.dtype)

    def contact_free(z):
      qpos = d.qpos.at[root_q:root_q + 3].set(
          jnp.stack([0.0, 0.0, z]).astype(d.qpos.dtype))
      qpos = jax.lax.dynamic_update_slice(qpos, quat, (root_q + 3,))
      dd = d.replace(qpos=qpos)
      return jnp.logical_not(base.has_contacts(m_, dd))

    free = jax.lax.map(contact_free, heights)
    z = heights[jnp.argmax(free)]
    qpos = d.qpos.at[root_q:root_q + 3].set(
        jnp.stack([0.0, 0.0, z]).astype(d.qpos.dtype))
    qpos = jax.lax.dynamic_update_slice(qpos, quat, (root_q + 3,))
    return d.replace(qpos=qpos)

  def get_observation(m_, d):
    obs = collections.OrderedDict()
    obs['egocentric_state'] = jnp.concatenate(
        [d.qpos[hinge_q], d.qvel[hinge_d], d.act])
    obs['torso_velocity'] = _gather(d, vel_sl)
    obs['torso_upright'] = d.xmat[torso, 2, 2]
    obs['imu'] = _gather(d, imu_sl)
    obs['force_torque'] = jnp.arcsinh(_gather(d, ft_sl))
    return obs

  def get_reward(m_, d):
    upright = rewards.tolerance(
        d.xmat[torso, 2, 2], bounds=(1.0, float('inf')),
        sigmoid='linear', margin=2.0, value_at_margin=0)
    move = rewards.tolerance(
        _gather(d, vel_sl)[0], bounds=(desired_speed, float('inf')),
        margin=desired_speed, value_at_margin=0.5, sigmoid='linear')
    return upright * move

  return control.TaskDef(
      name='quadruped', model=m, init_episode=init_episode,
      get_observation=get_observation, get_reward=get_reward,
      control_timestep=_CONTROL_TIMESTEP, expensive_init=True)


@SUITE.add()
def walk(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
  return control.Environment(
      _make_task(_WALK_SPEED, _DEFAULT_TIME_LIMIT * _WALK_SPEED),
      time_limit=time_limit, random=random, **(environment_kwargs or {}))


@SUITE.add()
def run(time_limit=_DEFAULT_TIME_LIMIT, random=None, environment_kwargs=None):
  return control.Environment(
      _make_task(_RUN_SPEED, _DEFAULT_TIME_LIMIT * _RUN_SPEED),
      time_limit=time_limit, random=random, **(environment_kwargs or {}))
