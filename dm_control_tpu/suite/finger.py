"""Finger domain (reference: dm_control/suite/finger.py)."""

from __future__ import annotations

import collections
import functools

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import engine
from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite import common
from dm_control_tpu.utils import containers

_DEFAULT_TIME_LIMIT = 20
_CONTROL_TIMESTEP = .02
_EASY_TARGET_SIZE = 0.07
_HARD_TARGET_SIZE = 0.03
_SPIN_VELOCITY = 15.0
SUITE = containers.TaggedTasks()


@functools.lru_cache(maxsize=None)
def _model(spin: bool, target_size: float = 0.0):
  m = engine.load_model(common.model_path('finger.xml'))
  if spin:
    # spin task fixes hinge damping at 0.03 (suite/finger.py:146)
    m.dof_damping = m.dof_damping.copy()
    m.dof_damping[int(m.jnt_dofadr[m.name2id('joint', 'hinge')])] = .03
  elif target_size > 0:
    m.site_size = m.site_size.copy()
    m.site_size[m.name2id('site', 'target'), 0] = target_size
  return m


def _sensor_slice(m, name):
  s = m.name2id('sensor', name)
  adr, dim = int(m.sensor_adr[s]), int(m.sensor_dim[s])
  return slice(adr, adr + dim)


def _common_fns(m):
  sl = {name: _sensor_slice(m, name) for name in
        ['touchtop', 'touchbottom', 'proximal', 'distal',
         'proximal_velocity', 'distal_velocity', 'hinge_velocity',
         'tip', 'spinner', 'target']}

  def touch(d):
    return jnp.log1p(jnp.concatenate(
        [d.sensordata[sl['touchtop']], d.sensordata[sl['touchbottom']]]))

  def tip_position(d):
    return (d.sensordata[sl['tip']][jnp.array([0, 2])]
            - d.sensordata[sl['spinner']][jnp.array([0, 2])])

  def target_position(d):
    return (d.sensordata[sl['target']][jnp.array([0, 2])]
            - d.sensordata[sl['spinner']][jnp.array([0, 2])])

  def bounded_position(d):
    return jnp.concatenate([
        d.sensordata[sl['proximal']], d.sensordata[sl['distal']],
        tip_position(d)])

  def velocity(d):
    return jnp.concatenate([
        d.sensordata[sl['proximal_velocity']],
        d.sensordata[sl['distal_velocity']],
        d.sensordata[sl['hinge_velocity']]])

  return sl, touch, tip_position, target_position, bounded_position, velocity


def _random_joints_init(m):
  def init_episode(m_, d, key):
    def sample(d_, k):
      qpos = base.randomize_limited_and_rotational_joints(m_, d_.qpos, k)
      return d_.replace(qpos=qpos)
    return base.collision_free_init(sample, m_, d, key, max_attempts=20)
  return init_episode


@functools.lru_cache(maxsize=None)
def _make_spin_task():
  m = _model(spin=True)
  sl, touch, _, _, bounded_position, velocity = _common_fns(m)

  def get_observation(m_, d):
    obs = collections.OrderedDict()
    obs['position'] = bounded_position(d)
    obs['velocity'] = velocity(d)
    obs['touch'] = touch(d)
    return obs

  def get_reward(m_, d):
    hinge_vel = d.sensordata[sl['hinge_velocity']][0]
    return (hinge_vel <= -_SPIN_VELOCITY).astype(d.qpos.dtype)

  return control.TaskDef(
      name='finger_spin', model=m, init_episode=_random_joints_init(m),
      get_observation=get_observation, get_reward=get_reward,
      control_timestep=_CONTROL_TIMESTEP, expensive_init=True)


@functools.lru_cache(maxsize=None)
def _make_turn_task(target_size: float):
  m = _model(spin=False, target_size=target_size)
  (sl, touch, tip_position, target_position, bounded_position,
   velocity) = _common_fns(m)
  hinge = m.name2id('joint', 'hinge')
  s_target = m.name2id('site', 'target')
  cap1 = m.name2id('geom', 'cap1')
  radius = float(m.geom_size[cap1].sum())

  def init_episode(m_, d, key):
    k1, k2 = jax.random.split(key)
    d = _random_joints_init(m_)(m_, d, k1)
    # target at a random angle around the hinge (suite/finger.py:180-186);
    # hinge anchor depends only on proximal/distal qpos just set, so run
    # kinematics to place the target.
    from dm_control_tpu._src import smooth as _smooth
    dk = _smooth.kinematics(m_, d)
    target_angle = jax.random.uniform(k2, minval=-jnp.pi, maxval=jnp.pi)
    hx = dk.xanchor[hinge, 0]
    hz = dk.xanchor[hinge, 2]
    site_pos = jnp.asarray(m_.site_pos, d.qpos.dtype)
    site_pos = site_pos.at[s_target, 0].set(
        hx + radius * jnp.sin(target_angle))
    site_pos = site_pos.at[s_target, 2].set(
        hz + radius * jnp.cos(target_angle))
    mv = dict(d.model_var or {})
    mv['site_pos'] = site_pos
    return d.replace(model_var=mv)

  target_radius = float(m.site_size[s_target, 0])

  def _dist_to_target(d):
    return (jnp.linalg.norm(target_position(d) - tip_position(d))
            - target_radius)

  def get_observation(m_, d):
    obs = collections.OrderedDict()
    obs['position'] = bounded_position(d)
    obs['velocity'] = velocity(d)
    obs['touch'] = touch(d)
    obs['target_position'] = target_position(d)
    obs['dist_to_target'] = _dist_to_target(d)
    return obs

  def get_reward(m_, d):
    return (_dist_to_target(d) <= 0).astype(d.qpos.dtype)

  return control.TaskDef(
      name='finger_turn', model=m, init_episode=init_episode,
      get_observation=get_observation, get_reward=get_reward,
      control_timestep=_CONTROL_TIMESTEP, expensive_init=True)


@SUITE.add('benchmarking')
def spin(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
  return control.Environment(_make_spin_task(), time_limit=time_limit,
                             random=random, **(environment_kwargs or {}))


@SUITE.add('benchmarking')
def turn_easy(time_limit=_DEFAULT_TIME_LIMIT, random=None,
              environment_kwargs=None):
  return control.Environment(
      _make_turn_task(_EASY_TARGET_SIZE), time_limit=time_limit,
      random=random, **(environment_kwargs or {}))


@SUITE.add('benchmarking')
def turn_hard(time_limit=_DEFAULT_TIME_LIMIT, random=None,
              environment_kwargs=None):
  return control.Environment(
      _make_turn_task(_HARD_TARGET_SIZE), time_limit=time_limit,
      random=random, **(environment_kwargs or {}))
