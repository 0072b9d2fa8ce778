"""Hopper domain (reference: dm_control/suite/hopper.py)."""

from __future__ import annotations

import collections
import functools

import jax
import jax.numpy as jnp

from dm_control_tpu._src import engine
from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite import common
from dm_control_tpu.utils import containers
from dm_control_tpu.utils import rewards

_DEFAULT_TIME_LIMIT = 20
_CONTROL_TIMESTEP = .02
_STAND_HEIGHT = 0.6
_HOP_SPEED = 2
SUITE = containers.TaggedTasks()


@functools.lru_cache(maxsize=1)
def _model():
  return engine.load_model(common.model_path('hopper.xml'))


def _sensor_slice(m, name):
  s = m.name2id('sensor', name)
  adr, dim = int(m.sensor_adr[s]), int(m.sensor_dim[s])
  return slice(adr, adr + dim)


@functools.lru_cache(maxsize=None)
def _make_task(hopping: bool):
  m = _model()
  torso = m.name2id('body', 'torso')
  foot = m.name2id('body', 'foot')
  sl_subtree = _sensor_slice(m, 'torso_subtreelinvel')
  sl_toe = _sensor_slice(m, 'touch_toe')
  sl_heel = _sensor_slice(m, 'touch_heel')

  def init_episode(m_, d, key):
    qpos = base.randomize_limited_and_rotational_joints(m_, d.qpos, key)
    return d.replace(qpos=qpos)

  def get_observation(m_, d):
    obs = collections.OrderedDict()
    obs['position'] = d.qpos[1:]
    obs['velocity'] = d.qvel
    obs['touch'] = jnp.log1p(jnp.concatenate(
        [d.sensordata[sl_toe], d.sensordata[sl_heel]]))
    return obs

  def get_reward(m_, d):
    height = d.xipos[torso, 2] - d.xipos[foot, 2]
    standing = rewards.tolerance(height, (_STAND_HEIGHT, 2))
    if hopping:
      speed = d.sensordata[sl_subtree][0]
      hop = rewards.tolerance(speed, bounds=(_HOP_SPEED, float('inf')),
                              margin=_HOP_SPEED / 2, value_at_margin=0.5,
                              sigmoid='linear')
      return standing * hop
    small_control = jnp.mean(rewards.tolerance(
        d.ctrl, margin=1, value_at_margin=0, sigmoid='quadratic'))
    small_control = (small_control + 4) / 5
    return standing * small_control

  return control.TaskDef(
      name='hopper', model=m, init_episode=init_episode,
      get_observation=get_observation, get_reward=get_reward,
      control_timestep=_CONTROL_TIMESTEP)


@SUITE.add('benchmarking')
def stand(time_limit=_DEFAULT_TIME_LIMIT, random=None,
          environment_kwargs=None):
  return control.Environment(_make_task(False), time_limit=time_limit,
                             random=random, **(environment_kwargs or {}))


@SUITE.add('benchmarking')
def hop(time_limit=_DEFAULT_TIME_LIMIT, random=None,
        environment_kwargs=None):
  return control.Environment(_make_task(True), time_limit=time_limit,
                             random=random, **(environment_kwargs or {}))
