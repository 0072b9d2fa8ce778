"""Cheetah domain (reference: dm_control/suite/cheetah.py)."""

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
from dm_control_tpu.utils import rewards

_DEFAULT_TIME_LIMIT = 10
_RUN_SPEED = 10
SUITE = containers.TaggedTasks()


@functools.lru_cache(maxsize=1)
def _model():
  return engine.load_model(common.model_path('cheetah.xml'))


@functools.lru_cache(maxsize=None)
def _make_task():
  m = _model()
  s = m.name2id('sensor', 'torso_subtreelinvel')
  subtree_adr = int(m.sensor_adr[s])
  limited = m.jnt_limited.astype(bool)
  lims = m.jnt_range[limited]
  lim_qadr = m.jnt_qposadr[limited]

  def init_episode(m_, d, key):
    # uniform within limits for limited joints, then settle 200 steps with
    # zero control and reset time (suite/cheetah.py:68-81)
    vals = jax.random.uniform(
        key, (len(lim_qadr),),
        minval=jnp.asarray(lims[:, 0], d.qpos.dtype),
        maxval=jnp.asarray(lims[:, 1], d.qpos.dtype))
    qpos = d.qpos.at[jnp.asarray(lim_qadr)].set(vals)
    d = d.replace(qpos=qpos)
    return base.settle(m_, d, 200)

  def get_observation(m_, d):
    obs = collections.OrderedDict()
    obs['position'] = d.qpos[1:]
    obs['velocity'] = d.qvel
    return obs

  def get_reward(m_, d):
    speed = d.sensordata[subtree_adr]
    return rewards.tolerance(speed, bounds=(_RUN_SPEED, float('inf')),
                             margin=_RUN_SPEED, value_at_margin=0,
                             sigmoid='linear')

  return control.TaskDef(
      name='cheetah', model=m, init_episode=init_episode,
      get_observation=get_observation, get_reward=get_reward,
      expensive_init=True)


@SUITE.add('benchmarking')
def run(time_limit=_DEFAULT_TIME_LIMIT, random=None, environment_kwargs=None):
  return control.Environment(_make_task(), time_limit=time_limit,
                             random=random, **(environment_kwargs or {}))
