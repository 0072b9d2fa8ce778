"""Reacher domain (reference: dm_control/suite/reacher.py)."""

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

_DEFAULT_TIME_LIMIT = 20
_BIG_TARGET = .05
_SMALL_TARGET = .015
SUITE = containers.TaggedTasks()


@functools.lru_cache(maxsize=None)
def _model(target_size: float):
  m = engine.load_model(common.model_path('reacher.xml'))
  # target size is fixed per task variant -> bake into the static model
  # (reference mutates it at episode init, suite/reacher.py:93)
  m.geom_size = m.geom_size.copy()
  m.geom_size[m.name2id('geom', 'target'), 0] = target_size
  return m


@functools.lru_cache(maxsize=None)
def _make_task(target_size: float):
  m = _model(target_size)
  g_target = m.name2id('geom', 'target')
  g_finger = m.name2id('geom', 'finger')
  radii = float(m.geom_size[g_target, 0] + m.geom_size[g_finger, 0])

  def init_episode(m_, d, key):
    k1, k2, k3 = jax.random.split(key, 3)
    qpos = base.randomize_limited_and_rotational_joints(m_, d.qpos, k1)
    # randomize target position on an annulus (suite/reacher.py:96-99)
    angle = jax.random.uniform(k2, minval=0, maxval=2 * jnp.pi)
    radius = jax.random.uniform(k3, minval=.05, maxval=.20)
    geom_pos = jnp.asarray(m_.geom_pos, d.qpos.dtype)
    geom_pos = geom_pos.at[g_target, 0].set(radius * jnp.sin(angle))
    geom_pos = geom_pos.at[g_target, 1].set(radius * jnp.cos(angle))
    mv = dict(d.model_var or {})
    mv['geom_pos'] = geom_pos
    return d.replace(qpos=qpos, model_var=mv)

  def _finger_to_target(d):
    return (d.geom_xpos[g_target, :2] - d.geom_xpos[g_finger, :2])

  def get_observation(m_, d):
    obs = collections.OrderedDict()
    obs['position'] = d.qpos
    obs['to_target'] = _finger_to_target(d)
    obs['velocity'] = d.qvel
    return obs

  def get_reward(m_, d):
    dist = jnp.linalg.norm(_finger_to_target(d))
    return rewards.tolerance(dist, (0, radii))

  return control.TaskDef(
      name='reacher', model=m, init_episode=init_episode,
      get_observation=get_observation, get_reward=get_reward)


@SUITE.add('benchmarking', 'easy')
def easy(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
  return control.Environment(_make_task(_BIG_TARGET), time_limit=time_limit,
                             random=random, **(environment_kwargs or {}))


@SUITE.add('benchmarking')
def hard(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
  return control.Environment(
      _make_task(_SMALL_TARGET), time_limit=time_limit, random=random,
      **(environment_kwargs or {}))
