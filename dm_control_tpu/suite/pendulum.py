"""Pendulum domain (reference: dm_control/suite/pendulum.py)."""

from __future__ import annotations

import collections
import functools

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import engine
from dm_control_tpu.rl import control
from dm_control_tpu.suite import common
from dm_control_tpu.utils import containers
from dm_control_tpu.utils import rewards

_DEFAULT_TIME_LIMIT = 20
_ANGLE_BOUND = 8
_COSINE_BOUND = np.cos(np.deg2rad(_ANGLE_BOUND))

SUITE = containers.TaggedTasks()


@functools.lru_cache(maxsize=1)
def _model():
  return engine.load_model(common.model_path('pendulum.xml'))


@functools.lru_cache(maxsize=None)
def _make_task():
  m = _model()
  pole = m.name2id('body', 'pole')
  hinge_q = int(m.jnt_qposadr[m.name2id('joint', 'hinge')])
  hinge_v = int(m.jnt_dofadr[m.name2id('joint', 'hinge')])

  def init_episode(m_, d, key):
    # pole at a uniform random angle (suite/pendulum.py:88-94)
    qpos = d.qpos.at[hinge_q].set(
        jax.random.uniform(key, minval=-jnp.pi, maxval=jnp.pi))
    return d.replace(qpos=qpos)

  def get_observation(m_, d):
    obs = collections.OrderedDict()
    obs['orientation'] = jnp.stack(
        [d.xmat[pole, 2, 2], d.xmat[pole, 0, 2]])
    obs['velocity'] = d.qvel[hinge_v:hinge_v + 1]
    return obs

  def get_reward(m_, d):
    return rewards.tolerance(d.xmat[pole, 2, 2], (_COSINE_BOUND, 1))

  return control.TaskDef(
      name='pendulum', model=m, init_episode=init_episode,
      get_observation=get_observation, get_reward=get_reward)


@SUITE.add('benchmarking')
def swingup(time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
  return control.Environment(_make_task(), time_limit=time_limit,
                             random=random, **(environment_kwargs or {}))
