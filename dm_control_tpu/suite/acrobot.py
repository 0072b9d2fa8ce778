"""Acrobot domain (reference: dm_control/suite/acrobot.py)."""

from __future__ import annotations

import collections
import functools

import jax
import jax.numpy as jnp

from dm_control_tpu._src import engine
from dm_control_tpu.rl import control
from dm_control_tpu.suite import common
from dm_control_tpu.utils import containers
from dm_control_tpu.utils import rewards

_DEFAULT_TIME_LIMIT = 10
SUITE = containers.TaggedTasks()


@functools.lru_cache(maxsize=1)
def _model():
  return engine.load_model(common.model_path('acrobot.xml'))


@functools.lru_cache(maxsize=None)
def _make_task(sparse: bool):
  m = _model()
  upper = m.name2id('body', 'upper_arm')
  lower = m.name2id('body', 'lower_arm')
  s_target = m.name2id('site', 'target')
  s_tip = m.name2id('site', 'tip')
  q_shoulder = int(m.jnt_qposadr[m.name2id('joint', 'shoulder')])
  q_elbow = int(m.jnt_qposadr[m.name2id('joint', 'elbow')])
  target_radius = float(m.site_size[s_target, 0])

  def init_episode(m_, d, key):
    k1, k2 = jax.random.split(key)
    qpos = d.qpos.at[q_shoulder].set(
        jax.random.uniform(k1, minval=-jnp.pi, maxval=jnp.pi))
    qpos = qpos.at[q_elbow].set(
        jax.random.uniform(k2, minval=-jnp.pi, maxval=jnp.pi))
    return d.replace(qpos=qpos)

  def get_observation(m_, d):
    obs = collections.OrderedDict()
    horizontal = jnp.stack([d.xmat[upper, 0, 2], d.xmat[lower, 0, 2]])
    vertical = jnp.stack([d.xmat[upper, 2, 2], d.xmat[lower, 2, 2]])
    obs['orientations'] = jnp.concatenate([horizontal, vertical])
    obs['velocity'] = d.qvel
    return obs

  def get_reward(m_, d):
    to_target = jnp.linalg.norm(d.site_xpos[s_target] - d.site_xpos[s_tip])
    return rewards.tolerance(to_target, bounds=(0, target_radius),
                             margin=0 if sparse else 1)

  return control.TaskDef(
      name='acrobot', model=m, init_episode=init_episode,
      get_observation=get_observation, get_reward=get_reward)


@SUITE.add('benchmarking')
def swingup(time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
  return control.Environment(_make_task(False), time_limit=time_limit,
                             random=random, **(environment_kwargs or {}))


@SUITE.add('benchmarking')
def swingup_sparse(time_limit=_DEFAULT_TIME_LIMIT, random=None,
                   environment_kwargs=None):
  return control.Environment(_make_task(True), time_limit=time_limit,
                             random=random, **(environment_kwargs or {}))
