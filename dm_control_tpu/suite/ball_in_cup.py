"""Ball-in-cup domain (reference: dm_control/suite/ball_in_cup.py)."""

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

_DEFAULT_TIME_LIMIT = 20
_CONTROL_TIMESTEP = .02
SUITE = containers.TaggedTasks()


@functools.lru_cache(maxsize=1)
def _model():
  return engine.load_model(common.model_path('ball_in_cup.xml'))


@functools.lru_cache(maxsize=None)
def _make_task():
  m = _model()
  ball = m.name2id('body', 'ball')
  s_target = m.name2id('site', 'target')
  g_ball = m.name2id('geom', 'ball')
  q_bx = int(m.jnt_qposadr[m.name2id('joint', 'ball_x')])
  q_bz = int(m.jnt_qposadr[m.name2id('joint', 'ball_z')])
  target_size = jnp.asarray(m.site_size[s_target][jnp.array([0, 2])])
  ball_size = float(m.geom_size[g_ball, 0])

  def init_episode(m_, d, key):
    # collision-free random ball position (suite/ball_in_cup.py:79-87)
    def sample(d_, k):
      k1, k2 = jax.random.split(k)
      qpos = d_.qpos.at[q_bx].set(
          jax.random.uniform(k1, minval=-.2, maxval=.2))
      qpos = qpos.at[q_bz].set(
          jax.random.uniform(k2, minval=.2, maxval=.5))
      return d_.replace(qpos=qpos)
    return base.collision_free_init(sample, m_, d, key)

  def get_observation(m_, d):
    obs = collections.OrderedDict()
    obs['position'] = d.qpos
    obs['velocity'] = d.qvel
    return obs

  def get_reward(m_, d):
    target = d.site_xpos[s_target][jnp.array([0, 2])]
    ballp = d.xpos[ball][jnp.array([0, 2])]
    in_target = jnp.all(
        jnp.abs(target - ballp) < target_size - ball_size)
    return in_target.astype(d.qpos.dtype)

  return control.TaskDef(
      name='ball_in_cup', model=m, init_episode=init_episode,
      get_observation=get_observation, get_reward=get_reward,
      control_timestep=_CONTROL_TIMESTEP, expensive_init=True)


@SUITE.add('benchmarking', 'easy')
def catch(time_limit=_DEFAULT_TIME_LIMIT, random=None,
          environment_kwargs=None):
  return control.Environment(_make_task(), time_limit=time_limit,
                             random=random, **(environment_kwargs or {}))
