"""Planar walker domain (reference: dm_control/suite/walker.py)."""

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

_DEFAULT_TIME_LIMIT = 25
_CONTROL_TIMESTEP = .025
_STAND_HEIGHT = 1.2
_WALK_SPEED = 1
_RUN_SPEED = 8
SUITE = containers.TaggedTasks()


@functools.lru_cache(maxsize=1)
def _model():
  return engine.load_model(common.model_path('walker.xml'))


@functools.lru_cache(maxsize=None)
def _make_task(move_speed: float):
  m = _model()
  torso = m.name2id('body', 'torso')
  s = m.name2id('sensor', 'torso_subtreelinvel')
  subtree_adr = int(m.sensor_adr[s])
  bodies = list(range(1, m.nbody))

  def init_episode(m_, d, key):
    qpos = base.randomize_limited_and_rotational_joints(m_, d.qpos, key)
    return d.replace(qpos=qpos)

  def get_observation(m_, d):
    obs = collections.OrderedDict()
    # planar orientations: xmat [xx, xz] per non-world body
    rows = [jnp.stack([d.xmat[b, 0, 0], d.xmat[b, 0, 2]]) for b in bodies]
    obs['orientations'] = jnp.concatenate(rows)
    obs['height'] = d.xpos[torso, 2]
    obs['velocity'] = d.qvel
    return obs

  def get_reward(m_, d):
    standing = rewards.tolerance(
        d.xpos[torso, 2], bounds=(_STAND_HEIGHT, float('inf')),
        margin=_STAND_HEIGHT / 2)
    upright = (1 + d.xmat[torso, 2, 2]) / 2
    stand_reward = (3 * standing + upright) / 4
    if move_speed == 0:
      return stand_reward
    speed = d.sensordata[subtree_adr]
    move_reward = rewards.tolerance(
        speed, bounds=(move_speed, float('inf')), margin=move_speed / 2,
        value_at_margin=0.5, sigmoid='linear')
    return stand_reward * (5 * move_reward + 1) / 6

  return control.TaskDef(
      name='walker', model=m, init_episode=init_episode,
      get_observation=get_observation, get_reward=get_reward,
      control_timestep=_CONTROL_TIMESTEP)


@SUITE.add('benchmarking')
def stand(time_limit=_DEFAULT_TIME_LIMIT, random=None,
          environment_kwargs=None):
  return control.Environment(_make_task(0), time_limit=time_limit,
                             random=random, **(environment_kwargs or {}))


@SUITE.add('benchmarking')
def walk(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
  return control.Environment(_make_task(_WALK_SPEED), time_limit=time_limit,
                             random=random, **(environment_kwargs or {}))


@SUITE.add('benchmarking')
def run(time_limit=_DEFAULT_TIME_LIMIT, random=None, environment_kwargs=None):
  return control.Environment(_make_task(_RUN_SPEED), time_limit=time_limit,
                             random=random, **(environment_kwargs or {}))
