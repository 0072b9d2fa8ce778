"""Fish domain (reference: dm_control/suite/fish.py)."""

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

_DEFAULT_TIME_LIMIT = 40
_CONTROL_TIMESTEP = .04
_JOINTS = ['tail1', 'tail_twist', 'tail2',
           'finright_roll', 'finright_pitch',
           'finleft_roll', 'finleft_pitch']
SUITE = containers.TaggedTasks()


@functools.lru_cache(maxsize=1)
def _model():
  return engine.load_model(common.model_path('fish.xml'))


@functools.lru_cache(maxsize=None)
def _make_task(swim: bool):
  m = _model()
  torso = m.name2id('body', 'torso')
  root_q = int(m.jnt_qposadr[m.name2id('joint', 'root')])
  joint_qadr = jnp.array(
      [int(m.jnt_qposadr[m.name2id('joint', j)]) for j in _JOINTS])
  g_target = m.name2id('geom', 'target')
  g_mouth = m.name2id('geom', 'mouth')
  radii = float(m.geom_size[g_target, 0] + m.geom_size[g_mouth, 0])

  def init_episode(m_, d, key):
    k1, k2, k3 = jax.random.split(key, 3)
    quat = jax.random.normal(k1, (4,))
    quat = quat / jnp.linalg.norm(quat)
    qpos = jax.lax.dynamic_update_slice(d.qpos, quat, (root_q + 3,))
    vals = jax.random.uniform(k2, (len(_JOINTS),), minval=-.2, maxval=.2)
    qpos = qpos.at[joint_qadr].set(vals)
    d = d.replace(qpos=qpos)
    if swim:
      xyz = jnp.stack([
          jax.random.uniform(k3, minval=-.4, maxval=.4),
          jax.random.uniform(jax.random.fold_in(k3, 1),
                             minval=-.4, maxval=.4),
          jax.random.uniform(jax.random.fold_in(k3, 2),
                             minval=.1, maxval=.3)])
      geom_pos = jnp.asarray(m_.geom_pos, d.qpos.dtype)
      geom_pos = geom_pos.at[g_target].set(xyz)
      mv = dict(d.model_var or {})
      mv['geom_pos'] = geom_pos
      d = d.replace(model_var=mv)
    return d

  def _mouth_to_target(d):
    vec = d.geom_xpos[g_target] - d.geom_xpos[g_mouth]
    return vec @ d.geom_xmat[g_mouth]

  def get_observation(m_, d):
    obs = collections.OrderedDict()
    obs['joint_angles'] = d.qpos[joint_qadr]
    obs['upright'] = d.xmat[torso, 2, 2]
    if swim:
      obs['target'] = _mouth_to_target(d)
    obs['velocity'] = d.qvel
    return obs

  def get_reward(m_, d):
    upright = d.xmat[torso, 2, 2]
    if not swim:
      return rewards.tolerance(upright, bounds=(1, 1), margin=1)
    in_target = rewards.tolerance(
        jnp.linalg.norm(_mouth_to_target(d)), bounds=(0, radii),
        margin=2 * radii)
    is_upright = 0.5 * (upright + 1)
    return (7 * in_target + is_upright) / 8

  return control.TaskDef(
      name='fish', model=m, init_episode=init_episode,
      get_observation=get_observation, get_reward=get_reward,
      control_timestep=_CONTROL_TIMESTEP)


@SUITE.add('benchmarking')
def upright(time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
  return control.Environment(_make_task(False), time_limit=time_limit,
                             random=random, **(environment_kwargs or {}))


@SUITE.add('benchmarking')
def swim(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
  return control.Environment(_make_task(True), time_limit=time_limit,
                             random=random, **(environment_kwargs or {}))
