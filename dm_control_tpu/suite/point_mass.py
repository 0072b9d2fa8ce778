"""Point-mass domain (reference: dm_control/suite/point_mass.py)."""

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
SUITE = containers.TaggedTasks()


@functools.lru_cache(maxsize=1)
def _model():
  return engine.load_model(common.model_path('point_mass.xml'))


@functools.lru_cache(maxsize=None)
def _make_task(randomize_gains: bool):
  m = _model()
  g_target = m.name2id('geom', 'target')
  g_mass = m.name2id('geom', 'pointmass')
  target_size = float(m.geom_size[g_target, 0])

  def init_episode(m_, d, key):
    k1, k2, k3 = jax.random.split(key, 3)
    qpos = base.randomize_limited_and_rotational_joints(m_, d.qpos, k1)
    d = d.replace(qpos=qpos)
    if randomize_gains:
      # random (non-parallel) actuation directions via tendon coefficients
      # (suite/point_mass.py:100-112); the parallel-rejection loop becomes
      # a resample-until mask over a fixed candidate set.
      def sample_dirs(k):
        ka, kb = jax.random.split(k)
        d1 = jax.random.normal(ka, (2,))
        d1 = d1 / jnp.linalg.norm(d1)
        # draw several candidates for dir2; pick first not-too-parallel
        kbs = jax.random.split(kb, 10)
        d2s = jax.vmap(lambda kk: jax.random.normal(kk, (2,)))(kbs)
        d2s = d2s / jnp.linalg.norm(d2s, axis=-1, keepdims=True)
        ok = jnp.abs(d2s @ d1) <= 0.9
        idx = jnp.argmax(ok)
        return d1, d2s[idx]
      d1, d2 = sample_dirs(k2)
      wrap_prm = jnp.concatenate([d1, d2])
      mv = dict(d.model_var or {})
      mv['wrap_prm'] = wrap_prm
      d = d.replace(model_var=mv)
    return d

  def get_observation(m_, d):
    obs = collections.OrderedDict()
    obs['position'] = d.qpos
    obs['velocity'] = d.qvel
    return obs

  def get_reward(m_, d):
    dist = jnp.linalg.norm(d.geom_xpos[g_target] - d.geom_xpos[g_mass])
    near_target = rewards.tolerance(
        dist, bounds=(0, target_size), margin=target_size)
    control_reward = jnp.mean(rewards.tolerance(
        d.ctrl, margin=1, value_at_margin=0, sigmoid='quadratic'))
    small_control = (control_reward + 4) / 5
    return near_target * small_control

  return control.TaskDef(
      name='point_mass', model=m, init_episode=init_episode,
      get_observation=get_observation, get_reward=get_reward)


@SUITE.add('benchmarking', 'easy')
def easy(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
  return control.Environment(_make_task(False), time_limit=time_limit,
                             random=random, **(environment_kwargs or {}))


@SUITE.add()
def hard(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
  return control.Environment(_make_task(True), time_limit=time_limit,
                             random=random, **(environment_kwargs or {}))
