"""Cartpole domain, incl. procedural multi-pole models
(reference: dm_control/suite/cartpole.py)."""

from __future__ import annotations

import collections
import functools
import xml.etree.ElementTree as ET

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import engine
from dm_control_tpu._src import setconst
from dm_control_tpu.mjcf import compiler as mjcf_compiler
from dm_control_tpu.rl import control
from dm_control_tpu.suite import common
from dm_control_tpu.utils import containers
from dm_control_tpu.utils import rewards

_DEFAULT_TIME_LIMIT = 10
SUITE = containers.TaggedTasks()


@functools.lru_cache(maxsize=None)
def _model(n_poles: int = 1):
  root = common.load_xml_root('cartpole.xml')
  if n_poles > 1:
    # chain additional poles under pole_1 (semantics of reference
    # suite/cartpole.py:110-132, re-generated with ElementTree)
    parent = root.find('./worldbody/body/body')
    for k in range(2, n_poles + 1):
      child = ET.Element('body', dict(name=f'pole_{k}', pos='0 0 1',
                                      childclass='pole'))
      ET.SubElement(child, 'joint', dict(name=f'hinge_{k}'))
      ET.SubElement(child, 'geom', dict(name=f'pole_{k}'))
      parent.append(child)
      parent = child
    floor = root.find('./worldbody/geom')
    floor.set('pos', f'0 0 {1 - n_poles - .05}')
  m = mjcf_compiler.MJCFCompiler(root).build()
  return setconst.set_const(m)


@functools.lru_cache(maxsize=None)
def _make_task(swing_up: bool, sparse: bool, n_poles: int = 1):
  m = _model(n_poles)
  slider_q = int(m.jnt_qposadr[m.name2id('joint', 'slider')])
  hinge1_q = int(m.jnt_qposadr[m.name2id('joint', 'hinge_1')])
  nv, nq = m.nv, m.nq
  pole_bodies = list(range(2, m.nbody))  # cart is body 1; poles follow

  def init_episode(m_, d, key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if swing_up:
      # (suite/cartpole.py:192-195)
      qpos = d.qpos.at[slider_q].set(0.01 * jax.random.normal(k1))
      qpos = qpos.at[hinge1_q].set(
          jnp.pi + 0.01 * jax.random.normal(k2))
      qpos = qpos.at[2:].set(0.1 * jax.random.normal(k3, (nq - 2,)))
    else:
      qpos = d.qpos.at[slider_q].set(
          jax.random.uniform(k1, minval=-0.1, maxval=0.1))
      qpos = qpos.at[1:].set(jax.random.uniform(
          k2, (nq - 1,), minval=-0.034, maxval=0.034))
    qvel = 0.01 * jax.random.normal(k4, (nv,))
    return d.replace(qpos=qpos, qvel=qvel)

  def get_observation(m_, d):
    obs = collections.OrderedDict()
    parts = [d.qpos[slider_q:slider_q + 1]]
    for b in pole_bodies:
      parts.append(jnp.stack([d.xmat[b, 2, 2], d.xmat[b, 0, 2]]))
    obs['position'] = jnp.concatenate(parts)
    obs['velocity'] = d.qvel
    return obs

  def get_reward(m_, d):
    cart_position = d.qpos[slider_q]
    pole_angle_cosine = jnp.stack([d.xmat[b, 2, 2] for b in pole_bodies])
    if sparse:
      cart_in_bounds = rewards.tolerance(cart_position, (-0.25, 0.25))
      angle_in_bounds = jnp.prod(
          rewards.tolerance(pole_angle_cosine, (0.995, 1)))
      return cart_in_bounds * angle_in_bounds
    upright = (pole_angle_cosine + 1) / 2
    centered = rewards.tolerance(cart_position, margin=2)
    centered = (1 + centered) / 2
    small_control = rewards.tolerance(
        d.ctrl, margin=1, value_at_margin=0, sigmoid='quadratic')[0]
    small_control = (4 + small_control) / 5
    angular_vel = d.qvel[1:]
    small_velocity = jnp.min(rewards.tolerance(angular_vel, margin=5))
    small_velocity = (1 + small_velocity) / 2
    return jnp.mean(upright) * small_control * small_velocity * centered

  name = f'cartpole_{n_poles}'
  return control.TaskDef(
      name=name, model=m, init_episode=init_episode,
      get_observation=get_observation, get_reward=get_reward)


def _env(task, time_limit, random, environment_kwargs):
  return control.Environment(task, time_limit=time_limit, random=random,
                             **(environment_kwargs or {}))


@SUITE.add('benchmarking')
def balance(time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
  return _env(_make_task(False, False), time_limit, random,
              environment_kwargs)


@SUITE.add('benchmarking')
def balance_sparse(time_limit=_DEFAULT_TIME_LIMIT, random=None,
                   environment_kwargs=None):
  return _env(_make_task(False, True), time_limit, random,
              environment_kwargs)


@SUITE.add('benchmarking')
def swingup(time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
  return _env(_make_task(True, False), time_limit, random,
              environment_kwargs)


@SUITE.add('benchmarking')
def swingup_sparse(time_limit=_DEFAULT_TIME_LIMIT, random=None,
                   environment_kwargs=None):
  return _env(_make_task(True, True), time_limit, random,
              environment_kwargs)


@SUITE.add()
def two_poles(time_limit=_DEFAULT_TIME_LIMIT, random=None,
              environment_kwargs=None):
  return _env(_make_task(True, False, n_poles=2), time_limit, random,
              environment_kwargs)


@SUITE.add()
def three_poles(time_limit=_DEFAULT_TIME_LIMIT, random=None,
                environment_kwargs=None):
  return _env(_make_task(True, False, n_poles=3), time_limit, random,
              environment_kwargs)
