"""Swimmer domain with procedural n-link models
(reference: dm_control/suite/swimmer.py)."""

from __future__ import annotations

import collections
import functools
import xml.etree.ElementTree as ET

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import setconst
from dm_control_tpu.mjcf import compiler as mjcf_compiler
from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite import common
from dm_control_tpu.utils import containers
from dm_control_tpu.utils import rewards

_DEFAULT_TIME_LIMIT = 30
_CONTROL_TIMESTEP = .03
SUITE = containers.TaggedTasks()


@functools.lru_cache(maxsize=None)
def _model(n_bodies: int):
  """Procedurally extend the swimmer chain to n_bodies segments
  (semantics of reference suite/swimmer.py:88-139)."""
  if n_bodies < 3:
    raise ValueError('at least 3 bodies required')
  root = common.load_xml_root('swimmer.xml')
  head = root.find('./worldbody/body')
  actuator = ET.SubElement(root, 'actuator')
  sensor = ET.SubElement(root, 'sensor')
  parent = head
  for i in range(n_bodies - 1):
    child = ET.Element('body', dict(name=f'segment_{i}', pos='0 .1 0'))
    ET.SubElement(child, 'geom', {'class': 'visual', 'name': f'visual_{i}'})
    ET.SubElement(child, 'geom',
                  {'class': 'inertial', 'name': f'inertial_{i}'})
    ET.SubElement(child, 'site', dict(name=f'site_{i}'))
    limit = 360.0 / n_bodies
    ET.SubElement(child, 'joint', dict(
        name=f'joint_{i}', range=f'{-limit} {limit}'))
    actuator.append(ET.Element('motor', dict(
        name=f'motor_{i}', joint=f'joint_{i}')))
    sensor.append(ET.Element('velocimeter', dict(
        name=f'velocimeter_{i}', site=f'site_{i}')))
    sensor.append(ET.Element('gyro', dict(
        name=f'gyro_{i}', site=f'site_{i}')))
    parent.append(child)
    parent = child
  m = mjcf_compiler.MJCFCompiler(root).build()
  return setconst.set_const(m)


@functools.lru_cache(maxsize=None)
def _make_task(n_links: int):
  m = _model(n_links)
  g_target = m.name2id('geom', 'target')
  g_nose = m.name2id('geom', 'nose')
  head = m.name2id('body', 'head')
  target_size = float(m.geom_size[g_target, 0])
  # sensordata[12:] == per-joint velocimeter+gyro pairs (first 12 entries
  # are the head's sensors; reference suite/swimmer.py:156-160)
  nsens = m.nsensordata

  def init_episode(m_, d, key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    qpos = base.randomize_limited_and_rotational_joints(m_, d.qpos, k1)
    close_target = jax.random.uniform(k2) < 0.2
    target_box = jnp.where(close_target, 0.3, 2.0)
    xy = jax.random.uniform(k3, (2,), minval=-1.0, maxval=1.0) * target_box
    geom_pos = jnp.asarray(m_.geom_pos, d.qpos.dtype)
    geom_pos = geom_pos.at[g_target, 0].set(xy[0])
    geom_pos = geom_pos.at[g_target, 1].set(xy[1])
    mv = dict(d.model_var or {})
    mv['geom_pos'] = geom_pos
    return d.replace(qpos=qpos, model_var=mv)

  def _nose_to_target(d):
    vec = d.geom_xpos[g_target] - d.geom_xpos[g_nose]
    return (vec @ d.xmat[head])[:2]

  def get_observation(m_, d):
    obs = collections.OrderedDict()
    obs['joints'] = d.qpos[3:]
    obs['to_target'] = _nose_to_target(d)
    xvel_local = d.sensordata[12:].reshape(-1, 6)
    obs['body_velocities'] = xvel_local[:, jnp.array([0, 1, 5])].ravel()
    return obs

  def get_reward(m_, d):
    dist = jnp.linalg.norm(_nose_to_target(d))
    return rewards.tolerance(dist, bounds=(0, target_size),
                             margin=5 * target_size, sigmoid='long_tail')

  return control.TaskDef(
      name=f'swimmer{n_links}', model=m, init_episode=init_episode,
      get_observation=get_observation, get_reward=get_reward,
      control_timestep=_CONTROL_TIMESTEP)


@SUITE.add('benchmarking')
def swimmer6(time_limit=_DEFAULT_TIME_LIMIT, random=None,
             environment_kwargs=None):
  return control.Environment(_make_task(6), time_limit=time_limit,
                             random=random, **(environment_kwargs or {}))


@SUITE.add('benchmarking')
def swimmer15(time_limit=_DEFAULT_TIME_LIMIT, random=None,
              environment_kwargs=None):
  return control.Environment(_make_task(15), time_limit=time_limit,
                             random=random, **(environment_kwargs or {}))


def swimmer(n_links=3, time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
  return control.Environment(_make_task(n_links), time_limit=time_limit,
                             random=random, **(environment_kwargs or {}))
