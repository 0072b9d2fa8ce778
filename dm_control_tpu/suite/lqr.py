"""LQR domain: procedural mass-spring chains with analytic optimal policy
(reference: dm_control/suite/lqr.py + lqr_solver.py)."""

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
from dm_control_tpu.suite import common
from dm_control_tpu.utils import containers

_DEFAULT_TIME_LIMIT = float('inf')  # reference suite/lqr.py:37
_CONTROL_COST_COEF = 0.1
_TERMINAL_TOL = 1e-6
SUITE = containers.TaggedTasks()


def _make_model_xml(n_bodies, n_actuators, rng,
                    stiffness_range=(15, 25), damping_range=(0, 0)):
  """Procedural chain of slide-joint bodies (reference suite/lqr.py:145-207)."""
  root = common.load_xml_root('lqr.xml')
  parent = root.find('./worldbody')
  actuator = ET.SubElement(root, 'actuator')
  tendon = ET.SubElement(root, 'tendon')
  for b in range(n_bodies):
    body = ET.Element('body', dict(name=f'body_{b}', pos='.25 0 0'))
    joint = ET.SubElement(body, 'joint', dict(name=f'joint_{b}'))
    body.append(ET.Element('geom', dict(name=f'geom_{b}')))
    joint.set('stiffness', str(rng.uniform(*stiffness_range)))
    joint.set('damping', str(rng.uniform(*damping_range)))
    body.append(ET.Element('site', dict(name=f'site_{b}')))
    if b == 0:
      body.set('pos', '.25 0 .1')
    if b < n_actuators:
      actuator.append(ET.Element('motor', dict(
          name=f'motor_{b}', joint=f'joint_{b}')))
    if b < n_bodies - 1:
      spatial = ET.SubElement(tendon, 'spatial', dict(name=f'tendon_{b}'))
      spatial.append(ET.Element('site', dict(site=f'site_{b}')))
      spatial.append(ET.Element('site', dict(site=f'site_{b + 1}')))
    parent.append(body)
    parent = body
  return root


@functools.lru_cache(maxsize=None)
def _model(n_bodies: int, n_actuators: int, seed: int):
  rng = np.random.RandomState(seed)
  root = _make_model_xml(n_bodies, n_actuators, rng)
  m = mjcf_compiler.MJCFCompiler(root).build()
  return setconst.set_const(m)


@functools.lru_cache(maxsize=None)
def _make_task(n_bodies: int, n_actuators: int,
               control_cost_coef: float, seed: int):
  m = _model(n_bodies, n_actuators, seed)
  nq = m.nq

  def init_episode(m_, d, key):
    unit = jax.random.normal(key, (nq,))
    qpos = jnp.sqrt(2.0) * unit / jnp.linalg.norm(unit)
    return d.replace(qpos=qpos)

  def get_observation(m_, d):
    obs = collections.OrderedDict()
    obs['position'] = d.qpos
    obs['velocity'] = d.qvel
    return obs

  def get_reward(m_, d):
    state_cost = 0.5 * jnp.dot(d.qpos, d.qpos)
    control_cost = 0.5 * jnp.dot(d.ctrl, d.ctrl)
    return 1.0 - (state_cost + control_cost * control_cost_coef)

  def get_termination(m_, d):
    norm = jnp.sqrt(jnp.dot(d.qpos, d.qpos) + jnp.dot(d.qvel, d.qvel))
    return norm < _TERMINAL_TOL

  return control.TaskDef(
      name=f'lqr_{n_bodies}_{n_actuators}', model=m,
      init_episode=init_episode, get_observation=get_observation,
      get_reward=get_reward, get_termination=get_termination)


@SUITE.add()
def lqr_2_1(time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
  seed = 0 if random is None else int(random)
  return control.Environment(
      _make_task(2, 1, _CONTROL_COST_COEF, seed), time_limit=time_limit,
      random=random, **(environment_kwargs or {}))


@SUITE.add()
def lqr_6_2(time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
  seed = 0 if random is None else int(random)
  return control.Environment(
      _make_task(6, 2, _CONTROL_COST_COEF, seed), time_limit=time_limit,
      random=random, **(environment_kwargs or {}))
