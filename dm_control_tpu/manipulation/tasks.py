"""Jaco-arm manipulation tasks (reference: manipulation/reach.py,
lift.py, place.py, bricks.py).

Each task composes: a standard arena (table plane), the Jaco j2s7s300
arm (the vendored model as a composer entity), primitive props, and a
target site.  Rewards follow the reference shapes (tolerance on
TCP/prop/target distances and lift heights); observations are the
feature sets (arm joints pos/vel, TCP pose, prop pose, target)."""

from __future__ import annotations

import collections
import functools
import xml.etree.ElementTree as ET

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.composer import variation as var
from dm_control_tpu.composer.entity import Entity
from dm_control_tpu.composer.environment import (BatchedEnvironment,
                                                 Environment)
from dm_control_tpu.composer.observation import ObservableSpec
from dm_control_tpu.composer.task import ComposerTask
from dm_control_tpu.suite import common
from dm_control_tpu.utils import rewards

_CONTROL_TIMESTEP = 0.04   # reference manipulation/shared/constants.py:18
_TIME_LIMIT = 10.0

REGISTRY = {}
TAGS = {}


def _register(name, *tags):
  def deco(fn):
    REGISTRY[name] = fn
    TAGS[name] = tags
    return fn
  return deco


def _arena_xml():
  root = ET.Element('mujoco')
  # the jaco asset's own integrator settings (its <option> does not
  # survive the composer merge): RK4 @ 1 ms, jaco_j2s7s300_position.xml:4
  ET.SubElement(root, 'option', dict(
      timestep='0.001', integrator='RK4'))
  wb = ET.SubElement(root, 'worldbody')
  ET.SubElement(wb, 'geom', dict(
      name='table', type='plane', size='1.2 1.2 0.1',
      friction='1 0.005 0.0001'))
  ET.SubElement(wb, 'site', dict(
      name='target', type='sphere', size='0.04', pos='0.2 0.2 0.4',
      rgba='1 0 0 0.4'))
  return Entity(mjcf_root=root, name='arena')


def _brick_xml(size=(0.04, 0.02, 0.02), name='brick'):
  root = ET.Element('mujoco')
  wb = ET.SubElement(root, 'worldbody')
  body = ET.SubElement(wb, 'body', dict(name=name))
  ET.SubElement(body, 'freejoint', dict(name=f'{name}_root'))
  ET.SubElement(body, 'geom', dict(
      name=f'{name}_geom', type='box',
      size=f'{size[0]} {size[1]} {size[2]}', density='600',
      friction='1.5 0.01 0.001'))
  return Entity(mjcf_root=root, name=name)


@functools.lru_cache(maxsize=None)
def _jaco_entity():
  """The vendored Jaco arm as an attachable entity."""
  import os
  from dm_control_tpu.mjcf.compiler import _load_xml
  path = common.model_path('jaco_j2s7s300_position.xml')
  root = _load_xml(path)
  # absolutize mesh refs (the fragment's meshdir does not survive the
  # composer merge) and drop the reacher model's own target
  meshdir = ''
  for comp in root.findall('compiler'):
    meshdir = comp.attrib.pop('meshdir', meshdir)
  base = os.path.dirname(path)
  for asset in root.findall('asset'):
    for el in asset:
      if 'file' in el.attrib:
        el.set('file', os.path.join(base, meshdir, el.attrib['file']))
  wb = root.find('worldbody')
  for el in list(wb):
    if el.attrib.get('name') in ('target', 'reach_site'):
      wb.remove(el)
  return Entity(mjcf_root=root, name='jaco')


def _build(props=()):
  task = ComposerTask(arena=_arena_xml(), control_timestep=_CONTROL_TIMESTEP)
  task.attach(_jaco_entity())
  for p in props:
    task.attach(p)
  m = task.compile()
  return task, m


class _Common:
  """Index constants + shared observables for one compiled model."""

  def __init__(self, task, m, prop_names=()):
    self.m = m
    self.target_s = m.names['site']['target']
    # TCP: the last finger-bearing link's tool frame; use the deepest
    # jaco link body as the tool reference
    link_names = [n for n in m.names['body'] if 'jaco' in n]
    self.tool_b = m.names['body'][sorted(link_names)[-1]]
    self.arm_q = np.array([int(m.jnt_qposadr[j]) for j in range(m.njnt)
                           if (m.id2name('joint', j) or '').startswith(
                               'jaco/')])
    self.arm_d = np.array([int(m.jnt_dofadr[j]) for j in range(m.njnt)
                           if (m.id2name('joint', j) or '').startswith(
                               'jaco/')])
    self.prop_q = {p: int(m.jnt_qposadr[m.name2id('joint', f'{p}/{p}_root')])
                   for p in prop_names}

    task.add_observable('arm_pos', ObservableSpec(
        fn=lambda m_, d: d.qpos[self.arm_q]))
    task.add_observable('arm_vel', ObservableSpec(
        fn=lambda m_, d: d.qvel[self.arm_d]))
    task.add_observable('tcp_pos', ObservableSpec(
        fn=lambda m_, d: d.xpos[self.tool_b]))
    task.add_observable('target', ObservableSpec(
        fn=lambda m_, d: self.target_pos(m_, d)))
    for p in prop_names:
      adr = self.prop_q[p]
      task.add_observable(f'{p}_pose', ObservableSpec(
          fn=lambda m_, d, a=adr: d.qpos[a:a + 7]))

  def target_pos(self, m_, d):
    return (d.model_var or {}).get(
        'site_pos', jnp.asarray(m_.site_pos, d.qpos.dtype))[self.target_s]

  def randomize_target(self, m_, d, key, lo=(-0.4, -0.4, 0.1),
                       hi=(0.4, 0.4, 0.5)):
    dtype = d.qpos.dtype
    t = jax.random.uniform(key, (3,), dtype, jnp.asarray(lo, dtype),
                           jnp.asarray(hi, dtype))
    site_pos = jnp.asarray(m_.site_pos, dtype).at[self.target_s].set(t)
    mv = dict(d.model_var or {})
    mv['site_pos'] = site_pos
    return d.replace(model_var=mv)

  def place_prop(self, m_, d, key, name, z=0.03, r=0.45):
    dtype = d.qpos.dtype
    adr = self.prop_q[name]
    xy = jax.random.uniform(key, (2,), dtype, -r, r)
    qpos = d.qpos.at[adr:adr + 2].set(xy).at[adr + 2].set(z)
    return d.replace(qpos=qpos)


def _env(task, batch_size, random):
  if batch_size:
    return BatchedEnvironment(task, batch_size, time_limit=_TIME_LIMIT)
  return Environment(task, time_limit=_TIME_LIMIT, random=random)


@_register('reach_site_features', 'features', 'easy')
def reach_site(random=None, batch_size=None):
  task, m = _build()
  c = _Common(task, m)

  def init(m_, d, key):
    return c.randomize_target(m_, d, key)

  task.add_init_hook(init)
  task.set_reward(lambda m_, d: rewards.tolerance(
      jnp.linalg.norm(d.xpos[c.tool_b] - c.target_pos(m_, d)),
      (0, 0.05), margin=0.8, sigmoid='long_tail'))
  return _env(task, batch_size, random)


@_register('reach_brick_features', 'features', 'easy')
def reach_brick(random=None, batch_size=None):
  task, m = _build(props=(_brick_xml(name='brick'),))
  c = _Common(task, m, prop_names=('brick',))

  def init(m_, d, key):
    return c.place_prop(m_, d, key, 'brick')

  task.add_init_hook(init)
  adr = c.prop_q['brick']
  task.set_reward(lambda m_, d: rewards.tolerance(
      jnp.linalg.norm(d.xpos[c.tool_b] - d.qpos[adr:adr + 3]),
      (0, 0.06), margin=0.8, sigmoid='long_tail'))
  return _env(task, batch_size, random)


@_register('lift_brick_features', 'features')
def lift_brick(random=None, batch_size=None, target_height=0.25):
  task, m = _build(props=(_brick_xml(name='brick'),))
  c = _Common(task, m, prop_names=('brick',))

  def init(m_, d, key):
    return c.place_prop(m_, d, key, 'brick', r=0.3)

  task.add_init_hook(init)
  adr = c.prop_q['brick']

  def reward(m_, d):
    grasp = rewards.tolerance(
        jnp.linalg.norm(d.xpos[c.tool_b] - d.qpos[adr:adr + 3]),
        (0, 0.06), margin=0.5, sigmoid='long_tail')
    lift = rewards.tolerance(
        d.qpos[adr + 2], (target_height, jnp.inf),
        margin=target_height, sigmoid='linear', value_at_margin=0)
    return (grasp + 2 * lift) / 3

  task.set_reward(reward)
  return _env(task, batch_size, random)


@_register('place_brick_features', 'features')
def place_brick(random=None, batch_size=None):
  task, m = _build(props=(_brick_xml(name='brick'),))
  c = _Common(task, m, prop_names=('brick',))

  def init(m_, d, key):
    k1, k2 = jax.random.split(key)
    d = c.place_prop(m_, d, k1, 'brick', r=0.3)
    return c.randomize_target(m_, d, k2, lo=(-0.4, -0.4, 0.05),
                              hi=(0.4, 0.4, 0.25))

  task.add_init_hook(init)
  adr = c.prop_q['brick']
  task.set_reward(lambda m_, d: rewards.tolerance(
      jnp.linalg.norm(d.qpos[adr:adr + 3] - c.target_pos(m_, d)),
      (0, 0.05), margin=0.6, sigmoid='long_tail'))
  return _env(task, batch_size, random)


def _add_vision(task, height=48, width=64):
  """Attach an in-graph rendered 'pixels' observable (the role of the
  reference's vision observation settings, manipulation/shared/
  observations.py: a fixed front camera; here the analytic raytracer,
  which traces the Jaco's mesh hulls)."""
  from dm_control_tpu._src import render as render_lib
  import numpy as np_
  pose = render_lib.free_camera_pose(
      np_.array([0.0, 0.0, 0.3]), 1.6, 215.0, -25.0)

  def pixels(m_, d):
    cam = (pose[0].astype(d.qpos.dtype), pose[1].astype(d.qpos.dtype),
           55.0 * np_.pi / 180.0)
    return render_lib.render(m_, d, height, width, camera=cam)

  task.add_observable('pixels', ObservableSpec(fn=pixels))
  return task


def _register_vision_variants():
  """reach_site_vision etc.: the feature task plus the pixels observable
  (reference manipulation registry's _vision tags)."""
  def make(feature_name):
    def factory(random=None, batch_size=None, height=48, width=64):
      env = REGISTRY[feature_name](random=random, batch_size=batch_size)
      task = _add_vision(env.task, height, width)
      # rebuild the env so its observation pipeline includes pixels
      return _env(task, batch_size, random)
    return factory
  for name in list(REGISTRY):
    if name.endswith('_features'):
      vname = name[:-len('_features')] + '_vision'
      REGISTRY[vname] = make(name)
      TAGS[vname] = tuple(t for t in TAGS[name] if t != 'features'
                          ) + ('vision',)


@_register('stack_2_bricks_features', 'features', 'hard')
def stack_2_bricks(random=None, batch_size=None):
  task, m = _build(props=(_brick_xml(name='brick0'),
                          _brick_xml(name='brick1')))
  c = _Common(task, m, prop_names=('brick0', 'brick1'))

  def init(m_, d, key):
    k1, k2 = jax.random.split(key)
    d = c.place_prop(m_, d, k1, 'brick0', r=0.3)
    return c.place_prop(m_, d, k2, 'brick1', r=0.3)

  task.add_init_hook(init)
  a0 = c.prop_q['brick0']
  a1 = c.prop_q['brick1']

  def reward(m_, d):
    # brick1 directly above brick0, one brick-height up
    goal = d.qpos[a0:a0 + 3] + jnp.asarray([0, 0, 0.04], d.qpos.dtype)
    return rewards.tolerance(
        jnp.linalg.norm(d.qpos[a1:a1 + 3] - goal), (0, 0.015),
        margin=0.4, sigmoid='long_tail')

  task.set_reward(reward)
  return _env(task, batch_size, random)


_register_vision_variants()
