"""Jaco-arm manipulation tasks (reference: manipulation/reach.py,
lift.py, place.py, bricks.py).

Each task composes: a standard arena (table plane), the Jaco j2s7s300
arm (the vendored model as a composer entity), props (Duplo bricks,
boxes, pedestals), and target sites.  Rewards follow the reference
shapes exactly (tolerance on TCP/prop/target distances, lowest-vertex
lift heights, corner stud-to-hole stacking distances); observations are
the feature sets (arm joints pos/vel, TCP pose, prop poses, desired
order) plus in-graph rendered pixels for the _vision variants.

Registry parity: all 25 reference task names
(manipulation_test.py / shared/registry) are registered here.
"""

from __future__ import annotations

import functools
import xml.etree.ElementTree as ET

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.composer.entity import Entity
from dm_control_tpu.composer.environment import (BatchedEnvironment,
                                                 Environment)
from dm_control_tpu.composer.observation import ObservableSpec
from dm_control_tpu.composer.task import ComposerTask
from dm_control_tpu.entities import duplo
from dm_control_tpu.suite import common
from dm_control_tpu.utils import rewards

_CONTROL_TIMESTEP = 0.04   # reference manipulation/shared/constants.py:18
_TIME_LIMIT = 10.0

_TARGET_RADIUS = 0.05      # reference reach.py:65 / place.py:47
_DISTANCE_TO_LIFT = 0.3    # reference lift.py:64
_BOX_SIZE = 0.09           # reference lift.py:53 (too big for pinch grip)
_BOX_MASS = 1.3
_PEDESTAL_RADIUS = 0.07    # reference place.py:48
_PEDESTAL_HEIGHT = 0.2     # reference place.py:85

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


# exported names for the bricks module
build_arena_jaco = _build


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

  def randomize_target(self, m_, d, key, lo=(-0.2, -0.2, 0.02),
                       hi=(0.2, 0.2, 0.4)):
    dtype = d.qpos.dtype
    t = jax.random.uniform(key, (3,), dtype, jnp.asarray(lo, dtype),
                           jnp.asarray(hi, dtype))
    site_pos = jnp.asarray(m_.site_pos, dtype).at[self.target_s].set(t)
    mv = dict(d.model_var or {})
    mv['site_pos'] = site_pos
    return d.replace(model_var=mv)

  def place_prop(self, m_, d, key, name, z=0.001, r=0.1, yaw=True):
    """Uniform placement on the table (reference prop_bbox half-extent
    0.1, reach.py:46-49) with a uniform z-rotation."""
    dtype = d.qpos.dtype
    adr = self.prop_q[name]
    k1, k2 = jax.random.split(key)
    xy = jax.random.uniform(k1, (2,), dtype, -r, r)
    qpos = d.qpos.at[adr:adr + 2].set(xy).at[adr + 2].set(z)
    if yaw:
      theta = jax.random.uniform(k2, (), dtype, -jnp.pi, jnp.pi)
      quat = jnp.stack([jnp.cos(theta / 2), jnp.zeros_like(theta),
                        jnp.zeros_like(theta), jnp.sin(theta / 2)])
      qpos = qpos.at[adr + 3:adr + 7].set(quat)
    return d.replace(qpos=qpos)

  def tcp_to(self, d, pos):
    return jnp.linalg.norm(d.xpos[self.tool_b] - pos)


def _env(task, batch_size, random):
  if batch_size:
    return BatchedEnvironment(task, batch_size, time_limit=_TIME_LIMIT)
  return Environment(task, time_limit=_TIME_LIMIT, random=random)


make_env = _env


# ---------------------------------------------------------------------------
# Reach (reference manipulation/reach.py:68-215)


@_register('reach_site_features', 'features', 'easy')
def reach_site(random=None, batch_size=None):
  task, m = _build()
  c = _Common(task, m)

  def init(m_, d, key):
    return c.randomize_target(m_, d, key)

  task.add_init_hook(init)
  # reference Reach.get_reward (reach.py:151-157): gaussian tolerance
  # with bounds=(0, radius), margin=radius
  task.set_reward(lambda m_, d: rewards.tolerance(
      c.tcp_to(d, c.target_pos(m_, d)),
      (0, _TARGET_RADIUS), margin=_TARGET_RADIUS))
  return _env(task, batch_size, random)


@_register('reach_duplo_features', 'features', 'easy')
def reach_duplo(random=None, batch_size=None):
  """Reach to a free Duplo brick (reference reach.py:197-205)."""
  task, m = _build(props=(duplo.duplo_entity('brick0'),))
  c = _Common(task, m, prop_names=('brick0',))
  adr = c.prop_q['brick0']

  def init(m_, d, key):
    return c.place_prop(m_, d, key, 'brick0')

  task.add_init_hook(init)
  task.set_reward(lambda m_, d: rewards.tolerance(
      c.tcp_to(d, d.qpos[adr:adr + 3]),
      (0, _TARGET_RADIUS), margin=_TARGET_RADIUS))
  return _env(task, batch_size, random)


# ---------------------------------------------------------------------------
# Lift (reference manipulation/lift.py:105-255)


def _box_entity(name='box', half=_BOX_SIZE, mass=_BOX_MASS):
  """A plain box with the 8 vertex sites the Lift reward reads
  (reference lift.py:67-94 _BoxWithVertexSites)."""
  root = ET.Element('mujoco')
  wb = ET.SubElement(root, 'worldbody')
  body = ET.SubElement(wb, 'body', dict(name=name))
  ET.SubElement(body, 'freejoint', dict(name=f'{name}_root'))
  ET.SubElement(body, 'geom', dict(
      name=f'{name}_geom', type='box', size=f'{half} {half} {half}',
      mass=f'{mass}', friction='1.5 0.01 0.001'))
  k = 0
  for sx in (-1, 1):
    for sy in (-1, 1):
      for sz in (-1, 1):
        ET.SubElement(body, 'site', dict(
            name=f'vertex_{k}', type='sphere', size='0.002',
            pos=f'{sx * half} {sy * half} {sz * half}',
            rgba='1 0 0 0.3'))
        k += 1
  return Entity(mjcf_root=root, name=name)


def _lift_task(prop_entity, prop_name, place_z, vertex_prefix,
               random, batch_size):
  """Shared Lift wiring: reward is a linear tolerance on the height of
  the prop's LOWEST bounding vertex above a target set at episode init
  (initial height + 0.3 m) — reference lift.py:176-196."""
  task, m = _build(props=(prop_entity,))
  c = _Common(task, m, prop_names=(prop_name,))
  vids = np.array([m.name2id('site', f'{vertex_prefix}/vertex_{k}')
                   for k in range(8)])

  def lowest(d):
    return d.site_xpos[vids][:, 2].min()

  def init(m_, d, key):
    d = c.place_prop(m_, d, key, prop_name, z=place_z)
    from dm_control_tpu._src import smooth
    d = smooth.kinematics(m_, d)
    mv = dict(d.model_var or {})
    mv['lift_target'] = lowest(d) + _DISTANCE_TO_LIFT
    return d.replace(model_var=mv)

  task.add_init_hook(init)

  def reward(m_, d):
    # tolerance(h, bounds=(target, inf), margin=0.3, value_at_margin=0,
    # sigmoid='linear') with a per-episode traced target reduces to a
    # clamped linear ramp (reference lift.py:182-187)
    target = (d.model_var or {})['lift_target']
    return jnp.clip(
        1.0 - (target - lowest(d)) / _DISTANCE_TO_LIFT, 0.0, 1.0)

  task.set_reward(reward)
  return _env(task, batch_size, random)


@_register('lift_brick_features', 'features')
def lift_brick(random=None, batch_size=None):
  """Lift a Duplo brick (reference lift.py:237-245 lifts a Duplo, not
  a plain box)."""
  return _lift_task(
      duplo.duplo_entity('brick0', vertex_sites=True), 'brick0',
      place_z=0.001, vertex_prefix='brick0',
      random=random, batch_size=batch_size)


@_register('lift_large_box_features', 'features')
def lift_large_box(random=None, batch_size=None):
  return _lift_task(
      _box_entity('box'), 'box', place_z=_BOX_SIZE,
      vertex_prefix='box', random=random, batch_size=batch_size)


# ---------------------------------------------------------------------------
# Place (reference manipulation/place.py:82-300)


def _pedestal_entity(cradle: str):
  """Static pedestal whose origin is the placement point: a capsule
  column below, a target site at the origin, and either a welded Duplo
  (place_brick) or a 3-sphere cradle (place_cradle) on top
  (reference place.py:44-108)."""
  root = ET.Element('mujoco')
  wb = ET.SubElement(root, 'worldbody')
  body = ET.SubElement(wb, 'body', dict(name='pedestal'))
  ET.SubElement(body, 'geom', dict(
      name='column', type='capsule', size=f'{_PEDESTAL_RADIUS}',
      fromto=f'0 0 {-_PEDESTAL_RADIUS} 0 0 '
             f'{-(_PEDESTAL_HEIGHT + _PEDESTAL_RADIUS)}'))
  ET.SubElement(body, 'site', dict(
      name='target', type='sphere', size=f'{_TARGET_RADIUS}',
      rgba='1 0 0 0.2'))
  if cradle == 'duplo':
    # welded brick on top: its studs are what the free brick clicks onto
    brick = duplo.duplo_entity('cradle', color=(0.5, 0.5, 0.5), free=False)
    from dm_control_tpu.composer.entity import attach as graft
    graft(root, brick, prefix='cradle', site_body='pedestal')
  else:
    sr = _PEDESTAL_RADIUS * 0.7
    for i, ang in enumerate(np.linspace(0, 2 * np.pi, 3, endpoint=False)):
      pos = 0.7 * sr * np.array([np.sin(ang), np.cos(ang), -1.0])
      ET.SubElement(body, 'geom', dict(
          name=f'cradle_{i}', type='sphere', size=f'{sr}', condim='6',
          pos=f'{pos[0]} {pos[1]} {pos[2]}'))
  return Entity(mjcf_root=root, name='pedestal')


def _place_task(cradle, random, batch_size):
  """Reference Place.get_reward (place.py:214-240): weighted mix of
  in_place (prop at the pedestal target) with grasp/hand-away shaping."""
  prop = duplo.duplo_entity('brick0')
  task, m = _build(props=(prop, _pedestal_entity(cradle)))
  c = _Common(task, m, prop_names=('brick0',))
  adr = c.prop_q['brick0']
  ped_b = m.name2id('body', 'pedestal/pedestal')
  target_s = m.name2id('site', 'pedestal/target')

  task.add_observable('pedestal_position', ObservableSpec(
      fn=lambda m_, d: d.site_xpos[target_s]))

  def init(m_, d, key):
    k1, k2 = jax.random.split(key)
    d = c.place_prop(m_, d, k1, 'brick0', z=0.001)
    # pedestal pose rides the body_pos overlay (static body)
    dtype = d.qpos.dtype
    lo = jnp.asarray([-0.1, -0.1, _PEDESTAL_RADIUS], dtype)
    hi = jnp.asarray([0.1, 0.1, _PEDESTAL_RADIUS + 0.1], dtype)
    pos = jax.random.uniform(k2, (3,), dtype, lo, hi)
    mv = dict(d.model_var or {})
    body_pos = jnp.asarray(mv.get('body_pos', m_.body_pos), dtype)
    mv['body_pos'] = body_pos.at[ped_b].set(pos)
    return d.replace(model_var=mv)

  task.add_init_hook(init)

  def reward(m_, d):
    target = d.site_xpos[target_s]
    obj = d.qpos[adr:adr + 3]
    tcp = d.xpos[c.tool_b]
    grasp = rewards.tolerance(
        jnp.linalg.norm(obj - tcp), (0, _TARGET_RADIUS),
        margin=_TARGET_RADIUS, sigmoid='long_tail')
    in_place = rewards.tolerance(
        jnp.linalg.norm(obj - target), (0, _TARGET_RADIUS),
        margin=_TARGET_RADIUS, sigmoid='long_tail')
    hand_away = rewards.tolerance(
        jnp.linalg.norm(tcp - target), (4 * _TARGET_RADIUS, jnp.inf),
        margin=3 * _TARGET_RADIUS, sigmoid='long_tail')
    grasp_or_away = grasp * (1 - in_place) + hand_away * in_place
    return (grasp_or_away + 10.0 * in_place) / 11.0

  task.set_reward(reward)
  return _env(task, batch_size, random)


@_register('place_brick_features', 'features')
def place_brick(random=None, batch_size=None):
  return _place_task('duplo', random, batch_size)


@_register('place_cradle_features', 'features')
def place_cradle(random=None, batch_size=None):
  return _place_task('cradle', random, batch_size)


# ---------------------------------------------------------------------------
# Stack / reassemble families (see bricks.py)


def _register_bricks():
  from dm_control_tpu.manipulation import bricks as B

  stack_cfgs = {
      'stack_2_bricks': dict(num_bricks=2, target_height=2,
                             moveable_base=False, randomize_order=False),
      'stack_2_bricks_moveable_base': dict(
          num_bricks=2, target_height=2, moveable_base=True,
          randomize_order=False),
      'stack_3_bricks': dict(num_bricks=3, target_height=3,
                             moveable_base=False, randomize_order=False),
      'stack_3_bricks_random_order': dict(
          num_bricks=3, target_height=3, moveable_base=False,
          randomize_order=True),
      'stack_2_of_3_bricks_random_order': dict(
          num_bricks=3, target_height=2, moveable_base=False,
          randomize_order=True),
  }
  for name, cfg in stack_cfgs.items():
    REGISTRY[f'{name}_features'] = functools.partial(B.stack, **cfg)
    TAGS[f'{name}_features'] = ('features', 'hard')

  re_cfgs = {
      'reassemble_3_bricks_fixed_order': dict(
          num_bricks=3, randomize_initial_order=False,
          randomize_desired_order=False),
      'reassemble_5_bricks_random_order': dict(
          num_bricks=5, randomize_initial_order=True,
          randomize_desired_order=True),
  }
  for name, cfg in re_cfgs.items():
    REGISTRY[f'{name}_features'] = functools.partial(B.reassemble, **cfg)
    TAGS[f'{name}_features'] = ('features', 'hard')


_register_bricks()


# ---------------------------------------------------------------------------
# Vision variants


def _add_vision(task, height=48, width=64):
  """Attach an in-graph rendered 'pixels' observable (the role of the
  reference's vision observation settings, manipulation/shared/
  observations.py: a fixed front camera; here the analytic raytracer,
  which traces the Jaco's mesh hulls) via the first-class camera
  observable (composer.observation.camera_observable)."""
  from dm_control_tpu._src import render as render_lib
  from dm_control_tpu.composer.observation import camera_observable
  import numpy as np_
  pos, rot = render_lib.free_camera_pose(
      np_.array([0.0, 0.0, 0.3]), 1.6, 215.0, -25.0)
  task.add_observable('pixels', camera_observable(
      pose=(pos, rot, 55.0 * np_.pi / 180.0), height=height, width=width))
  return task


# every reference feature task has a vision twin EXCEPT
# stack_3_bricks_random_order (manipulation registry)
_NO_VISION = {'stack_3_bricks_random_order_features'}


def _register_vision_variants():
  """<name>_vision: the feature task plus the pixels observable
  (reference manipulation registry's vision tags)."""
  def make(feature_name):
    def factory(random=None, batch_size=None, height=48, width=64):
      env = REGISTRY[feature_name](random=random, batch_size=batch_size)
      task = _add_vision(env.task, height, width)
      # rebuild the env so its observation pipeline includes pixels
      return _env(task, batch_size, random)
    return factory
  for name in list(REGISTRY):
    if name.endswith('_features') and name not in _NO_VISION:
      vname = name[:-len('_features')] + '_vision'
      REGISTRY[vname] = make(name)
      TAGS[vname] = tuple(t for t in TAGS[name] if t != 'features'
                          ) + ('vision',)


_register_vision_variants()
