"""Quadruped domain: walk/run/escape/fetch
(reference: dm_control/suite/quadruped.py).

escape regenerates its bowl-shaped heightfield in-graph per episode
(reference :365-397 regenerates model.hfield_data with numpy + GL
re-upload; here it is a model_var override, so batched environments get
independent terrains).  fetch keeps the walls + ball."""

from __future__ import annotations

import collections
import functools

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import setconst
from dm_control_tpu._src import smooth as _smooth
from dm_control_tpu._src import collision as _collision
from dm_control_tpu.mjcf import compiler as mjcf_compiler
from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite import common
from dm_control_tpu.utils import containers
from dm_control_tpu.utils import rewards
from dm_control_tpu._src.types import JointType, SensorType

_DEFAULT_TIME_LIMIT = 20
_CONTROL_TIMESTEP = .02
_RUN_SPEED = 5
_WALK_SPEED = 0.5
_TERRAIN_SMOOTHNESS = 0.15
_TERRAIN_BUMP_SCALE = 2.0
_WALLS = ['wall_px', 'wall_py', 'wall_nx', 'wall_ny']
SUITE = containers.TaggedTasks()


@functools.lru_cache(maxsize=None)
def _model(floor_size=None, terrain=False, rangefinders=False,
           walls_and_ball=False):
  """Procedural model options (reference suite/quadruped.py:60-98)."""
  root = common.load_xml_root('quadruped.xml')

  def remove(tag, name):
    for parent in root.iter():
      for child in list(parent):
        if child.tag == tag and child.attrib.get('name') == name:
          parent.remove(child)
          return

  if floor_size is not None:
    for el in root.iter('geom'):
      if el.attrib.get('name') == 'floor':
        el.set('size', f'{floor_size} {floor_size} .5')
  if not walls_and_ball:
    for wall in _WALLS:
      remove('geom', wall)
    remove('body', 'ball')
    remove('site', 'target')
  if not terrain:
    remove('geom', 'terrain')
  if not rangefinders:
    for sec in root.findall('sensor'):
      for el in list(sec):
        if el.tag == 'rangefinder':
          sec.remove(el)
  # drop sensors that referenced removed elements
  kept = {el.attrib['name'] for el in root.iter() if 'name' in el.attrib}
  for sec in root.findall('sensor'):
    for el in list(sec):
      ref = (el.attrib.get('site') or el.attrib.get('joint')
             or el.attrib.get('body') or el.attrib.get('objname'))
      if ref and ref not in kept:
        sec.remove(el)
  m = mjcf_compiler.MJCFCompiler(root).build()
  # Top-K self-collision broadphase (same rationale as suite/humanoid.py:
  # 40-pair sphere-capsule + 58-pair capsule-capsule candidate sets with
  # <= ~10 simultaneously active; exact-distance selection, K=12).  The
  # quadruped parity/determinism rows validate the approximation.
  # Plane top-K for the 12-pair plane-capsule leg set (the toes that
  # actually walk are the 4 plane-sphere pairs, kept static); exact
  # selection unless >8 leg capsules touch the floor at once.
  # DMC_TPU_PLANE_CAP=0 restores the static layout.
  import dataclasses
  m = dataclasses.replace(
      m, opt=dataclasses.replace(m.opt, broadphase_threshold=30,
                                 broadphase_cap=12,
                                 broadphase_plane_cap=8))
  return setconst.set_const(m)


def _sensor_slices(m, stypes):
  out = []
  for s in range(m.nsensor):
    if SensorType(int(m.sensor_type[s])) in stypes:
      adr, dim = int(m.sensor_adr[s]), int(m.sensor_dim[s])
      out.append((adr, dim))
  return out


def _gather(d, slices):
  return jnp.concatenate([d.sensordata[a:a + n] for a, n in slices])


class _Parts:
  """Shared quadruped task machinery over a compiled model."""

  def __init__(self, m):
    self.m = m
    self.torso = m.name2id('body', 'torso')
    self.root_q = int(m.jnt_qposadr[m.name2id('joint', 'root')])
    self.hinge_q = jnp.array([int(m.jnt_qposadr[j]) for j in range(m.njnt)
                              if m.jnt_type[j] == JointType.HINGE])
    self.hinge_d = jnp.array([int(m.jnt_dofadr[j]) for j in range(m.njnt)
                              if m.jnt_type[j] == JointType.HINGE])
    self.vel_sl = _sensor_slices(m, {SensorType.VELOCIMETER})
    self.imu_sl = _sensor_slices(
        m, {SensorType.GYRO, SensorType.ACCELEROMETER})
    self.ft_sl = _sensor_slices(m, {SensorType.FORCE, SensorType.TORQUE})
    self.rf_sl = _sensor_slices(m, {SensorType.RANGEFINDER})
    names = m.names.get('site', {})
    self.workspace = names.get('workspace', -1)

  def settle(self, m_, d, quat, x=0.0, y=0.0, extra=None):
    """Lowest non-contacting height at (x, y) with orientation quat
    (reference _find_non_contacting_height, suite/quadruped.py:253-283)."""
    heights = jnp.arange(0.0, 2.0, 0.01, dtype=d.qpos.dtype)
    rq = self.root_q

    def place(z, dd):
      qpos = dd.qpos.at[rq:rq + 3].set(
          jnp.stack([jnp.asarray(x, dd.qpos.dtype),
                     jnp.asarray(y, dd.qpos.dtype), z]))
      return jax.lax.dynamic_update_slice(qpos, quat, (rq + 3,))

    def contact_free(z):
      dd = d.replace(qpos=place(z, d))
      return jnp.logical_not(base.has_contacts(m_, dd))

    free = jax.lax.map(contact_free, heights)
    z = heights[jnp.argmax(free)]
    return d.replace(qpos=place(z, d))

  def common_obs(self, d):
    obs = collections.OrderedDict()
    obs['egocentric_state'] = jnp.concatenate(
        [d.qpos[self.hinge_q], d.qvel[self.hinge_d], d.act])
    obs['torso_velocity'] = _gather(d, self.vel_sl)
    obs['torso_upright'] = d.xmat[self.torso, 2, 2]
    obs['imu'] = _gather(d, self.imu_sl)
    obs['force_torque'] = jnp.arcsinh(_gather(d, self.ft_sl))
    return obs

  def upright_reward(self, d, deviation_angle=0):
    deviation = float(np.cos(np.deg2rad(deviation_angle)))
    return rewards.tolerance(
        d.xmat[self.torso, 2, 2], bounds=(deviation, float('inf')),
        sigmoid='linear', margin=1 + deviation, value_at_margin=0)


@functools.lru_cache(maxsize=None)
def _make_task(desired_speed: float, floor_size: float):
  m = _model(floor_size=floor_size)
  p = _Parts(m)

  def init_episode(m_, d, key):
    quat = jax.random.normal(key, (4,))
    quat = quat / jnp.linalg.norm(quat)
    return p.settle(m_, d, quat.astype(d.qpos.dtype))

  def get_reward(m_, d):
    move = rewards.tolerance(
        _gather(d, p.vel_sl)[0], bounds=(desired_speed, float('inf')),
        margin=desired_speed, value_at_margin=0.5, sigmoid='linear')
    return p.upright_reward(d) * move

  return control.TaskDef(
      name='quadruped', model=m, init_episode=init_episode,
      get_observation=lambda m_, d: p.common_obs(d),
      get_reward=get_reward,
      control_timestep=_CONTROL_TIMESTEP, expensive_init=True)


@functools.lru_cache(maxsize=None)
def _make_escape_task():
  m = _model(terrain=True, rangefinders=True)
  p = _Parts(m)
  res = int(m.hfield_nrow[0])
  sx = float(m.hfield_size[0, 0])
  # static sinusoidal bowl shape (reference :375-378)
  row_grid, col_grid = np.ogrid[-1:1:res * 1j, -1:1:res * 1j]
  radius = np.clip(np.sqrt(col_grid ** 2 + row_grid ** 2), .04, 1)
  bowl_shape = .5 - np.cos(2 * np.pi * radius) / 2
  bump_res = int(2 * sx / _TERRAIN_BUMP_SCALE)

  def init_episode(m_, d, key):
    k1, k2 = jax.random.split(key)
    # random smooth bumps (reference :380-384; bicubic resize stands in
    # for ndimage.zoom's spline interpolation)
    bumps = jax.random.uniform(
        k1, (bump_res, bump_res), d.qpos.dtype,
        _TERRAIN_SMOOTHNESS, 1.0)
    smooth_bumps = jax.image.resize(bumps, (res, res), 'bicubic')
    terrain = jnp.asarray(bowl_shape, d.qpos.dtype) * smooth_bumps
    mv = dict(d.model_var or {})
    mv['hfield_data'] = terrain.ravel()
    d = d.replace(model_var=mv)
    quat = jax.random.normal(k2, (4,))
    quat = quat / jnp.linalg.norm(quat)
    return p.settle(m_, d, quat.astype(d.qpos.dtype))

  def get_observation(m_, d):
    obs = p.common_obs(d)
    obs['origin'] = -(d.xmat[p.torso].T @ d.xpos[p.torso])
    rf = _gather(d, p.rf_sl)
    obs['rangefinder'] = jnp.where(rf == -1.0, 1.0, jnp.tanh(rf))
    return obs

  def get_reward(m_, d):
    origin_dist = jnp.linalg.norm(d.site_xpos[p.workspace])
    escape_reward = rewards.tolerance(
        origin_dist, bounds=(sx, float('inf')), margin=sx,
        value_at_margin=0, sigmoid='linear')
    return p.upright_reward(d, deviation_angle=20) * escape_reward

  return control.TaskDef(
      name='quadruped', model=m, init_episode=init_episode,
      get_observation=get_observation, get_reward=get_reward,
      control_timestep=_CONTROL_TIMESTEP, expensive_init=True)


@functools.lru_cache(maxsize=None)
def _make_fetch_task():
  # floor_size=None: fetch keeps the XML's default 15 m floor
  # (reference quadruped.py:139-141 calls make_model(walls_and_ball=
  # True) with no floor_size override; using the walk sizing here made
  # arena_radius 10*sqrt(2) instead of 15*sqrt(2) and shifted every
  # reach/fetch tolerance margin)
  m = _model(floor_size=None, walls_and_ball=True)
  p = _Parts(m)
  ball = m.name2id('body', 'ball')
  ball_q = int(m.jnt_qposadr[m.name2id('joint', 'ball_root')])
  ball_d = int(m.jnt_dofadr[m.name2id('joint', 'ball_root')])
  target = m.names['site']['target']
  floor_g = m.name2id('geom', 'floor')
  floor_size = float(m.geom_size[floor_g, 0])
  ball_radius = float(m.geom_size[m.name2id('geom', 'ball'), 0])
  workspace_radius = float(m.site_size[p.workspace, 0])
  target_radius = float(m.site_size[target, 0])
  arena_radius = floor_size * np.sqrt(2)

  def init_episode(m_, d, key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    azimuth = jax.random.uniform(k1, (), d.qpos.dtype, 0, 2 * np.pi)
    quat = jnp.stack([jnp.cos(azimuth / 2), jnp.zeros_like(azimuth),
                      jnp.zeros_like(azimuth), jnp.sin(azimuth / 2)])
    spawn = 0.9 * floor_size
    xy = jax.random.uniform(k2, (2,), d.qpos.dtype, -spawn, spawn)
    d = p.settle(m_, d, quat, xy[0], xy[1])
    bxy = jax.random.uniform(k3, (2,), d.qpos.dtype, -spawn, spawn)
    qpos = d.qpos.at[ball_q:ball_q + 2].set(bxy)
    qpos = qpos.at[ball_q + 2].set(2.0)
    qvel = d.qvel.at[ball_d:ball_d + 2].set(
        5.0 * jax.random.normal(k4, (2,), d.qpos.dtype))
    return d.replace(qpos=qpos, qvel=qvel)

  def get_observation(m_, d):
    obs = p.common_obs(d)
    frame = d.xmat[p.torso]
    rel_pos = d.xpos[ball] - d.xpos[p.torso]
    rel_vel = d.qvel[ball_d:ball_d + 3] - d.qvel[:3]
    rot_vel = d.qvel[ball_d + 3:ball_d + 6]
    state = jnp.stack([rel_pos, rel_vel, rot_vel])
    obs['ball_state'] = (state @ frame).ravel()
    obs['target_position'] = frame.T @ (d.site_xpos[target]
                                        - d.xpos[p.torso])
    return obs

  def get_reward(m_, d):
    self_to_ball = jnp.linalg.norm(
        (d.site_xpos[p.workspace] - d.xpos[ball])[:2])
    reach_reward = rewards.tolerance(
        self_to_ball, bounds=(0, workspace_radius + ball_radius),
        sigmoid='linear', margin=arena_radius, value_at_margin=0)
    ball_to_target = jnp.linalg.norm(
        (d.site_xpos[target] - d.xpos[ball])[:2])
    fetch_reward = rewards.tolerance(
        ball_to_target, bounds=(0, target_radius),
        sigmoid='linear', margin=arena_radius, value_at_margin=0)
    reach_then_fetch = reach_reward * (0.5 + 0.5 * fetch_reward)
    return p.upright_reward(d) * reach_then_fetch

  return control.TaskDef(
      name='quadruped', model=m, init_episode=init_episode,
      get_observation=get_observation, get_reward=get_reward,
      control_timestep=_CONTROL_TIMESTEP, expensive_init=True)


@SUITE.add()
def walk(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
  return control.Environment(
      _make_task(_WALK_SPEED, _DEFAULT_TIME_LIMIT * _WALK_SPEED),
      time_limit=time_limit, random=random, **(environment_kwargs or {}))


@SUITE.add()
def run(time_limit=_DEFAULT_TIME_LIMIT, random=None, environment_kwargs=None):
  return control.Environment(
      _make_task(_RUN_SPEED, _DEFAULT_TIME_LIMIT * _RUN_SPEED),
      time_limit=time_limit, random=random, **(environment_kwargs or {}))


@SUITE.add()
def escape(time_limit=_DEFAULT_TIME_LIMIT, random=None,
           environment_kwargs=None):
  return control.Environment(
      _make_escape_task(), time_limit=time_limit, random=random,
      **(environment_kwargs or {}))


@SUITE.add()
def fetch(time_limit=_DEFAULT_TIME_LIMIT, random=None,
          environment_kwargs=None):
  return control.Environment(
      _make_fetch_task(), time_limit=time_limit, random=random,
      **(environment_kwargs or {}))
