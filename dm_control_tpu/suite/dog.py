"""Dog domain: stand/walk/trot/run/fetch (reference: dm_control/suite/dog.py).

85-DoF quadruped with 162 visual bone meshes (mesh mass properties via the
compiler's legacy inertia), noslip friction refinement, and filter
actuators.  Rewards/observations mirror the reference task definitions
(dog.py:164-470)."""

from __future__ import annotations

import collections
import functools

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import sensor as _sensor
from dm_control_tpu._src import setconst
from dm_control_tpu.mjcf import compiler as mjcf_compiler
from dm_control_tpu.rl import control
from dm_control_tpu.suite import common
from dm_control_tpu.utils import containers
from dm_control_tpu.utils import rewards
from dm_control_tpu._src.types import JointType, ObjType

_DEFAULT_TIME_LIMIT = 15
_CONTROL_TIMESTEP = .015
_MAX_UPRIGHT_ANGLE = 30
_MIN_UPRIGHT_COSINE = float(np.cos(np.deg2rad(_MAX_UPRIGHT_ANGLE)))
_STAND_HEIGHT_FRACTION = 0.9
_WALK_SPEED = 1
_TROT_SPEED = 3
_RUN_SPEED = 9
SUITE = containers.TaggedTasks()


@functools.lru_cache(maxsize=None)
def _model(floor_size: float, remove_ball: bool):
  """Set floor size; optionally strip ball/target/walls/cameras
  (reference dog.py:66-90)."""
  root = common.load_xml_root('dog.xml')

  def remove(tag, name):
    for parent in root.iter():
      for child in list(parent):
        if child.tag == tag and child.attrib.get('name') == name:
          parent.remove(child)
          return

  for el in root.iter('geom'):
    if el.attrib.get('name') == 'floor':
      el.set('size', f'{floor_size} {floor_size} .1')
  if remove_ball:
    remove('body', 'ball')
    remove('geom', 'target')
    remove('camera', 'ball')
    remove('camera', 'head')
    for wall in ['px', 'nx', 'py', 'ny']:
      remove('geom', 'wall_' + wall)
  kept = {el.attrib['name'] for el in root.iter() if 'name' in el.attrib}
  for sec in root.findall('sensor'):
    for el in list(sec):
      ref = (el.attrib.get('site') or el.attrib.get('joint')
             or el.attrib.get('body') or el.attrib.get('objname'))
      if ref and ref not in kept:
        sec.remove(el)
  m = mjcf_compiler.MJCFCompiler(
      root, base_dir=common.suite_dir()).build()
  return setconst.set_const(m)


def _sensor_slice(m, name):
  s = m.names['sensor'][name]
  adr, dim = int(m.sensor_adr[s]), int(m.sensor_dim[s])
  return adr, dim


def _gather_named(m, d, names):
  parts = []
  for n in names:
    adr, dim = _sensor_slice(m, n)
    parts.append(d.sensordata[adr:adr + dim])
  return jnp.concatenate(parts)


class _Parts:
  def __init__(self, m):
    self.m = m
    self.torso = m.name2id('body', 'torso')
    self.pelvis = m.name2id('body', 'pelvis')
    self.skull = m.name2id('body', 'skull')
    self.root_q = int(m.jnt_qposadr[m.name2id('joint', 'root')])
    hinge = [j for j in range(m.njnt)
             if m.jnt_type[j] == JointType.HINGE]
    self.hinge_q = np.array([int(m.jnt_qposadr[j]) for j in hinge])
    self.hinge_d = np.array([int(m.jnt_dofadr[j]) for j in hinge])
    # standing height at the default pose (static; reference :269-277)
    from dm_control_tpu._src import engine as _engine
    d0 = _engine.build_forward(m)(_engine.make_data(m))
    self.stand_height = (_STAND_HEIGHT_FRACTION * np.array(
        [float(d0.xpos[self.torso, 2]), float(d0.xpos[self.pelvis, 2])]))
    self.body_weight = float(
        -m.opt.gravity[2] * m.body_subtreemass[self.torso])
    self.ctrl_lo = np.where(m.actuator_ctrllimited,
                            m.actuator_ctrlrange[:, 0], -1.0)
    self.ctrl_hi = np.where(m.actuator_ctrllimited,
                            m.actuator_ctrlrange[:, 1], 1.0)

  def torso_pelvis_height(self, d):
    return jnp.stack([d.xpos[self.torso, 2], d.xpos[self.pelvis, 2]])

  def upright(self, d):
    return jnp.stack([d.xmat[self.skull, 2, 2], d.xmat[self.torso, 2, 2],
                      d.xmat[self.pelvis, 2, 2]])

  def torso_com_velocity(self, d):
    m = self.m
    adr, dim = _sensor_slice(m, 'torso_linvel')
    com_vel = d.sensordata[adr:adr + dim]
    return com_vel @ d.xmat[self.torso]

  def init_episode(self, m_, d, key):
    """Random azimuth, horizontal root velocities, actuator states
    (reference dog.py:269-299)."""
    k1, k2, k3 = jax.random.split(key, 3)
    azimuth = jax.random.uniform(k1, (), d.qpos.dtype, 0, 2 * np.pi)
    quat = jnp.stack([jnp.cos(azimuth / 2), jnp.zeros_like(azimuth),
                      jnp.zeros_like(azimuth), jnp.sin(azimuth / 2)])
    rq = self.root_q
    qpos = jax.lax.dynamic_update_slice(d.qpos, quat, (rq + 3,))
    v = 2.0 * jax.random.normal(k2, (3,), d.qpos.dtype)
    qvel = d.qvel.at[0].set(v[0]).at[1].set(v[1]).at[5].set(v[2])
    act = jax.random.uniform(
        k3, (m_.na,), d.qpos.dtype,
        jnp.asarray(self.ctrl_lo, d.qpos.dtype),
        jnp.asarray(self.ctrl_hi, d.qpos.dtype))
    return d.replace(qpos=qpos, qvel=qvel, act=act)

  def common_obs(self, m_, d):
    obs = collections.OrderedDict()
    obs['joint_angles'] = d.qpos[self.hinge_q]
    obs['joint_velocites'] = d.qvel[self.hinge_d]
    obs['torso_pelvis_height'] = self.torso_pelvis_height(d)
    obs['z_projection'] = jnp.concatenate(
        [d.xmat[self.skull, 2], d.xmat[self.torso, 2],
         d.xmat[self.pelvis, 2]])
    obs['torso_com_velocity'] = self.torso_com_velocity(d)
    obs['inertial_sensors'] = _gather_named(
        m_, d, ['accelerometer', 'velocimeter', 'gyro'])
    obs['foot_forces'] = _gather_named(
        m_, d, ['foot_L', 'foot_R', 'hand_L', 'hand_R'])
    obs['touch_sensors'] = _gather_named(
        m_, d, ['palm_L', 'palm_R', 'sole_L', 'sole_R'])
    obs['actuator_state'] = d.act
    return obs

  def stand_factors(self, m_, d):
    torso = rewards.tolerance(
        self.torso_pelvis_height(d)[0],
        bounds=(self.stand_height[0], float('inf')),
        margin=self.stand_height[0])
    pelvis = rewards.tolerance(
        self.torso_pelvis_height(d)[1],
        bounds=(self.stand_height[1], float('inf')),
        margin=self.stand_height[1])
    upright = rewards.tolerance(
        self.upright(d), bounds=(_MIN_UPRIGHT_COSINE, float('inf')),
        sigmoid='linear', margin=_MIN_UPRIGHT_COSINE + 1,
        value_at_margin=0)
    touch = rewards.tolerance(
        jnp.sum(_gather_named(
            m_, d, ['palm_L', 'palm_R', 'sole_L', 'sole_R'])),
        bounds=(self.body_weight, float('inf')),
        margin=self.body_weight, sigmoid='linear', value_at_margin=0.9)
    return [torso, pelvis, upright[0], upright[1], upright[2], touch]


@functools.lru_cache(maxsize=None)
def _make_move_task(move_speed: float):
  floor_size = max(move_speed, _WALK_SPEED) * _DEFAULT_TIME_LIMIT
  m = _model(floor_size, remove_ball=True)
  p = _Parts(m)

  def get_reward(m_, d):
    factors = p.stand_factors(m_, d)
    if move_speed > 0:
      speed_margin = max(1.0, move_speed)
      forward = rewards.tolerance(
          p.torso_com_velocity(d)[0],
          bounds=(move_speed, 2 * move_speed),
          margin=speed_margin, value_at_margin=0, sigmoid='linear')
      factors.append((4 * forward + 1) / 5)
    out = factors[0]
    for f in factors[1:]:
      out = out * f
    return out

  return control.TaskDef(
      name='dog', model=m, init_episode=p.init_episode,
      get_observation=p.common_obs, get_reward=get_reward,
      control_timestep=_CONTROL_TIMESTEP)


@functools.lru_cache(maxsize=None)
def _make_fetch_task():
  m = _model(_WALK_SPEED * _DEFAULT_TIME_LIMIT, remove_ball=False)
  p = _Parts(m)
  ball_g = m.name2id('geom', 'ball')
  ball_b = m.name2id('body', 'ball')
  target_g = m.name2id('geom', 'target')
  head_s = m.names['site']['head']
  upper_bite = m.names['site']['upper_bite']
  lower_bite = m.names['site']['lower_bite']
  ball_q = int(m.jnt_qposadr[m.name2id('joint', 'ball_root')])
  ball_d = int(m.jnt_dofadr[m.name2id('joint', 'ball_root')])
  floor_size = float(m.geom_size[m.name2id('geom', 'floor'), 0])
  bite_radius = float(m.site_size[upper_bite, 0])
  target_radius = float(m.geom_size[target_g, 0])
  gravity = float(-m.opt.gravity[2])

  def init_episode(m_, d, key):
    k0, k1, k2, k3, k4 = jax.random.split(key, 5)
    d = p.init_episode(m_, d, k0)
    radius = 0.75 * floor_size
    azimuth = jax.random.uniform(k1, (), d.qpos.dtype, 0, 2 * np.pi)
    position = jnp.stack([radius * jnp.sin(azimuth),
                          radius * jnp.cos(azimuth),
                          jnp.asarray(0.05, d.qpos.dtype)])
    vert_h = jax.random.uniform(k2, (), d.qpos.dtype, 0, 3)
    vert_v = jnp.sqrt(2 * gravity * vert_h)
    horiz_speed = jax.random.uniform(k3, (), d.qpos.dtype, 0, 5)
    noise = 0.05 * jax.random.normal(k4, (2,), d.qpos.dtype)
    direction = jnp.stack([-jnp.sin(azimuth) + noise[0],
                           -jnp.cos(azimuth) + noise[1]])
    velocity = jnp.concatenate([horiz_speed * direction, vert_v[None]])
    qpos = jax.lax.dynamic_update_slice(d.qpos, position, (ball_q,))
    qvel = jax.lax.dynamic_update_slice(d.qvel, velocity, (ball_d,))
    return d.replace(qpos=qpos, qvel=qvel)

  def ball_to_mouth_distance(d):
    up = jnp.linalg.norm(d.geom_xpos[ball_g] - d.site_xpos[upper_bite])
    lo = jnp.linalg.norm(d.geom_xpos[ball_g] - d.site_xpos[lower_bite])
    return 0.5 * (up + lo)

  def get_observation(m_, d):
    obs = p.common_obs(m_, d)
    head_frame = d.site_xmat[head_s]
    head_to_ball = d.geom_xpos[ball_g] - d.site_xpos[head_s]
    head_vel = _sensor._object_velocity(
        m_, d, int(ObjType.SITE), head_s)[3:]
    ball_vel = _sensor._object_velocity(
        m_, d, int(ObjType.GEOM), ball_g)[3:]
    rel_vel = ball_vel - head_vel
    obs['ball_state'] = jnp.concatenate(
        [head_to_ball @ head_frame, rel_vel @ head_frame])
    obs['target_position'] = (
        d.geom_xpos[target_g] - d.site_xpos[head_s]) @ head_frame
    return obs

  def get_reward(m_, d):
    factors = p.stand_factors(m_, d)
    b2m = ball_to_mouth_distance(d)
    reach_ball = rewards.tolerance(
        b2m, bounds=(0, bite_radius), sigmoid='reciprocal', margin=2)
    reach_ball = (6 * reach_ball + 1) / 7
    b2t = jnp.linalg.norm(d.geom_xpos[ball_g] - d.geom_xpos[target_g])
    ball_near_target = rewards.tolerance(
        b2t, bounds=(0, target_radius), sigmoid='reciprocal',
        margin=floor_size)
    fetch_ball = (ball_near_target + 1) / 2
    reach_ball = jnp.where(b2t < 2 * target_radius, 1.0, reach_ball)
    out = factors[0]
    for f in factors[1:] + [reach_ball, fetch_ball]:
      out = out * f
    return out

  return control.TaskDef(
      name='dog', model=m, init_episode=init_episode,
      get_observation=get_observation, get_reward=get_reward,
      control_timestep=_CONTROL_TIMESTEP)


@SUITE.add('no_reward_visualization')
def stand(time_limit=_DEFAULT_TIME_LIMIT, random=None,
          environment_kwargs=None):
  return control.Environment(
      _make_move_task(0.0), time_limit=time_limit, random=random,
      **(environment_kwargs or {}))


@SUITE.add('no_reward_visualization')
def walk(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
  return control.Environment(
      _make_move_task(_WALK_SPEED), time_limit=time_limit, random=random,
      **(environment_kwargs or {}))


@SUITE.add('no_reward_visualization')
def trot(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
  return control.Environment(
      _make_move_task(_TROT_SPEED), time_limit=time_limit, random=random,
      **(environment_kwargs or {}))


@SUITE.add('no_reward_visualization')
def run(time_limit=_DEFAULT_TIME_LIMIT, random=None,
        environment_kwargs=None):
  return control.Environment(
      _make_move_task(_RUN_SPEED), time_limit=time_limit, random=random,
      **(environment_kwargs or {}))


@SUITE.add('no_reward_visualization', 'hard')
def fetch(time_limit=_DEFAULT_TIME_LIMIT, random=None,
          environment_kwargs=None):
  return control.Environment(
      _make_fetch_task(), time_limit=time_limit, random=random,
      **(environment_kwargs or {}))
