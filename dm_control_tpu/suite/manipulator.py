"""Planar manipulator domain (reference: dm_control/suite/manipulator.py)."""

from __future__ import annotations

import collections
import functools

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import setconst
from dm_control_tpu._src import smooth as _smooth
from dm_control_tpu.mjcf import compiler as mjcf_compiler
from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite import common
from dm_control_tpu.utils import containers
from dm_control_tpu.utils import rewards

_CONTROL_TIMESTEP = .01
_TIME_LIMIT = 10
_P_IN_HAND = .1
_P_IN_TARGET = .1
_ARM_JOINTS = ['arm_root', 'arm_shoulder', 'arm_elbow', 'arm_wrist',
               'finger', 'fingertip', 'thumb', 'thumbtip']
_ALL_PROPS = frozenset(['ball', 'target_ball', 'cup', 'peg', 'target_peg',
                        'slot'])
_CLOSE = .01
SUITE = containers.TaggedTasks()


@functools.lru_cache(maxsize=None)
def _model(use_peg: bool, insert: bool):
  """Strip unused props (reference suite/manipulator.py:42-69)."""
  root = common.load_xml_root('manipulator.xml')
  if use_peg:
    required = {'peg', 'target_peg'} | ({'slot'} if insert else set())
  else:
    required = {'ball', 'target_ball'} | ({'cup'} if insert else set())
  world = root.find('worldbody')
  for prop in _ALL_PROPS - required:
    for parent in root.iter():
      for child in list(parent):
        if child.tag == 'body' and child.attrib.get('name') == prop:
          parent.remove(child)
  # drop sensors/tendons referencing removed bodies' sites or joints
  kept_names = set()
  for el in root.iter():
    if 'name' in el.attrib:
      kept_names.add(el.attrib['name'])
  for sec_tag in ('sensor',):
    for sec in root.findall(sec_tag):
      for el in list(sec):
        ref = (el.attrib.get('site') or el.attrib.get('joint')
               or el.attrib.get('body') or el.attrib.get('objname'))
        if ref and ref not in kept_names:
          sec.remove(el)
  m = mjcf_compiler.MJCFCompiler(root).build()
  return setconst.set_const(m)


@functools.lru_cache(maxsize=None)
def _make_task(use_peg: bool, insert: bool, fully_observable: bool):
  m = _model(use_peg, insert)
  target = 'target_peg' if use_peg else 'target_ball'
  obj = 'peg' if use_peg else 'ball'
  receptacle = 'slot' if use_peg else 'cup'

  arm_qadr = jnp.array(
      [int(m.jnt_qposadr[m.name2id('joint', j)]) for j in _ARM_JOINTS])
  arm_dadr = jnp.array(
      [int(m.jnt_dofadr[m.name2id('joint', j)]) for j in _ARM_JOINTS])
  arm_limited = np.array(
      [m.jnt_limited[m.name2id('joint', j)] for j in _ARM_JOINTS])
  arm_range = np.stack(
      [m.jnt_range[m.name2id('joint', j)] for j in _ARM_JOINTS])
  lower = np.where(arm_limited, arm_range[:, 0], -np.pi)
  upper = np.where(arm_limited, arm_range[:, 1], np.pi)
  finger_q = int(m.jnt_qposadr[m.name2id('joint', 'finger')])
  thumb_q = int(m.jnt_qposadr[m.name2id('joint', 'thumb')])
  obj_qadr = jnp.array([int(m.jnt_qposadr[m.name2id('joint', f'{obj}_{c}')])
                        for c in 'xzy'])
  obj_dadr = jnp.array([int(m.jnt_dofadr[m.name2id('joint', f'{obj}_{c}')])
                        for c in 'xzy'])
  objx_d = int(m.jnt_dofadr[m.name2id('joint', f'{obj}_x')])
  b_target = m.name2id('body', target)
  b_obj = m.name2id('body', obj)
  b_hand = m.name2id('body', 'hand')
  b_recep = m.name2id('body', receptacle) if insert else -1
  s_grasp = m.name2id('site', 'grasp')
  sites = {name: m.name2id('site', name)
           for name in m.names['site'].keys()}

  def init_episode(m_, d, key):
    def sample(d_, k):
      ks = jax.random.split(k, 8)
      angles = jax.random.uniform(
          ks[0], (len(_ARM_JOINTS),),
          minval=jnp.asarray(lower, d_.qpos.dtype),
          maxval=jnp.asarray(upper, d_.qpos.dtype))
      qpos = d_.qpos.at[arm_qadr].set(angles)
      qpos = qpos.at[finger_q].set(qpos[thumb_q])

      target_x = jax.random.uniform(ks[1], minval=-.4, maxval=.4)
      target_z = jax.random.uniform(ks[2], minval=.1, maxval=.4)
      if insert:
        target_angle = jax.random.uniform(
            ks[3], minval=-jnp.pi / 3, maxval=jnp.pi / 3)
      else:
        target_angle = jax.random.uniform(
            ks[3], minval=-jnp.pi, maxval=jnp.pi)
      quat = jnp.stack([jnp.cos(target_angle / 2), jnp.zeros(()),
                        jnp.sin(target_angle / 2), jnp.zeros(())])
      body_pos = jnp.asarray(m_.body_pos, d_.qpos.dtype)
      body_quat = jnp.asarray(m_.body_quat, d_.qpos.dtype)
      body_pos = body_pos.at[b_target, 0].set(target_x)
      body_pos = body_pos.at[b_target, 2].set(target_z)
      body_quat = body_quat.at[b_target].set(quat)
      if insert:
        body_pos = body_pos.at[b_recep, 0].set(target_x)
        body_pos = body_pos.at[b_recep, 2].set(target_z)
        body_quat = body_quat.at[b_recep].set(quat)

      # object placement: in_hand / in_target / uniform
      u = jax.random.uniform(ks[4])
      # compute grasp site pose under the new arm angles
      dk = d_.replace(qpos=qpos,
                      model_var=dict(d_.model_var or {},
                                     body_pos=body_pos,
                                     body_quat=body_quat))
      dk_kin = _smooth.kinematics(m_, dk)
      grasp_x = dk_kin.site_xpos[s_grasp, 0]
      grasp_z = dk_kin.site_xpos[s_grasp, 2]
      gdir_x = dk_kin.site_xmat[s_grasp, 0, 0]
      gdir_z = dk_kin.site_xmat[s_grasp, 2, 0]
      grasp_angle = jnp.pi - jnp.arctan2(gdir_z, gdir_x)

      uni_x = jax.random.uniform(ks[5], minval=-.5, maxval=.5)
      uni_z = jax.random.uniform(ks[6], minval=0., maxval=.7)
      uni_a = jax.random.uniform(ks[7], minval=0., maxval=2 * jnp.pi)

      in_hand = u < _P_IN_HAND
      in_target = (u >= _P_IN_HAND) & (u < _P_IN_HAND + _P_IN_TARGET)
      obj_x = jnp.where(in_hand, grasp_x,
                        jnp.where(in_target, target_x, uni_x))
      obj_z = jnp.where(in_hand, grasp_z,
                        jnp.where(in_target, target_z, uni_z))
      obj_a = jnp.where(in_hand, grasp_angle,
                        jnp.where(in_target, target_angle, uni_a))
      qpos = qpos.at[obj_qadr].set(jnp.stack([obj_x, obj_z, obj_a]))
      qvel = d_.qvel.at[objx_d].set(jnp.where(
          in_hand | in_target, 0.0,
          jax.random.uniform(jax.random.fold_in(ks[5], 7),
                             minval=-5., maxval=5.)))
      return dk.replace(qpos=qpos, qvel=qvel)

    return base.collision_free_init(sample, m_, d, key, max_attempts=20)

  def _body_2d_pose(d, b):
    return jnp.stack([d.xpos[b, 0], d.xpos[b, 2],
                      d.xquat[b, 0], d.xquat[b, 2]])

  def _site_distance(d, s1, s2):
    return jnp.linalg.norm(d.site_xpos[sites[s1]] - d.site_xpos[sites[s2]])

  def get_observation(m_, d):
    obs = collections.OrderedDict()
    jpos = d.qpos[arm_qadr]
    obs['arm_pos'] = jnp.stack([jnp.sin(jpos), jnp.cos(jpos)], axis=-1)
    obs['arm_vel'] = d.qvel[arm_dadr]
    obs['touch'] = jnp.log1p(d.sensordata)
    if fully_observable:
      obs['hand_pos'] = _body_2d_pose(d, b_hand)
      obs['object_pos'] = _body_2d_pose(d, b_obj)
      obs['object_vel'] = d.qvel[obj_dadr]
      obs['target_pos'] = _body_2d_pose(d, b_target)
    return obs

  def _is_close(dist):
    return rewards.tolerance(dist, (0, _CLOSE), _CLOSE * 2)

  def get_reward(m_, d):
    if use_peg:
      grasp = _is_close(_site_distance(d, 'peg_grasp', 'grasp'))
      pinch = _is_close(_site_distance(d, 'peg_pinch', 'pinch'))
      grasping = (grasp + pinch) / 2
      bring = _is_close(_site_distance(d, 'peg', 'target_peg'))
      bring_tip = _is_close(_site_distance(d, 'target_peg_tip', 'peg_tip'))
      bringing = (bring + bring_tip) / 2
      return jnp.maximum(bringing, grasping / 3)
    return _is_close(_site_distance(d, 'ball', 'target_ball'))

  name = f'manipulator_{"peg" if use_peg else "ball"}'
  return control.TaskDef(
      name=name, model=m, init_episode=init_episode,
      get_observation=get_observation, get_reward=get_reward,
      control_timestep=_CONTROL_TIMESTEP, expensive_init=True)


def _env(task, time_limit, random, environment_kwargs):
  return control.Environment(task, time_limit=time_limit, random=random,
                             **(environment_kwargs or {}))


@SUITE.add('benchmarking', 'hard')
def bring_ball(fully_observable=True, time_limit=_TIME_LIMIT, random=None,
               environment_kwargs=None):
  return _env(_make_task(False, False, fully_observable), time_limit,
              random, environment_kwargs)


@SUITE.add('hard')
def bring_peg(fully_observable=True, time_limit=_TIME_LIMIT, random=None,
              environment_kwargs=None):
  return _env(_make_task(True, False, fully_observable), time_limit,
              random, environment_kwargs)


@SUITE.add('hard')
def insert_ball(fully_observable=True, time_limit=_TIME_LIMIT, random=None,
                environment_kwargs=None):
  return _env(_make_task(False, True, fully_observable), time_limit,
              random, environment_kwargs)


@SUITE.add('hard')
def insert_peg(fully_observable=True, time_limit=_TIME_LIMIT, random=None,
               environment_kwargs=None):
  return _env(_make_task(True, True, fully_observable), time_limit,
              random, environment_kwargs)
