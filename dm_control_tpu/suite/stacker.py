"""Box-stacking domain (reference: dm_control/suite/stacker.py)."""

from __future__ import annotations

import collections
import functools

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

_CLOSE = .01
_CONTROL_TIMESTEP = .01
_TIME_LIMIT = 10
_ARM_JOINTS = ['arm_root', 'arm_shoulder', 'arm_elbow', 'arm_wrist',
               'finger', 'fingertip', 'thumb', 'thumbtip']
SUITE = containers.TaggedTasks()


@functools.lru_cache(maxsize=None)
def _model(n_boxes: int):
  """Strip unused boxes (reference suite/stacker.py:45-55)."""
  root = common.load_xml_root('stacker.xml')
  for b in range(n_boxes, 4):
    name = f'box{b}'
    for parent in root.iter():
      for child in list(parent):
        if child.tag == 'body' and child.attrib.get('name') == name:
          parent.remove(child)
  kept = set()
  for el in root.iter():
    if 'name' in el.attrib:
      kept.add(el.attrib['name'])
  for sec in root.findall('sensor'):
    for el in list(sec):
      ref = (el.attrib.get('site') or el.attrib.get('joint')
             or el.attrib.get('body'))
      if ref and ref not in kept:
        sec.remove(el)
  m = mjcf_compiler.MJCFCompiler(root).build()
  return setconst.set_const(m)


@functools.lru_cache(maxsize=None)
def _make_task(n_boxes: int, fully_observable: bool):
  m = _model(n_boxes)
  box_names = [f'box{b}' for b in range(n_boxes)]

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
  b_target = m.name2id('body', 'target')
  b_hand = m.name2id('body', 'hand')
  b_boxes = [m.name2id('body', n) for n in box_names]
  s_boxes = [m.name2id('site', n) for n in box_names]
  s_target = m.name2id('site', 'target')
  s_grasp = m.name2id('site', 'grasp')
  box_size = float(m.geom_size[m.name2id('geom', 'target'), 0])
  box_jq = {n: {c: int(m.jnt_qposadr[m.name2id('joint', f'{n}_{c}')])
                for c in 'xyz'} for n in box_names}
  box_jd = jnp.array(
      [int(m.jnt_dofadr[m.name2id('joint', f'{n}_{c}')])
       for n in box_names for c in 'xyz'])
  qpos0 = jnp.asarray(m.qpos0)

  def init_episode(m_, d, key):
    def sample(d_, k):
      ks = jax.random.split(k, 4 + 3 * n_boxes)
      angles = jax.random.uniform(
          ks[0], (len(_ARM_JOINTS),),
          minval=jnp.asarray(lower, d_.qpos.dtype),
          maxval=jnp.asarray(upper, d_.qpos.dtype))
      qpos = d_.qpos.at[arm_qadr].set(angles)
      qpos = qpos.at[finger_q].set(qpos[thumb_q])

      # target tower height: box_size * (2*randint(n)+1)
      h = jax.random.randint(ks[1], (), 0, n_boxes)
      target_z = box_size * (2 * h + 1).astype(d_.qpos.dtype)
      target_x = jax.random.uniform(ks[2], minval=-.37, maxval=.37)
      body_pos = jnp.asarray(m_.body_pos, d_.qpos.dtype)
      body_pos = body_pos.at[b_target, 0].set(target_x)
      body_pos = body_pos.at[b_target, 2].set(target_z)

      for i, n in enumerate(box_names):
        kx, kz, ky = jax.random.split(ks[3 + i], 3)
        qpos = qpos.at[box_jq[n]['x']].set(
            jax.random.uniform(kx, minval=.1, maxval=.3))
        qpos = qpos.at[box_jq[n]['z']].set(
            jax.random.uniform(kz, minval=0., maxval=.7))
        qpos = qpos.at[box_jq[n]['y']].set(
            jax.random.uniform(ky, minval=0., maxval=2 * jnp.pi))
      mv = dict(d_.model_var or {})
      mv['body_pos'] = body_pos
      return d_.replace(qpos=qpos, model_var=mv)

    return base.collision_free_init(sample, m_, d, key, max_attempts=20)

  def _body_2d_pose(d, b, orientation=True):
    pos = jnp.stack([d.xpos[b, 0], d.xpos[b, 2]])
    if not orientation:
      return pos
    return jnp.concatenate(
        [pos, jnp.stack([d.xquat[b, 0], d.xquat[b, 2]])])

  def get_observation(m_, d):
    obs = collections.OrderedDict()
    jpos = d.qpos[arm_qadr]
    obs['arm_pos'] = jnp.stack([jnp.sin(jpos), jnp.cos(jpos)], axis=-1)
    obs['arm_vel'] = d.qvel[arm_dadr]
    obs['touch'] = jnp.log1p(d.sensordata)
    if fully_observable:
      obs['hand_pos'] = _body_2d_pose(d, b_hand)
      obs['box_pos'] = jnp.concatenate(
          [_body_2d_pose(d, b) for b in b_boxes])
      obs['box_vel'] = d.qvel[box_jd]
      obs['target_pos'] = _body_2d_pose(d, b_target, orientation=False)
    return obs

  def get_reward(m_, d):
    dists = jnp.stack(
        [jnp.linalg.norm(d.site_xpos[s] - d.site_xpos[s_target])
         for s in s_boxes])
    box_is_close = rewards.tolerance(jnp.min(dists), margin=2 * box_size)
    hand_to_target = jnp.linalg.norm(
        d.site_xpos[s_grasp] - d.site_xpos[s_target])
    hand_is_far = rewards.tolerance(
        hand_to_target, bounds=(.1, float('inf')), margin=_CLOSE)
    return box_is_close * hand_is_far

  return control.TaskDef(
      name=f'stacker_{n_boxes}', model=m, init_episode=init_episode,
      get_observation=get_observation, get_reward=get_reward,
      control_timestep=_CONTROL_TIMESTEP, expensive_init=True)


@SUITE.add('hard')
def stack_2(fully_observable=True, time_limit=_TIME_LIMIT, random=None,
            environment_kwargs=None):
  return control.Environment(
      _make_task(2, fully_observable), time_limit=time_limit,
      random=random, **(environment_kwargs or {}))


@SUITE.add('hard')
def stack_4(fully_observable=True, time_limit=_TIME_LIMIT, random=None,
            environment_kwargs=None):
  return control.Environment(
      _make_task(4, fully_observable), time_limit=time_limit,
      random=random, **(environment_kwargs or {}))
