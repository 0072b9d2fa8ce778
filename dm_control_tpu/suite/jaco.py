"""Jaco domain (fork-added): 7-DoF arm reaching
(reference: dm_control/suite/jaco.py).

Sim backend only here (MujocoPhysics path); the real-robot TCP backend is
the host-side adapter in dm_control_tpu.robot (reference
robot/engine.py:50-350) and plugs into the same task semantics.  Relative
or absolute position control with the reference's DH-parameter forward
kinematics for the virtual-fence safety penalty (jaco.py:33-58,442-477)."""

from __future__ import annotations

import collections
import functools

import jax
import jax.numpy as jnp
import numpy as np
from dm_env import specs

from dm_control_tpu._src import engine
from dm_control_tpu.rl import control
from dm_control_tpu.suite import common
from dm_control_tpu.utils import containers
from dm_control_tpu.utils import rewards

_CONTROL_TIMESTEP = .1
_LONG_EPISODE_TIME_LIMIT = 20
_SHORT_EPISODE_TIME_LIMIT = 10
_BIG_TARGET = .05
_SMALL_TARGET = .025
SUITE = containers.TaggedTasks()

# DH parameters for the 7-DoF Jaco 2 (reference jaco.py:390-416)
_DH_LENGTHS = dict(D1=0.2755, D2=0.2050, D3=0.2050, D4=0.2073,
                   D5=0.1038, D6=0.1038, D7=0.1600, e2=0.0098)
_DH_A = np.zeros(7)
_DH_D = np.array([
    -_DH_LENGTHS['D1'], 0.0, -(_DH_LENGTHS['D2'] + _DH_LENGTHS['D3']),
    -_DH_LENGTHS['e2'], -(_DH_LENGTHS['D4'] + _DH_LENGTHS['D5']), 0.0,
    -(_DH_LENGTHS['D6'] + _DH_LENGTHS['D7'])])
_DH_ALPHA = np.array([np.pi / 2] * 6 + [np.pi])
_DH_THETA_SIGN = np.ones(7)
_DH_THETA_OFFSET = np.array([np.pi, 0, 0, 0, 0, 0, np.pi / 2])

_HOME_ANGLES = np.array([4.92, 2.839, 0.0, .758, 4.6366, 4.493, 5.0249,
                         1.1, 0.1, 1.1, 0.1, 1.1, 0.1])
_CLOSED_HAND = np.array([1.1, 0.1, 1.1, 0.1, 1.1, 0.1])


def dh_joint_positions(angles):
  """(7, 3) world xyz of each joint from DH forward kinematics
  (reference DHtransformEL + _find_joint_coordinate_extremes)."""
  dtype = angles.dtype
  tall = jnp.asarray(np.diag([1.0, -1.0, -1.0, 1.0]), dtype)
  out = []
  for i in range(7):
    theta = _DH_THETA_SIGN[i] * angles[i] + _DH_THETA_OFFSET[i]
    ct, st = jnp.cos(theta), jnp.sin(theta)
    ca, sa = float(np.cos(_DH_ALPHA[i])), float(np.sin(_DH_ALPHA[i]))
    a, dd = float(_DH_A[i]), float(_DH_D[i])
    t = jnp.stack([
        jnp.stack([ct, -st * ca, st * sa, a * ct]),
        jnp.stack([st, ct * ca, -ct * sa, a * st]),
        jnp.stack([jnp.zeros_like(ct), jnp.full_like(ct, sa),
                   jnp.full_like(ct, ca), jnp.full_like(ct, dd)]),
        jnp.stack([jnp.zeros_like(ct)] * 3 + [jnp.ones_like(ct)]),
    ])
    tall = tall @ t
    out.append(tall[:3, 3])
  return jnp.stack(out)


@functools.lru_cache(maxsize=None)
def _model(xml_name: str):
  return engine.load_model(common.model_path(xml_name))


@functools.lru_cache(maxsize=None)
def _make_task(xml_name, relative_step, relative_rad_max, fence_t,
               target_type, fixed_target_t, target_size, action_penalty,
               degrees_of_freedom):
  m = _model(xml_name)
  fence = dict(fence_t)
  dof = degrees_of_freedom
  extreme_joints = np.array([4, 6, 7]) - 1
  radii = target_size + .15
  target_g = m.name2id('geom', 'target')
  arm_q = np.array([int(m.jnt_qposadr[j]) for j in range(7)])
  lo = np.array([max(min(fence['x']), -.8), max(min(fence['y']), -.8),
                 max(min(fence['z']), 0.1)])
  hi = np.array([min(max(fence['x']), .8), min(max(fence['y']), .8),
                 min(max(fence['z']), .8)])
  fence_lo = np.array([min(fence[k]) for k in 'xyz'])
  fence_hi = np.array([max(fence[k]) for k in 'xyz'])

  def init_episode(m_, d, key):
    dtype = d.qpos.dtype
    qpos = d.qpos.at[:13].set(jnp.asarray(_HOME_ANGLES, dtype))
    if target_type == 'random':
      # rejection sample until tx+ty+tz <= 1.1 (reference jaco.py:483-496
      # uses the coordinate SUM as its 'distance' bound)
      def cond(c):
        _, t = c
        return jnp.sum(t) > 1.1

      def body(c):
        k, _ = c
        k, sub = jax.random.split(k)
        t = jax.random.uniform(sub, (3,), dtype, jnp.asarray(lo, dtype),
                               jnp.asarray(hi, dtype))
        return k, t

      _, target = jax.lax.while_loop(
          cond, body, (key, jnp.full((3,), jnp.inf, dtype)))
    else:
      target = jnp.asarray(fixed_target_t, dtype)
    geom_pos = jnp.asarray(m_.geom_pos, dtype).at[target_g].set(target)
    mv = dict(d.model_var or {})
    mv['geom_pos'] = geom_pos
    mv['_jaco_penalty'] = jnp.zeros((), dtype)
    return d.replace(qpos=qpos, model_var=mv)

  def before_step(m_, d, action):
    dtype = d.qpos.dtype
    angles = d.qpos[arm_q][:dof]
    if relative_step:
      rel = jnp.clip(action[:dof], -relative_rad_max, relative_rad_max)
      use = rel + angles
    else:
      use = jnp.clip(action[:dof], angles - relative_rad_max,
                     angles + relative_rad_max)
    penalty = jnp.zeros((), dtype)
    if action_penalty:
      penalty = penalty - jnp.sum((use - angles) ** 2)
    full = jnp.concatenate(
        [use, d.qpos[arm_q][dof:7],
         jnp.asarray(_CLOSED_HAND, dtype)])[:m_.nu]
    # virtual-fence check on the DH extremes of the REQUESTED pose
    extremes = dh_joint_positions(full[:7])[extreme_joints]
    hit = jnp.logical_or(extremes > jnp.asarray(fence_hi, dtype),
                         extremes < jnp.asarray(fence_lo, dtype))
    penalty = penalty - jnp.sum(jnp.any(hit, axis=1).astype(dtype))
    mv = dict(d.model_var or {})
    mv['_jaco_penalty'] = penalty
    return d.replace(ctrl=full, model_var=mv)

  def _tool_position(d):
    return dh_joint_positions(d.qpos[arm_q])[-1]

  def get_observation(m_, d):
    obs = collections.OrderedDict()
    target = (d.model_var or {}).get(
        'geom_pos', jnp.asarray(m_.geom_pos, d.qpos.dtype))[target_g]
    obs['to_target'] = target - _tool_position(d)
    obs['joint_angles'] = d.qpos[:m_.nu]
    obs['joint_forces'] = d.actuator_force
    obs['joint_velocity'] = d.actuator_velocity
    return obs

  def get_reward(m_, d):
    target = (d.model_var or {}).get(
        'geom_pos', jnp.asarray(m_.geom_pos, d.qpos.dtype))[target_g]
    distance = jnp.linalg.norm(_tool_position(d) - target)
    penalty = (d.model_var or {}).get('_jaco_penalty', 0.0)
    return rewards.tolerance(distance, (0, radii)) + penalty

  def action_spec_fn():
    if relative_step:
      return specs.BoundedArray(
          shape=(dof,), dtype=np.float64,
          minimum=-relative_rad_max * np.ones(dof),
          maximum=relative_rad_max * np.ones(dof))
    base = control.action_spec(m)
    return specs.BoundedArray(
        shape=(dof,), dtype=np.float64, minimum=base.minimum[:dof],
        maximum=base.maximum[:dof])

  return control.TaskDef(
      name='jaco', model=m, init_episode=init_episode,
      before_step=before_step, get_observation=get_observation,
      get_reward=get_reward, action_spec_fn=action_spec_fn,
      control_timestep=_CONTROL_TIMESTEP)


_FENCE = (('x', (-1, 1)), ('y', (-1, 1)), ('z', (0.05, 1.2)))


@SUITE.add('benchmarking')
def position_reacher_7DOF(random=None, fence=None, physics_type='mujoco',
                          environment_kwargs=None, **kwargs):
  del physics_type, kwargs
  fence_t = _FENCE if fence is None else tuple(sorted(
      (k, tuple(v)) for k, v in fence.items()))
  task = _make_task('jaco_j2s7s300_position.xml', False, .1, fence_t,
                    'random', (.2, .2, .5), _BIG_TARGET, True, 7)
  return control.Environment(
      task, time_limit=_SHORT_EPISODE_TIME_LIMIT, random=random,
      **(environment_kwargs or {}))


@SUITE.add('benchmarking')
def relative_position_reacher_7DOF(random=None, fence=None,
                                   physics_type='mujoco',
                                   environment_kwargs=None, **kwargs):
  del physics_type, kwargs
  fence_t = _FENCE if fence is None else tuple(sorted(
      (k, tuple(v)) for k, v in fence.items()))
  task = _make_task('jaco_j2s7s300_position.xml', True, .1, fence_t,
                    'random', (.2, .2, .5), _BIG_TARGET, True, 7)
  return control.Environment(
      task, time_limit=_SHORT_EPISODE_TIME_LIMIT, random=random,
      **(environment_kwargs or {}))


@SUITE.add('benchmarking')
def configurable_reacher(xml_name='jaco_j2s7s300_position.xml',
                         random=None, start_position='home',
                         fully_observable=True, action_penalty=True,
                         relative_step=True, relative_rad_max=.1,
                         fence=None, degrees_of_freedom=7,
                         target_size=_BIG_TARGET, target_type='random',
                         fixed_target_position=(.2, .2, .5),
                         episode_timelimit=_LONG_EPISODE_TIME_LIMIT,
                         physics_type='mujoco', environment_kwargs=None,
                         **kwargs):
  del start_position, fully_observable, physics_type, kwargs
  fence_t = _FENCE if fence is None else tuple(sorted(
      (k, tuple(v)) for k, v in fence.items()))
  task = _make_task(xml_name, bool(relative_step), float(relative_rad_max),
                    fence_t, target_type, tuple(fixed_target_position),
                    float(target_size), bool(action_penalty),
                    int(degrees_of_freedom))
  return control.Environment(
      task, time_limit=episode_timelimit, random=random,
      **(environment_kwargs or {}))
