"""Shared task machinery: jax-native episode randomizers and helpers.

Functional replacement for the reference's suite/base.py Task plus
suite/utils/randomizers.py: initialization logic is expressed as pure
functions (Model, Data, key) -> Data so it runs inside jit for in-graph
batched resets.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import collision as _collision
from dm_control_tpu._src import forward as _forward
from dm_control_tpu._src import math as _math
from dm_control_tpu._src import smooth as _smooth
from dm_control_tpu._src.types import Data, JointType, Model


def random_limited_quaternion(key, limit):
  """Uniform random quaternion within `limit` radians of identity."""
  k1, k2 = jax.random.split(key)
  axis = _math.normalize(jax.random.normal(k1, (3,)))
  angle = jax.random.uniform(k2) * limit
  return _math.axis_angle_to_quat(axis, angle)


def randomize_limited_and_rotational_joints(
    m: Model, qpos: jax.Array, key: jax.Array) -> jax.Array:
  """Pure-jax port of the reference randomizer semantics
  (dm_control/suite/utils/randomizers.py:39-81):

    - limited hinge/slide: uniform within range
    - limited ball: uniform quaternion within max-range sector
    - unlimited hinge: uniform in [-pi, pi]
    - unlimited ball/free quaternion: uniform on the 3-sphere
    - free-joint translations: untouched
  """
  for j in range(m.njnt):
    key, sub = jax.random.split(key)
    jtype = JointType(int(m.jnt_type[j]))
    limited = bool(m.jnt_limited[j])
    qadr = int(m.jnt_qposadr[j])
    lo, hi = m.jnt_range[j]
    if limited:
      if jtype in (JointType.HINGE, JointType.SLIDE):
        qpos = qpos.at[qadr].set(
            jax.random.uniform(sub, minval=lo, maxval=hi))
      elif jtype == JointType.BALL:
        qpos = jax.lax.dynamic_update_slice(
            qpos, random_limited_quaternion(sub, hi), (qadr,))
    else:
      if jtype == JointType.HINGE:
        qpos = qpos.at[qadr].set(
            jax.random.uniform(sub, minval=-jnp.pi, maxval=jnp.pi))
      elif jtype == JointType.BALL:
        quat = _math.normalize(jax.random.normal(sub, (4,)))
        qpos = jax.lax.dynamic_update_slice(qpos, quat, (qadr,))
      elif jtype == JointType.FREE:
        quat = _math.normalize(jax.random.normal(sub, (4,)))
        qpos = jax.lax.dynamic_update_slice(qpos, quat, (qadr + 3,))
  return qpos


def has_contacts(m: Model, d: Data) -> jax.Array:
  """True if any active contact exists at d's qpos (runs kinematics)."""
  d = _smooth.kinematics(m, d)
  d = _collision.collide(m, d)
  if d.contact.dist.shape[0] == 0:
    return jnp.zeros((), bool)
  return jnp.any(d.contact.dist < d.contact.includemargin)


def collision_free_init(
    sample_fn: Callable[[Data, jax.Array], Data],
    m: Model, d: Data, key: jax.Array, max_attempts: int = 20) -> Data:
  """First collision-free sample among max_attempts candidates.

  In-graph replacement for the reference's rejection-sampling loops
  (e.g. suite/humanoid.py:163-170, suite/ball_in_cup.py): draws all
  candidates, evaluates the contact predicate, selects the first valid
  (falls back to the last candidate if none pass).
  """
  keys = jax.random.split(key, max_attempts)

  def candidate(k):
    dk = sample_fn(d, k)
    bad = has_contacts(m, dk)
    return dk, bad

  ds, bads = jax.lax.map(candidate, keys)
  ok = jnp.logical_not(bads)
  # index of first ok (or last index if none)
  first = jnp.argmax(ok)
  idx = jnp.where(jnp.any(ok), first, max_attempts - 1)
  return jax.tree_util.tree_map(lambda x: x[idx], ds)


def settle(m: Model, d: Data, n_steps: int) -> Data:
  """Step physics n times with zero ctrl and reset time (e.g. cheetah's
  200-step settling, suite/cheetah.py:76-80)."""
  d = _forward.forward(m, d)  # establish the step1-synced invariant
  step = lambda d, _: (_forward.step(m, d), None)
  d, _ = jax.lax.scan(step, d, None, length=n_steps)
  return d.replace(time=jnp.zeros_like(d.time))


def xmat_entry(d: Data, bodyid: int, row: int, col: int) -> jax.Array:
  """named.data.xmat[body, 'rc'] equivalent (row-major letter pairs)."""
  return d.xmat[bodyid, row, col]
