"""Episode initializers (reference: composer/initializers/).

PropPlacer: collision-free placement by in-graph rejection sampling
(the reference re-runs mj_forward + contact checks per attempt,
initializers/prop_initializer.py:49-140; here a bounded fori_loop keeps
the first collision-free draw — jit/vmap-safe so batched lanes place
independently).

ToolCenterPointInitializer: damped-least-squares IK on a site
(reference initializers/tcp_initializer.py:35 over
utils/inverse_kinematics.py)."""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from dm_control_tpu._src.types import Data, Model
from dm_control_tpu.composer import variation as variation_lib
from dm_control_tpu.suite import base as suite_base


class PropPlacer:
  """Places free bodies at sampled poses, keeping collision-free draws.

  prop_joints: qpos addresses of each prop's free joint (one per prop).
  position / quaternion: Variations (or constants) sampled per attempt.
  """

  def __init__(self, prop_qpos_addrs: Sequence[int], position,
               quaternion=None, max_attempts: int = 20,
               ignore_collisions: bool = False):
    self._addrs = list(prop_qpos_addrs)
    self._position = position
    self._quaternion = quaternion
    self._max_attempts = max_attempts
    self._ignore = ignore_collisions

  def __call__(self, m: Model, d: Data, key: jax.Array) -> Data:
    for adr in self._addrs:
      key, sub = jax.random.split(key)
      d = self._place_one(m, d, adr, sub)
    return d

  def _place_one(self, m, d, adr, key):
    dtype = d.qpos.dtype

    def propose(k, dd):
      k1, k2 = jax.random.split(k)
      pos = jnp.asarray(
          variation_lib.evaluate(self._position, k1), dtype)
      qpos = jax.lax.dynamic_update_slice(dd.qpos, pos, (adr,))
      if self._quaternion is not None:
        quat = jnp.asarray(
            variation_lib.evaluate(self._quaternion, k2), dtype)
        qpos = jax.lax.dynamic_update_slice(qpos, quat, (adr + 3,))
      return dd.replace(qpos=qpos)

    if self._ignore:
      return propose(key, d)

    def body(i, carry):
      dd, found = carry
      k = jax.random.fold_in(key, i)
      cand = propose(k, dd)
      ok = jnp.logical_not(suite_base.has_contacts(m, cand))
      take = jnp.logical_and(ok, jnp.logical_not(found))
      new = jax.tree_util.tree_map(
          lambda a, b: jnp.where(take, b, a), dd, cand)
      return new, jnp.logical_or(found, ok)

    first = propose(jax.random.fold_in(key, 0), d)
    out, _ = jax.lax.fori_loop(
        0, self._max_attempts, body, (first, jnp.zeros((), bool)))
    return out


class ToolCenterPointInitializer:
  """Set arm joints so a site reaches a sampled target position
  (reference initializers/tcp_initializer.py:35)."""

  def __init__(self, site_name: str, position, joint_mask=None,
               ik_steps: int = 30):
    self._site = site_name
    self._position = position
    self._joint_mask = joint_mask
    self._steps = ik_steps

  def __call__(self, m: Model, d: Data, key: jax.Array) -> Data:
    from dm_control_tpu.utils import inverse_kinematics as ik
    target = jnp.asarray(
        variation_lib.evaluate(self._position, key), d.qpos.dtype)
    result = ik.qpos_from_site_pose(
        m, d, self._site, target_pos=target,
        joint_mask=self._joint_mask, max_steps=self._steps)
    return d.replace(qpos=result.qpos)
