"""Arm/hand abstraction tier (reference entities/manipulators/base.py).

The reference's `RobotArm`/`RobotHand` ABCs (base.py:44,185) give every
arm a uniform surface — `joints`, `wrist_site`/`attachment_site`,
`randomize_arm_joints`, IK-driven `set_site_to_xpos` — and every hand
`set_grasp` + `tool_center_point`, so tasks compose against the
abstraction instead of a specific robot.

TPU design: an arm/hand here is an `Entity` subclass carrying STATIC
metadata (joint/site names, grasp ranges); every behavioral method is a
pure `(Model, Data, key) -> Data` function that jits/vmaps, with index
resolution done once per compiled model.  The IK retry loop
(base.py:130-158: attempt IK, re-randomize joints on failure) becomes a
`lax.while_loop` over (attempt, key) so batched initializers stay
in-graph.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src.types import Data, JointType, Model
from dm_control_tpu.composer.entity import Entity

# points the pinch site straight down (reference base.py:36)
DOWN_QUATERNION = np.array([0., 0.70710678118, 0.70710678118, 0.])


def _resolve_joints(m: Model, names: Sequence[str],
                    prefix: Optional[str]) -> Tuple[np.ndarray, np.ndarray,
                                                    np.ndarray]:
  """(qadr, dadr, jids) for the arm's joints under the attach prefix."""
  qs, ds, js = [], [], []
  for nm in names:
    full = f'{prefix}/{nm}' if prefix else nm
    j = m.name2id('joint', full)
    qs.append(int(m.jnt_qposadr[j]))
    ds.append(int(m.jnt_dofadr[j]))
    js.append(j)
  return np.asarray(qs), np.asarray(ds), np.asarray(js)


@dataclasses.dataclass
class RobotArm(Entity):
  """An attachable arm with the reference's RobotArm surface.

  Subclass-or-instantiate with the joint/site names of a concrete
  robot; `build()` hands back the same entity for task attachment.
  """
  joint_names: Sequence[str] = ()
  wrist_site_name: str = ''

  @property
  def attachment_site(self) -> str:
    """Site name where a hand attaches (reference base.py:49)."""
    return self.wrist_site_name

  def _prefix(self, prefix: Optional[str]) -> Optional[str]:
    # attached entities are name-prefixed by default
    return self.name if prefix is None else (prefix or None)

  def joint_addrs(self, m: Model, prefix: Optional[str] = None):
    qs, ds, _ = _resolve_joints(m, self.joint_names, self._prefix(prefix))
    return qs, ds

  def joint_pos_sampling_bounds(self, m: Model,
                                prefix: Optional[str] = None) -> np.ndarray:
    """(2, n) lower/upper qpos bounds (reference base.py:53-77:
    unlimited hinges sample [0, 2pi); non-hinge joints must be
    limited)."""
    _, _, jids = _resolve_joints(m, self.joint_names, self._prefix(prefix))
    lo, hi = [], []
    for j in jids:
      jtype = JointType(int(m.jnt_type[j]))
      limited = bool(m.jnt_limited[j])
      if limited:
        lo.append(float(m.jnt_range[j, 0]))
        hi.append(float(m.jnt_range[j, 1]))
      elif jtype == JointType.HINGE:
        lo.append(0.0)
        hi.append(2 * np.pi)
      else:
        raise RuntimeError(
            f'non-hinge joint {j} must have limits (reference '
            f'base.py:38-40)')
    return np.stack([np.asarray(lo), np.asarray(hi)])

  def randomize_arm_joints(self, m: Model, d: Data, key: jax.Array,
                           prefix: Optional[str] = None) -> Data:
    """Uniform joint randomization (reference base.py:79-89)."""
    qs, _ = self.joint_addrs(m, prefix)
    bounds = self.joint_pos_sampling_bounds(m, prefix)
    dtype = d.qpos.dtype
    q = jax.random.uniform(key, (len(qs),), dtype,
                           jnp.asarray(bounds[0], dtype),
                           jnp.asarray(bounds[1], dtype))
    return d.replace(qpos=d.qpos.at[qs].set(q))

  def set_site_to_xpos(self, m: Model, d: Data, key: jax.Array,
                       site_name: str, target_pos,
                       target_quat='down', max_ik_attempts: int = 10,
                       pos_tol: float = 1e-3,
                       prefix: Optional[str] = None
                       ) -> Tuple[Data, jax.Array]:
    """IK the arm so `site_name` reaches target_pos/quat, re-randomizing
    the joints between attempts (reference base.py:91-160).  Returns
    (Data, success flag); in-graph (while_loop), so it vmaps.

    target_quat: 'down' (default) = the reference's vertically-down
    orientation; None = position-only IK (extension; the right choice
    when the site frame's down-pointing quat differs from the
    reference hand's)."""
    from dm_control_tpu._src import forward as fwd
    from dm_control_tpu.utils import inverse_kinematics as ik

    if isinstance(target_quat, str) and target_quat == 'down':
      target_quat = DOWN_QUATERNION
    qs, ds = self.joint_addrs(m, prefix)
    joint_mask = np.zeros(m.nv, bool)
    joint_mask[ds] = True
    dtype = d.qpos.dtype
    target_pos = jnp.asarray(target_pos, dtype)
    if target_quat is not None:
      target_quat = jnp.asarray(target_quat, dtype)
    site = m.name2id('site', site_name)

    def attempt_err(qpos):
      res = ik.qpos_from_site_pose(
          m, d.replace(qpos=qpos), site_name,
          target_pos=target_pos, target_quat=target_quat,
          joint_mask=joint_mask, rot_weight=2.0)
      dd = fwd.forward(m, d.replace(qpos=res.qpos))
      err = jnp.linalg.norm(dd.site_xpos[site] - target_pos)
      return res.qpos, err

    def cond(carry):
      i, _, _, err = carry
      return jnp.logical_and(i < max_ik_attempts, err > pos_tol)

    def body(carry):
      i, k, qpos, _ = carry
      k, sub = jax.random.split(k)
      start = jnp.where(i == 0, qpos,
                        self.randomize_arm_joints(
                            m, d.replace(qpos=qpos), sub, prefix).qpos)
      sol, err = attempt_err(start)
      return i + 1, k, sol, err

    _, _, qpos, err = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), key, d.qpos,
                     jnp.asarray(jnp.inf, dtype)))
    return d.replace(qpos=qpos), err <= pos_tol


@dataclasses.dataclass
class RobotHand(Entity):
  """An attachable hand (reference base.py:185-202): `set_grasp` maps a
  [0, 1] close factor onto each finger joint's range; the tool center
  point is a named site."""
  finger_joint_names: Sequence[str] = ()
  tool_center_point_name: str = ''
  # per-finger (open, closed) qpos; defaults to the joint range
  grasp_range: Optional[np.ndarray] = None

  @property
  def tool_center_point(self) -> str:
    return self.tool_center_point_name

  def set_grasp(self, m: Model, d: Data, close_factors,
                prefix: Optional[str] = None) -> Data:
    """close_factors: scalar or (n_fingers,) in [0, 1]; 0 = open,
    1 = closed (reference base.py:188-199)."""
    pref = self.name if prefix is None else (prefix or None)
    qs, _, jids = _resolve_joints(m, self.finger_joint_names, pref)
    dtype = d.qpos.dtype
    if self.grasp_range is not None:
      rng = np.asarray(self.grasp_range, np.float64)
    else:
      rng = np.asarray(m.jnt_range)[jids]
    f = jnp.broadcast_to(jnp.asarray(close_factors, dtype), (len(qs),))
    q = jnp.asarray(rng[:, 0], dtype) + f * jnp.asarray(
        rng[:, 1] - rng[:, 0], dtype)
    return d.replace(qpos=d.qpos.at[qs].set(q))
