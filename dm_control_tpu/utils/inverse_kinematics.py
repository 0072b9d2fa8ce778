"""Inverse kinematics: damped least-squares site posing.

Re-expresses reference dm_control/utils/inverse_kinematics.py:42-235
(`qpos_from_site_pose`, nullspace-regularized Jacobian steps) as a pure
jax fixed-iteration solver usable inside jit (e.g. for composer-style
tool-center-point initializers).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import forward as _forward
from dm_control_tpu._src import math as _math
from dm_control_tpu._src import smooth as _smooth
from dm_control_tpu._src.types import Data, Model


@dataclasses.dataclass
class IKResult:
  qpos: jax.Array
  err_norm: jax.Array
  steps: int
  success: jax.Array


def qpos_from_site_pose(
    m: Model,
    d: Data,
    site_name: str,
    target_pos: Optional[jax.Array] = None,
    target_quat: Optional[jax.Array] = None,
    joint_mask: Optional[np.ndarray] = None,
    tol: float = 1e-14,
    rot_weight: float = 1.0,
    regularization_strength: float = 3e-2,
    max_steps: int = 100,
    max_update_norm: float = 2.0,
) -> IKResult:
  """Iterate qpos so the site reaches target_pos and/or target_quat.

  Fixed max_steps iterations (jit-safe); `joint_mask` (nv bool) restricts
  which dofs move, like the reference's joint_names argument.
  """
  if target_pos is None and target_quat is None:
    raise ValueError('need target_pos and/or target_quat')
  site = m.name2id('site', site_name)
  dtype = d.qpos.dtype
  mask = (jnp.asarray(joint_mask, dtype) if joint_mask is not None
          else jnp.ones(m.nv, dtype))
  bodyid = int(m.site_bodyid[site])

  def err_and_jac(qpos):
    dd = d.replace(qpos=qpos)
    dd = _smooth.kinematics(m, dd)
    dd = _smooth.com_pos(m, dd)
    rows = []
    errs = []
    if target_pos is not None:
      jacp, _ = _smooth.jac(m, dd, dd.site_xpos[site], bodyid)
      rows.append(jacp.T)                  # (3, nv)
      errs.append(jnp.asarray(target_pos, dtype) - dd.site_xpos[site])
    if target_quat is not None:
      _, jacr = _smooth.jac(m, dd, dd.site_xpos[site], bodyid)
      site_quat = _math.mat_to_quat(dd.site_xmat[site])
      # world-frame rotational error to match the world-frame jacr
      err_rot = _math.quat_sub_world(jnp.asarray(target_quat, dtype),
                                     site_quat)
      rows.append(jacr.T * rot_weight)
      errs.append(err_rot * rot_weight)
    jac = jnp.concatenate(rows, axis=0) * mask[None, :]
    err = jnp.concatenate(errs)
    return err, jac

  def body(carry, _):
    qpos, best_err = carry
    err, jac = err_and_jac(qpos)
    err_norm = jnp.linalg.norm(err)
    # damped least squares: dq = J^T (J J^T + lambda I)^-1 err
    jjt = jac @ jac.T
    reg = regularization_strength * jnp.eye(jjt.shape[0], dtype=dtype)
    dq = jac.T @ jnp.linalg.solve(jjt + reg, err)
    dq_norm = jnp.linalg.norm(dq)
    scale = jnp.minimum(1.0, max_update_norm / jnp.maximum(dq_norm, 1e-14))
    dq = dq * scale
    # only update while above tolerance
    go = err_norm > tol
    new_qpos = _forward._integrate_pos(m, qpos, dq * mask, 1.0)
    qpos = jnp.where(go, new_qpos, qpos)
    return (qpos, jnp.minimum(best_err, err_norm)), err_norm

  (qpos, _), errs = jax.lax.scan(
      body, (d.qpos, jnp.asarray(jnp.inf, dtype)), None, length=max_steps)
  final_err, _ = err_and_jac(qpos)
  err_norm = jnp.linalg.norm(final_err)
  return IKResult(qpos=qpos, err_norm=err_norm, steps=max_steps,
                  success=err_norm < 1e-3)
