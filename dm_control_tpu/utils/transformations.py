"""Rigid-body transformation utilities (pure jnp).

Re-expresses the semantics of the reference's
dm_control/utils/transformations.py:66-594: quaternion algebra,
rotation-matrix and Euler-angle conversions (all seven orderings),
homogeneous transforms.  Everything is jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import math as _math

# re-export the core quaternion ops under the reference's names
quat_conj = _math.quat_conj
quat_mul = _math.quat_mul
quat_rotate = _math.quat_rotate
quat_to_mat3 = _math.quat_to_mat
mat3_to_quat = _math.mat_to_quat
axisangle_to_quat_split = _math.axis_angle_to_quat


def quat_inv(q):
  return _math.quat_conj(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def quat_diff(source, target):
  """Quaternion that rotates source to target: conj(source) * target."""
  return _math.quat_mul(_math.quat_conj(source), target)


def quat_dist(source, target):
  """Angular distance (radians) between two unit quaternions."""
  d = quat_diff(_math.normalize(source), _math.normalize(target))
  return 2.0 * jnp.arctan2(_math.norm_safe(d[..., 1:]),
                           jnp.abs(d[..., 0]))


def quat_angle(q):
  """Rotation angle of a unit quaternion."""
  return 2.0 * jnp.arctan2(_math.norm_safe(q[..., 1:]), jnp.abs(q[..., 0]))


def quat_axis(q):
  """Rotation axis of a unit quaternion."""
  return _math.normalize(q[..., 1:])


def axisangle_to_quat(axisangle):
  """3-vector whose norm is the angle -> quaternion."""
  angle = _math.norm_safe(axisangle)
  axis = _math.normalize(axisangle)
  q = _math.axis_angle_to_quat(axis, angle)
  return jnp.where(angle[..., None] > 0, q,
                   jnp.broadcast_to(
                       jnp.array([1.0, 0, 0, 0], q.dtype), q.shape))


def quat_to_axisangle(q):
  """Quaternion -> 3-vector whose norm is the angle."""
  angle = quat_angle(q)
  sign = jnp.sign(q[..., 0:1])
  axis = _math.normalize(q[..., 1:] * sign)
  return axis * angle[..., None]


def quat_to_mat(q):
  """Quaternion -> 4x4 homogeneous rotation matrix."""
  r3 = _math.quat_to_mat(q)
  out = jnp.zeros(q.shape[:-1] + (4, 4), q.dtype)
  out = out.at[..., :3, :3].set(r3)
  return out.at[..., 3, 3].set(1.0)


def mat_to_quat(m):
  """3x3 or 4x4 rotation matrix -> quaternion."""
  return _math.mat_to_quat(m[..., :3, :3])


def quat_slerp(q0, q1, t):
  """Spherical linear interpolation between unit quaternions."""
  dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
  q1 = jnp.where(dot < 0, -q1, q1)
  dot = jnp.abs(dot)
  theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
  sin_theta = jnp.sin(theta)
  near = sin_theta < 1e-7
  w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) /
                 jnp.maximum(sin_theta, 1e-12))
  w1 = jnp.where(near, t, jnp.sin(t * theta) /
                 jnp.maximum(sin_theta, 1e-12))
  return _math.normalize(w0 * q0 + w1 * q1)


# --- Euler conversions -----------------------------------------------------

_AXES = {'X': jnp.array([1.0, 0, 0]), 'Y': jnp.array([0, 1.0, 0]),
         'Z': jnp.array([0, 0, 1.0])}
_ORDERINGS = ('XYZ', 'XYX', 'XZY', 'ZYX', 'YZX', 'ZXY', 'YXZ')


def _axis_rot(axis: str, angle):
  return _math.quat_to_mat(
      _math.axis_angle_to_quat(_AXES[axis].astype(jnp.result_type(angle)),
                               angle))


def euler_to_rmat(euler_vec, ordering: str = 'ZYX'):
  """Euler angles -> 3x3 rotation matrix.

  `ordering` gives intrinsic rotations applied in sequence (reference
  transformations.py semantics: R = R(a0) @ R(a1) @ R(a2))."""
  if ordering.upper() not in _ORDERINGS and len(ordering) != 3:
    raise ValueError(f'bad ordering {ordering}')
  r = None
  for i, ax in enumerate(ordering.upper()):
    ri = _axis_rot(ax, euler_vec[..., i])
    r = ri if r is None else r @ ri
  return r


def euler_to_quat(euler_vec, ordering: str = 'ZYX'):
  return _math.mat_to_quat(euler_to_rmat(euler_vec, ordering))


def rmat_to_euler(rmat, ordering: str = 'ZYX'):
  """3x3 rotation matrix -> Euler angles for the given ordering."""
  r = rmat
  if ordering == 'ZYX':
    sy = -r[..., 2, 0]
    cy = jnp.sqrt(jnp.maximum(r[..., 0, 0] ** 2 + r[..., 1, 0] ** 2, 1e-24))
    z = jnp.arctan2(r[..., 1, 0], r[..., 0, 0])
    y = jnp.arctan2(sy, cy)
    x = jnp.arctan2(r[..., 2, 1], r[..., 2, 2])
    return jnp.stack([z, y, x], -1)
  if ordering == 'XYZ':
    sy = r[..., 0, 2]
    cy = jnp.sqrt(jnp.maximum(r[..., 0, 0] ** 2 + r[..., 0, 1] ** 2, 1e-24))
    x = jnp.arctan2(-r[..., 1, 2], r[..., 2, 2])
    y = jnp.arctan2(sy, cy)
    z = jnp.arctan2(-r[..., 0, 1], r[..., 0, 0])
    return jnp.stack([x, y, z], -1)
  if ordering == 'ZXY':
    sx = r[..., 2, 1]
    cx = jnp.sqrt(jnp.maximum(r[..., 0, 1] ** 2 + r[..., 1, 1] ** 2, 1e-24))
    z = jnp.arctan2(-r[..., 0, 1], r[..., 1, 1])
    x = jnp.arctan2(sx, cx)
    y = jnp.arctan2(-r[..., 2, 0], r[..., 2, 2])
    return jnp.stack([z, x, y], -1)
  # the remaining four orderings mirror the reference's extraction rules
  # (transformations.py:93-238) in their non-degenerate branch; gimbal
  # poles resolve via arctan2 rather than the reference's special-cased
  # warnings (jit-safe, same values away from the poles)
  if ordering == 'XYX':
    y = jnp.arccos(jnp.clip(r[..., 0, 0], -1.0, 1.0))
    x0 = jnp.arctan2(r[..., 1, 0], -r[..., 2, 0])
    x1 = jnp.arctan2(r[..., 0, 1], r[..., 0, 2])
    return jnp.stack([x0, y, x1], -1)
  if ordering == 'XZY':
    y = jnp.arctan2(r[..., 0, 2], r[..., 0, 0])
    z = -jnp.arcsin(jnp.clip(r[..., 0, 1], -1.0, 1.0))
    x = jnp.arctan2(r[..., 2, 1], r[..., 1, 1])
    return jnp.stack([x, z, y], -1)
  if ordering == 'YZX':
    x = -jnp.arctan2(r[..., 1, 2], r[..., 1, 1])
    z = jnp.arcsin(jnp.clip(r[..., 1, 0], -1.0, 1.0))
    y = -jnp.arctan2(r[..., 2, 0], r[..., 0, 0])
    return jnp.stack([y, z, x], -1)
  if ordering == 'YXZ':
    z = jnp.arctan2(r[..., 1, 0], r[..., 1, 1])
    x = -jnp.arcsin(jnp.clip(r[..., 1, 2], -1.0, 1.0))
    y = jnp.arctan2(r[..., 0, 2], r[..., 2, 2])
    return jnp.stack([y, x, z], -1)
  raise NotImplementedError(f'rmat_to_euler ordering {ordering}')


def quat_to_euler(q, ordering: str = 'ZYX'):
  return rmat_to_euler(_math.quat_to_mat(q), ordering)


def quat_log(q, tol: float = 1e-10):
  """Quaternion logarithm (reference transformations.py:371 semantics)."""
  q_norm = jnp.sqrt(jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True),
                                tol))
  a = q[..., 0:1]
  v = q[..., 1:]
  v_norm = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True),
                                tol))
  angle = jnp.arccos(jnp.clip(a / q_norm, -1.0, 1.0))
  return jnp.concatenate([jnp.log(q_norm), v / v_norm * angle], axis=-1)


def _embed4(r3, full: bool):
  if not full:
    return r3
  out = jnp.zeros(r3.shape[:-2] + (4, 4), r3.dtype)
  out = out.at[..., :3, :3].set(r3)
  return out.at[..., 3, 3].set(1.0)


def rotation_x_axis(theta, full: bool = False):
  """Rotation about X; full=True embeds into a 4x4 homogeneous matrix."""
  return _embed4(_axis_rot('X', jnp.asarray(theta)), full)


def rotation_y_axis(theta, full: bool = False):
  return _embed4(_axis_rot('Y', jnp.asarray(theta)), full)


def rotation_z_axis(theta, full: bool = False):
  return _embed4(_axis_rot('Z', jnp.asarray(theta)), full)


def rotation_matrix_2d(theta):
  ct = jnp.cos(theta)
  st = jnp.sin(theta)
  return jnp.stack([jnp.stack([ct, -st], -1),
                    jnp.stack([st, ct], -1)], -2)


def pos_quat_to_hmat(pos, quat):
  """Position + quaternion -> 4x4 homogeneous transform."""
  out = quat_to_mat(quat)
  return out.at[..., :3, 3].set(pos)


def hmat_inv(h):
  r = h[..., :3, :3]
  p = h[..., :3, 3]
  rt = jnp.swapaxes(r, -1, -2)
  out = jnp.zeros_like(h)
  out = out.at[..., :3, :3].set(rt)
  out = out.at[..., :3, 3].set(-jnp.einsum('...ij,...j->...i', rt, p))
  return out.at[..., 3, 3].set(1.0)
