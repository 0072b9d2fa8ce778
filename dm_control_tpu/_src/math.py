"""Quaternion, rotation and 6-D spatial algebra primitives.

Pure jnp functions, shape-polymorphic over leading batch axes where noted.
Conventions (chosen to match the reference engine's semantics so that
trajectories are comparable; cf. dm_control/utils/transformations.py:66-594
for the quaternion conventions the reference stack exposes):

  * quaternions are (w, x, y, z), unit norm;
  * rotation matrices are world-from-local (R @ v_local = v_world);
  * 6-D motion vectors are [angular(3); linear(3)];
  * 6-D force  vectors are [torque(3);  force(3)];
  * spatial inertia about a frame origin is packed as a 10-vector:
      [Ixx, Ixy, Ixz, Iyy, Iyz, Izz, hx, hy, hz, m]
    where I is the 3x3 rotational inertia about the origin and h = m * c is
    the first mass moment (c = com offset from the origin).

Everything here is elementwise/VPU-friendly; no data-dependent control flow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def f32_dots(fn):
  """Trace `fn` under full-float32 matmul precision.

  TPU's default matmul precision truncates f32 dot operands to bfloat16
  (one MXU pass).  For the physics pipeline that is catastrophic: the
  constraint solver's Newton direction `H^-1 g` computed through bf16
  matmuls lands up to 2.8e+2 scaled-qacc away from the f64 optimum on
  humanoid (measured on a v5e chip), while the same code at f32 precision
  sits at the f32 conditioning floor (~5e-3 max, ~2e-5 mean).  The physics
  matmuls are small (nv- and nefc-sized contractions), so the 3-6 extra
  MXU passes are not on the critical path.  Applied at every engine entry
  point; the context is a trace-time setting, so wrapping the outermost
  call covers everything traced inside (but NOT separately-traced inner
  jits, hence the explicit wraps on solver entry points too)."""
  @functools.wraps(fn)
  def wrapper(*args, **kwargs):
    with jax.default_matmul_precision('float32'):
      return fn(*args, **kwargs)
  return wrapper


# ---------------------------------------------------------------------------
# Vectors.
# ---------------------------------------------------------------------------


def safe_set(arr: jax.Array, idx, values) -> jax.Array:
  """arr.at[idx].set(values) with a fusion barrier on the updates.

  The current XLA:TPU build miscompiles vmapped scatters whose update
  computation fuses gathers of MULTIPLE source arrays (observed: updates
  `q[i] + c*v[i]` lowering to `v[i] + c*v[i]`).  An optimization barrier
  on the update operand blocks that fusion; measured cost is negligible
  (the scatters sit between matmul-bound stages)."""
  return arr.at[idx].set(jax.lax.optimization_barrier(values))


def safe_add(arr: jax.Array, idx, values) -> jax.Array:
  """arr.at[idx].add(values) with the same fusion barrier as safe_set."""
  return arr.at[idx].add(jax.lax.optimization_barrier(values))


def normalize(v: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
  """Safe unit-normalization along `axis`."""
  n = jnp.linalg.norm(v, axis=axis, keepdims=True)
  return v / jnp.maximum(n, eps)


def norm_safe(v: jax.Array, axis: int = -1) -> jax.Array:
  """Norm with a gradient-safe sqrt (0 at 0)."""
  sq = jnp.sum(v * v, axis=axis)
  return jnp.sqrt(jnp.maximum(sq, 0.0))


def skew(v: jax.Array) -> jax.Array:
  """3-vector -> 3x3 cross-product matrix, skew(v) @ u == cross(v, u)."""
  x, y, z = v[..., 0], v[..., 1], v[..., 2]
  zero = jnp.zeros_like(x)
  return jnp.stack(
      [
          jnp.stack([zero, -z, y], axis=-1),
          jnp.stack([z, zero, -x], axis=-1),
          jnp.stack([-y, x, zero], axis=-1),
      ],
      axis=-2,
  )


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z).
# ---------------------------------------------------------------------------


def quat_identity(dtype=jnp.float32) -> jax.Array:
  return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_mul(q: jax.Array, p: jax.Array) -> jax.Array:
  """Hamilton product q * p."""
  qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  pw, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
  return jnp.stack(
      [
          qw * pw - qx * px - qy * py - qz * pz,
          qw * px + qx * pw + qy * pz - qz * py,
          qw * py - qx * pz + qy * pw + qz * px,
          qw * pz + qx * py - qy * px + qz * pw,
      ],
      axis=-1,
  )


def quat_conj(q: jax.Array) -> jax.Array:
  return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
  """Rotate vector v by quaternion q (world = q * v_local)."""
  # v' = v + 2*w*(u x v) + 2*(u x (u x v)),  u = q.xyz
  u = q[..., 1:]
  w = q[..., 0:1]
  uv = jnp.cross(u, v)
  return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q: jax.Array, v: jax.Array) -> jax.Array:
  return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jax.Array) -> jax.Array:
  """Unit quaternion -> 3x3 rotation matrix."""
  w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  xx, yy, zz = x * x, y * y, z * z
  wx, wy, wz = w * x, w * y, w * z
  xy, xz, yz = x * y, x * z, y * z
  return jnp.stack(
      [
          jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1),
          jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1),
          jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1),
      ],
      axis=-2,
  )


def mul33(a: jax.Array, b: jax.Array) -> jax.Array:
  """Batched (...,3,3) @ (...,3,3) as fused elementwise multiply-adds.

  XLA:TPU lowers tiny batched dots/einsums to convolutions bracketed by
  layout-transpose copies (profiled ~2 ms/substep on humanoid@4096 for
  the geom-frame einsums alone); the explicit 3-term broadcast form
  fuses into neighboring elementwise work instead."""
  return (a[..., :, 0:1] * b[..., 0:1, :]
          + a[..., :, 1:2] * b[..., 1:2, :]
          + a[..., :, 2:3] * b[..., 2:3, :])


def rot3(a: jax.Array, v: jax.Array) -> jax.Array:
  """Batched (...,3,3) @ (...,3) matvec in fused elementwise form."""
  return (a[..., :, 0] * v[..., 0:1] + a[..., :, 1] * v[..., 1:2]
          + a[..., :, 2] * v[..., 2:3])


def mat_to_quat(m: jax.Array) -> jax.Array:
  """3x3 rotation matrix -> unit quaternion (w,x,y,z), branch-free.

  Uses the four-hypothesis construction and selects the numerically best
  (largest pivot) with `where` so it is jit/vmap safe.
  """
  m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
  m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
  m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
  tr = m00 + m11 + m22

  def stack4(a, b, c, d):
    return jnp.stack([a, b, c, d], axis=-1)

  qw = stack4(1.0 + tr, m21 - m12, m02 - m20, m10 - m01)
  qx = stack4(m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20)
  qy = stack4(m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21)
  qz = stack4(m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22)

  cases = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 cases, 4)
  pivots = jnp.stack(
      [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22,
       1.0 - m00 - m11 + m22],
      axis=-1,
  )
  best = jnp.argmax(pivots, axis=-1)
  q = jnp.take_along_axis(cases, best[..., None, None], axis=-2)[..., 0, :]
  q = normalize(q)
  # Canonical sign: w >= 0.
  return jnp.where(q[..., 0:1] < 0, -q, q)


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
  """Unit axis + angle -> quaternion."""
  half = angle * 0.5
  s = jnp.sin(half)
  return jnp.concatenate(
      [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
  )


def quat_integrate(q: jax.Array, omega: jax.Array, dt) -> jax.Array:
  """Integrate quaternion by angular velocity `omega` (local frame) over dt.

  Matches the reference engine's expmap integration semantics: the rotation
  increment is exp(omega * dt) applied on the right (omega expressed in the
  child/local frame), with safe small-angle handling.
  """
  theta = norm_safe(omega) * dt
  axis = normalize(omega)
  dq = axis_angle_to_quat(axis, theta)
  nq = quat_mul(q, dq)
  # Avoid NaN axis when omega == 0.
  nq = jnp.where(theta[..., None] > 0.0, nq, q)
  return normalize(nq)


def _quat_log_vel(dq: jax.Array) -> jax.Array:
  """2 * log(dq) as an axis*angle 3-vector, angle wrapped to [-pi, pi]."""
  sin_half = norm_safe(dq[..., 1:])
  axis = normalize(dq[..., 1:])
  angle = 2.0 * jnp.arctan2(sin_half, dq[..., 0])
  angle = jnp.where(angle > jnp.pi, angle - 2 * jnp.pi, angle)
  return axis * angle[..., None]


def quat_sub(qa: jax.Array, qb: jax.Array) -> jax.Array:
  """Velocity (3-vector, LOCAL frame of qb) that takes qb to qa in unit
  time (mju_subQuat semantics)."""
  return _quat_log_vel(quat_mul(quat_conj(qb), qa))


def quat_sub_world(qa: jax.Array, qb: jax.Array) -> jax.Array:
  """WORLD-frame velocity taking qb to qa in unit time: log(qa * qb^-1).

  This is the frame the angular-velocity Jacobian (cdof-based jacr) is
  expressed in — the reference's IK builds exactly this error
  (mju_mulQuat(err, target, neg(site)) + mju_quat2Vel,
  utils/inverse_kinematics.py:160-165 there)."""
  return _quat_log_vel(quat_mul(qa, quat_conj(qb)))


# ---------------------------------------------------------------------------
# 6-D spatial algebra ([angular; linear] motion, [torque; force] force).
# ---------------------------------------------------------------------------


def motion_cross(v: jax.Array, m: jax.Array) -> jax.Array:
  """Spatial cross product of motion vectors: v x m."""
  vang, vlin = v[..., :3], v[..., 3:]
  mang, mlin = m[..., :3], m[..., 3:]
  ang = jnp.cross(vang, mang)
  lin = jnp.cross(vlin, mang) + jnp.cross(vang, mlin)
  return jnp.concatenate([ang, lin], axis=-1)


def motion_cross_force(v: jax.Array, f: jax.Array) -> jax.Array:
  """Spatial cross product applied to a force vector: v x* f."""
  vang, vlin = v[..., :3], v[..., 3:]
  ftrq, flin = f[..., :3], f[..., 3:]
  trq = jnp.cross(vang, ftrq) + jnp.cross(vlin, flin)
  lin = jnp.cross(vang, flin)
  return jnp.concatenate([trq, lin], axis=-1)


def transform_motion(
    vec: jax.Array, offset: jax.Array, rot: jax.Array | None = None
) -> jax.Array:
  """Translate (and optionally rotate) a motion vector to a new frame origin.

  `offset` = new_origin - old_origin, in the common/world frame.
  With rot=None this is pure translation:
    ang' = ang;  lin' = lin - offset x ang.
  """
  ang, lin = vec[..., :3], vec[..., 3:]
  # translate in the common frame first, then rotate into the new frame
  lin = lin - jnp.cross(offset, ang)
  if rot is not None:
    ang = jnp.einsum('...ij,...j->...i', rot, ang)
    lin = jnp.einsum('...ij,...j->...i', rot, lin)
  return jnp.concatenate([ang, lin], axis=-1)


def transform_force(
    vec: jax.Array, offset: jax.Array, rot: jax.Array | None = None
) -> jax.Array:
  """Translate (and optionally rotate) a force vector to a new frame origin.

  `offset` = new_origin - old_origin, in the common/world frame:
    lin' = lin;  trq' = trq - offset x lin.
  """
  trq, lin = vec[..., :3], vec[..., 3:]
  trq = trq - jnp.cross(offset, lin)
  if rot is not None:
    trq = jnp.einsum('...ij,...j->...i', rot, trq)
    lin = jnp.einsum('...ij,...j->...i', rot, lin)
  return jnp.concatenate([trq, lin], axis=-1)


# --- 10-vector spatial inertia -------------------------------------------


def inert_pack(inertia: jax.Array, h: jax.Array, mass: jax.Array) -> jax.Array:
  """Pack (3x3 inertia about origin, first moment h=m*c, mass) -> 10-vector."""
  i = jnp.stack(
      [
          inertia[..., 0, 0], inertia[..., 0, 1], inertia[..., 0, 2],
          inertia[..., 1, 1], inertia[..., 1, 2], inertia[..., 2, 2],
      ],
      axis=-1,
  )
  return jnp.concatenate([i, h, mass[..., None]], axis=-1)


def inert_unpack(cin: jax.Array):
  """10-vector -> (3x3 inertia, h, mass)."""
  ixx, ixy, ixz = cin[..., 0], cin[..., 1], cin[..., 2]
  iyy, iyz, izz = cin[..., 3], cin[..., 4], cin[..., 5]
  inertia = jnp.stack(
      [
          jnp.stack([ixx, ixy, ixz], -1),
          jnp.stack([ixy, iyy, iyz], -1),
          jnp.stack([ixz, iyz, izz], -1),
      ],
      axis=-2,
  )
  return inertia, cin[..., 6:9], cin[..., 9]


def inert_from_body(
    mass: jax.Array, diag_inertia: jax.Array, imat: jax.Array, ipos: jax.Array
) -> jax.Array:
  """Spatial inertia 10-vector about a frame origin.

  Args:
    mass: (...,) body mass.
    diag_inertia: (..., 3) principal rotational inertia at the com.
    imat: (..., 3, 3) rotation world-from-inertial (principal axes).
    ipos: (..., 3) com position relative to the frame origin (world frame).
  """
  # I_origin = R diag R^T + m * (c.c 1 - c c^T)   (parallel axis)
  r = imat
  i_com = jnp.einsum(
      '...ik,...k,...jk->...ij', r, diag_inertia, r
  )
  c = ipos
  cc = jnp.einsum('...i,...j->...ij', c, c)
  c2 = jnp.sum(c * c, axis=-1)[..., None, None]
  eye = jnp.eye(3, dtype=mass.dtype)
  i_origin = i_com + mass[..., None, None] * (c2 * eye - cc)
  h = mass[..., None] * c
  return inert_pack(i_origin, h, mass)


def inert_mul(cin: jax.Array, vec: jax.Array) -> jax.Array:
  """Multiply 10-vector spatial inertia by a motion vector -> force vector.

  f = [I w + h x v;  m v - h x w]   with vec = [w; v].
  """
  inertia, h, mass = inert_unpack(cin)
  w, v = vec[..., :3], vec[..., 3:]
  trq = jnp.einsum('...ij,...j->...i', inertia, w) + jnp.cross(h, v)
  lin = mass[..., None] * v - jnp.cross(h, w)
  return jnp.concatenate([trq, lin], axis=-1)


def inert_translate(cin: jax.Array, offset: jax.Array) -> jax.Array:
  """Re-express a 10-vector inertia about origin shifted by `offset`.

  new_origin = old_origin + offset.  c_new = c_old - offset.
  """
  inertia, h, mass = inert_unpack(cin)
  m = mass[..., None]
  c_old = h / jnp.maximum(m, 1e-12)
  c_new = c_old - offset
  eye = jnp.eye(3, dtype=cin.dtype)

  def paxis(c):
    cc = jnp.einsum('...i,...j->...ij', c, c)
    c2 = jnp.sum(c * c, axis=-1)[..., None, None]
    return c2 * eye - cc

  i_com = inertia - mass[..., None, None] * paxis(c_old)
  i_new = i_com + mass[..., None, None] * paxis(c_new)
  return inert_pack(i_new, m * c_new, mass)


# ---------------------------------------------------------------------------
# Misc.
# ---------------------------------------------------------------------------


def closest_segment_point(
    a: jax.Array, b: jax.Array, pt: jax.Array
) -> jax.Array:
  """Closest point on segment [a, b] to point pt."""
  ab = b - a
  denom = jnp.sum(ab * ab, axis=-1, keepdims=True)
  t = jnp.sum((pt - a) * ab, axis=-1, keepdims=True) / jnp.maximum(
      denom, 1e-12
  )
  t = jnp.clip(t, 0.0, 1.0)
  return a + t * ab


def closest_segment_to_segment_points(p1, q1, p2, q2):
  """Closest points between segments [p1,q1] and [p2,q2] (branch-free)."""
  d1 = q1 - p1
  d2 = q2 - p2
  r = p1 - p2
  a = jnp.sum(d1 * d1, -1)
  e = jnp.sum(d2 * d2, -1)
  f = jnp.sum(d2 * r, -1)
  c = jnp.sum(d1 * r, -1)
  b = jnp.sum(d1 * d2, -1)
  denom = a * e - b * b
  eps = 1e-12
  s = jnp.where(denom > eps, (b * f - c * e) / jnp.maximum(denom, eps), 0.0)
  s = jnp.clip(s, 0.0, 1.0)
  t = (b * s + f) / jnp.maximum(e, eps)
  t_clipped = jnp.clip(t, 0.0, 1.0)
  # re-project s for clamped t
  s = jnp.clip((b * t_clipped - c) / jnp.maximum(a, eps), 0.0, 1.0)
  pa = p1 + d1 * s[..., None]
  pb = p2 + d2 * t_clipped[..., None]
  return pa, pb
