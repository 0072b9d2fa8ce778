"""Vectorized narrowphase colliders.

Each (GeomType, GeomType) group is collided as one batched, branch-free
computation over its static candidate-pair list; results land in the padded
Contact buffer in the fixed order produced by collision.groups.
Contact parameter combination (friction/solref/solimp/condim mixing)
follows the reference's documented rules and is validated against the
oracle in tests/test_constraint.py and tests/test_step.py.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import math
from dm_control_tpu._src.types import Contact, Data, GeomType, Model


# ---------------------------------------------------------------------------
# Contact parameter combination (host-side, static per pair).
# ---------------------------------------------------------------------------


def _combine_params(m: Model, g1: int, g2: int, pairinfo):
  """(condim, friction(5), solref(2), solimp(5), margin, gap) for a pair."""
  if pairinfo is not None:
    return (pairinfo['condim'], pairinfo['friction'], pairinfo['solref'],
            pairinfo['solimp'], pairinfo['margin'], pairinfo['gap'])
  p1, p2 = int(m.geom_priority[g1]), int(m.geom_priority[g2])
  if p1 != p2:
    g = g1 if p1 > p2 else g2
    condim = int(m.geom_condim[g])
    fr3 = m.geom_friction[g]
    solref = m.geom_solref[g]
    solimp = m.geom_solimp[g]
  else:
    condim = max(int(m.geom_condim[g1]), int(m.geom_condim[g2]))
    fr3 = np.maximum(m.geom_friction[g1], m.geom_friction[g2])
    # solmix weighting
    s1, s2 = float(m.geom_solmix[g1]), float(m.geom_solmix[g2])
    mix = s1 / (s1 + s2) if (s1 + s2) > 1e-12 else 0.5
    if m.geom_solref[g1, 0] > 0 and m.geom_solref[g2, 0] > 0:
      solref = mix * m.geom_solref[g1] + (1 - mix) * m.geom_solref[g2]
    else:
      solref = np.minimum(m.geom_solref[g1], m.geom_solref[g2])
    solimp = mix * m.geom_solimp[g1] + (1 - mix) * m.geom_solimp[g2]
  friction = np.array([fr3[0], fr3[0], fr3[1], fr3[2], fr3[2]])
  margin = max(float(m.geom_margin[g1]), float(m.geom_margin[g2]))
  gap = max(float(m.geom_gap[g1]), float(m.geom_gap[g2]))
  return condim, friction, solref, solimp, margin, gap


# ---------------------------------------------------------------------------
# Frame construction.
# ---------------------------------------------------------------------------


def make_frame(normal: jax.Array) -> jax.Array:
  """(..., 3, 3) frame with rows (normal, tangent1, tangent2).

  Exactly the oracle's mju_makeFrame (solved empirically over random
  normals: 800/800 match): auxiliary seed is the world y axis unless
  |n_y| > 0.5, in which case z; then t2 = normalize(n x seed),
  t1 = t2 x n.  The pyramidal cone is tangent-basis-dependent, so
  matching this construction is required for contact-force parity.
  """
  n = math.normalize(normal)
  z = jnp.broadcast_to(jnp.array([0.0, 0, 1], n.dtype), n.shape)
  y = jnp.broadcast_to(jnp.array([0.0, 1, 0], n.dtype), n.shape)
  seed = jnp.where(jnp.abs(n[..., 1:2]) > 0.5, z, y)
  t2 = math.normalize(jnp.cross(n, seed))
  t1 = jnp.cross(t2, n)
  return jnp.stack([n, t1, t2], axis=-2)


# ---------------------------------------------------------------------------
# Per-type-pair colliders.  Each takes stacked geom world poses/sizes for
# its group and returns (dist, pos, normal) with a fixed contacts-per-pair.
# ---------------------------------------------------------------------------


def _plane_sphere(p_pos, p_mat, p_size, s_pos, s_mat, s_size):
  n = p_mat[..., :, 2]
  vec = s_pos - p_pos
  h = jnp.sum(n * vec, -1)
  r = s_size[..., 0]
  dist = h - r
  pos = s_pos - n * (r + dist / 2)[..., None]
  return dist[..., None], pos[..., None, :], n[..., None, :]


def _plane_capsule(p_pos, p_mat, p_size, c_pos, c_mat, c_size):
  n = p_mat[..., :, 2]
  axis = c_mat[..., :, 2]
  r = c_size[..., 0]
  hl = c_size[..., 1]
  # oracle frame: t1 = capsule axis projected onto the plane (fallback to
  # the generic frame when the axis is near the normal)
  axp = axis - n * jnp.sum(axis * n, -1, keepdims=True)
  ok = jnp.sum(axp * axp, -1, keepdims=True) > 1e-12
  t1 = jnp.where(ok, math.normalize(axp), make_frame(n)[..., 1, :])
  t2 = jnp.cross(n, t1)
  frame = jnp.stack([n, t1, t2], axis=-2)
  dists, poss, frames = [], [], []
  for sign in (1.0, -1.0):
    end = c_pos + sign * hl[..., None] * axis
    h = jnp.sum(n * (end - p_pos), -1)
    dist = h - r
    pos = end - n * (r + dist / 2)[..., None]
    dists.append(dist)
    poss.append(pos)
    frames.append(frame)
  return (jnp.stack(dists, -1), jnp.stack(poss, -2),
          jnp.stack(frames, -3))


def _plane_ellipsoid(p_pos, p_mat, p_size, e_pos, e_mat, e_size):
  n = p_mat[..., :, 2]
  # support point of ellipsoid in -n direction
  nl = jnp.einsum('...ij,...i->...j', e_mat, n)  # n in ellipsoid frame
  denom = math.norm_safe(nl * e_size)
  sp_l = -(e_size * e_size * nl) / jnp.maximum(denom, 1e-12)[..., None]
  sp = e_pos + jnp.einsum('...ij,...j->...i', e_mat, sp_l)
  h = jnp.sum(n * (sp - p_pos), -1)
  dist = h
  pos = sp - n * (dist / 2)[..., None]
  return dist[..., None], pos[..., None, :], n[..., None, :]


def _plane_cylinder(p_pos, p_mat, p_size, c_pos, c_mat, c_size):
  """Up to 4 contacts: two rim points at each end cap (approximate rim)."""
  n = p_mat[..., :, 2]
  axis = c_mat[..., :, 2]
  r = c_size[..., 0]
  hl = c_size[..., 1]
  # radial direction: project -n onto plane perpendicular to axis
  proj = -n + axis * jnp.sum(n * axis, -1, keepdims=True)
  pnorm = math.norm_safe(proj)
  # if axis ~ parallel to n, radial dir arbitrary
  safe = (pnorm > 1e-8)[..., None]
  radial = jnp.where(safe, proj / jnp.maximum(pnorm, 1e-12)[..., None],
                     c_mat[..., :, 0])
  dists, poss, ns = [], [], []
  for sign_end in (1.0, -1.0):
    end = c_pos + sign_end * hl[..., None] * axis
    for sign_rad in (1.0, -1.0):
      p = end + sign_rad * r[..., None] * radial
      h = jnp.sum(n * (p - p_pos), -1)
      dists.append(h)
      poss.append(p - n * (h / 2)[..., None])
      ns.append(n)
  return (jnp.stack(dists, -1), jnp.stack(poss, -2), jnp.stack(ns, -2))


def _plane_box(p_pos, p_mat, p_size, b_pos, b_mat, b_size):
  """4 deepest corners."""
  n = p_mat[..., :, 2]
  corners = []
  heights = []
  for sx in (-1.0, 1.0):
    for sy in (-1.0, 1.0):
      for sz in (-1.0, 1.0):
        local = jnp.stack([sx * b_size[..., 0], sy * b_size[..., 1],
                           sz * b_size[..., 2]], -1)
        c = b_pos + jnp.einsum('...ij,...j->...i', b_mat, local)
        corners.append(c)
        heights.append(jnp.sum(n * (c - p_pos), -1))
  corners = jnp.stack(corners, -2)  # (..., 8, 3)
  heights = jnp.stack(heights, -1)  # (..., 8)
  # pick 4 smallest heights
  idx = jnp.argsort(heights, axis=-1)[..., :4]
  dist = jnp.take_along_axis(heights, idx, axis=-1)
  pos = jnp.take_along_axis(corners, idx[..., None], axis=-2)
  pos = pos - n[..., None, :] * (dist / 2)[..., None]
  ns = jnp.broadcast_to(n[..., None, :], pos.shape)
  return dist, pos, ns


def _sphere_sphere(pos1, mat1, size1, pos2, mat2, size2):
  r1, r2 = size1[..., 0], size2[..., 0]
  vec = pos2 - pos1
  n = math.normalize(vec)
  dist = math.norm_safe(vec) - r1 - r2
  pos = pos1 + n * (r1 + dist / 2)[..., None]
  return dist[..., None], pos[..., None, :], n[..., None, :]


def _sphere_capsule(s_pos, s_mat, s_size, c_pos, c_mat, c_size):
  axis = c_mat[..., :, 2]
  hl = c_size[..., 1:2]
  a = c_pos - hl * axis
  b = c_pos + hl * axis
  closest = math.closest_segment_point(a, b, s_pos)
  d, p, n = _sphere_sphere(
      s_pos, s_mat, s_size, closest, c_mat,
      jnp.broadcast_to(c_size, s_size.shape))
  return d, p, n


def _capsule_capsule(pos1, mat1, size1, pos2, mat2, size2):
  ax1 = mat1[..., :, 2]
  ax2 = mat2[..., :, 2]
  h1, h2 = size1[..., 1:2], size2[..., 1:2]
  p1, q1 = pos1 - h1 * ax1, pos1 + h1 * ax1
  p2, q2 = pos2 - h2 * ax2, pos2 + h2 * ax2
  c1, c2 = math.closest_segment_to_segment_points(p1, q1, p2, q2)
  r1, r2 = size1[..., 0], size2[..., 0]
  vec = c2 - c1
  n = math.normalize(vec)
  dist = math.norm_safe(vec) - r1 - r2
  pos = c1 + n * (r1 + dist / 2)[..., None]
  # second slot: inactive padding
  big = jnp.full_like(dist, 1e10)
  dists = jnp.stack([dist, big], -1)
  poss = jnp.stack([pos, pos], -2)
  ns = jnp.stack([n, n], -2)
  return dists, poss, ns


def _sphere_box(s_pos, s_mat, s_size, b_pos, b_mat, b_size):
  r = s_size[..., 0]
  local = jnp.einsum('...ij,...i->...j', b_mat, s_pos - b_pos)
  clamped = jnp.clip(local, -b_size, b_size)
  inside = jnp.all(jnp.abs(local) < b_size, -1)
  # outside: closest point on surface
  vec_out = local - clamped
  d_out = math.norm_safe(vec_out)
  n_out_l = vec_out / jnp.maximum(d_out, 1e-12)[..., None]
  # inside: push out along smallest penetration axis
  depth = b_size - jnp.abs(local)
  axis = jnp.argmin(depth, -1)
  sgn = jnp.sign(jnp.take_along_axis(local, axis[..., None], -1))[..., 0]
  n_in_l = (jax.nn.one_hot(axis, 3, dtype=local.dtype)
            * sgn[..., None])
  d_in = -jnp.take_along_axis(depth, axis[..., None], -1)[..., 0]
  surf_in = jnp.where(
      jax.nn.one_hot(axis, 3, dtype=local.dtype) > 0,
      sgn[..., None] * b_size, local)
  dist = jnp.where(inside, d_in, d_out) - r
  n_l = jnp.where(inside[..., None], n_in_l, n_out_l)
  surf_l = jnp.where(inside[..., None], surf_in, clamped)
  n = jnp.einsum('...ij,...j->...i', b_mat, -n_l)  # from sphere to box
  surf = b_pos + jnp.einsum('...ij,...j->...i', b_mat, surf_l)
  # midpoint between the box surface point and the sphere surface point
  pos = (surf + s_pos + n * r[..., None]) / 2
  return dist[..., None], pos[..., None, :], n[..., None, :]


def _sphere_ellipsoid(s_pos, s_mat, s_size, e_pos, e_mat, e_size):
  """Sphere vs ellipsoid via radial surface projection (approximate
  closest point; exact for spheres, good for mildly eccentric bodies)."""
  r_s = s_size[..., 0]
  local = jnp.einsum('...ij,...i->...j', e_mat, s_pos - e_pos)
  u = local / e_size
  un = math.norm_safe(u)
  surf_l = e_size * (u / jnp.maximum(un, 1e-12)[..., None])
  # gradient of the ellipsoid implicit function = outward normal
  n_l = math.normalize(surf_l / (e_size * e_size))
  inside = un < 1.0
  diff = local - surf_l
  d_out = math.norm_safe(diff)
  dist = jnp.where(inside, -d_out, d_out) - r_s
  n = jnp.einsum('...ij,...j->...i', e_mat, -n_l)  # sphere -> ellipsoid
  surf = e_pos + jnp.einsum('...ij,...j->...i', e_mat, surf_l)
  pos = (surf + s_pos + n * r_s[..., None]) / 2
  return dist[..., None], pos[..., None, :], n[..., None, :]


def _capsule_ellipsoid(c_pos, c_mat, c_size, e_pos, e_mat, e_size):
  """Capsule vs ellipsoid: sphere-ellipsoid at the closest segment point."""
  axis = c_mat[..., :, 2]
  hl = c_size[..., 1:2]
  a = c_pos - hl * axis
  b = c_pos + hl * axis
  closest = math.closest_segment_point(a, b, e_pos)
  return _sphere_ellipsoid(closest, c_mat, c_size, e_pos, e_mat, e_size)


def _ellipsoid_ellipsoid(pos1, mat1, size1, pos2, mat2, size2):
  """Ellipsoid pair via directional effective radii (approximate)."""
  vec = pos2 - pos1
  n = math.normalize(vec)
  # effective radius of each ellipsoid along the center line
  d1 = jnp.einsum('...ij,...i->...j', mat1, n)
  d2 = jnp.einsum('...ij,...i->...j', mat2, n)
  r1 = 1.0 / jnp.maximum(math.norm_safe(d1 / size1), 1e-12)
  r2 = 1.0 / jnp.maximum(math.norm_safe(d2 / size2), 1e-12)
  dist = math.norm_safe(vec) - r1 - r2
  pos = pos1 + n * (r1 + dist / 2)[..., None]
  return dist[..., None], pos[..., None, :], n[..., None, :]


def _sphere_cylinder(s_pos, s_mat, s_size, c_pos, c_mat, c_size):
  """Sphere vs solid cylinder: side, cap, and rim cases, branch-free."""
  r_s = s_size[..., 0]
  R = c_size[..., 0]
  hl = c_size[..., 1]
  local = jnp.einsum('...ij,...i->...j', c_mat, s_pos - c_pos)
  xy = local[..., :2]
  z = local[..., 2]
  r_xy = math.norm_safe(xy)
  u_xy = xy / jnp.maximum(r_xy, 1e-12)[..., None]

  inside = (r_xy < R) & (jnp.abs(z) < hl)
  # outside: clamp to the solid cylinder
  xy_c = jnp.where((r_xy > R)[..., None], u_xy * R[..., None], xy)
  z_c = jnp.clip(z, -hl, hl)
  closest_out = jnp.concatenate([xy_c, z_c[..., None]], -1)
  d_out = math.norm_safe(local - closest_out)
  n_out = (local - closest_out) / jnp.maximum(d_out, 1e-12)[..., None]

  # inside: push out through the nearest face (side vs cap)
  d_side = R - r_xy
  d_cap = hl - jnp.abs(z)
  use_side = d_side < d_cap
  n_in = jnp.where(
      use_side[..., None],
      jnp.concatenate([u_xy, jnp.zeros_like(z)[..., None]], -1),
      jnp.concatenate([jnp.zeros_like(xy),
                       jnp.sign(z)[..., None]], -1))
  d_in = -jnp.where(use_side, d_side, d_cap)
  closest_in = jnp.where(
      use_side[..., None],
      jnp.concatenate([u_xy * R[..., None], z[..., None]], -1),
      jnp.concatenate([xy, (jnp.sign(z) * hl)[..., None]], -1))

  dist = jnp.where(inside, d_in, d_out) - r_s
  n_l = jnp.where(inside[..., None], n_in, n_out)
  surf_l = jnp.where(inside[..., None], closest_in, closest_out)
  # normal from sphere (geom1) to cylinder (geom2) = -outward
  n = jnp.einsum('...ij,...j->...i', c_mat, -n_l)
  surf = c_pos + jnp.einsum('...ij,...j->...i', c_mat, surf_l)
  pos = (surf + s_pos + n * r_s[..., None]) / 2
  return dist[..., None], pos[..., None, :], n[..., None, :]


def _capsule_cylinder(cp_pos, cp_mat, cp_size, cy_pos, cy_mat, cy_size):
  """Capsule vs cylinder: sphere-cylinder at the closest capsule point."""
  ax_cp = cp_mat[..., :, 2]
  ax_cy = cy_mat[..., :, 2]
  h_cp = cp_size[..., 1:2]
  h_cy = cy_size[..., 1:2]
  p1, q1 = cp_pos - h_cp * ax_cp, cp_pos + h_cp * ax_cp
  p2, q2 = cy_pos - h_cy * ax_cy, cy_pos + h_cy * ax_cy
  c1, _ = math.closest_segment_to_segment_points(p1, q1, p2, q2)
  d, p, n = _sphere_cylinder(c1, cp_mat, cp_size, cy_pos, cy_mat, cy_size)
  big = jnp.full_like(d, 1e10)
  return (jnp.concatenate([d, big], -1),
          jnp.concatenate([p, p], -2),
          jnp.concatenate([n, n], -2))


_RIM_SAMPLES = 8


def _cylinder_cylinder(pos1, mat1, size1, pos2, mat2, size2):
  """Cylinder vs cylinder with true flat caps and sharp rims.

  The reference resolves this pair through its generic convex-convex
  solver (one MPR contact); here: three analytic candidate families,
  emitting the 2 deepest —
    1. side-side: sphere(r1)-at-closest-axis-point vs solid cylinder 2
       (exact for interior side contacts, identical to the capsule
       approximation there);
    2. rims of cylinder 1 (8 samples per rim) vs solid cylinder 2 —
       captures rim-on-cap and rim-in-bore contacts the capsule
       approximation rounds off (the Duplo cylinder-stud case);
    3. rims of cylinder 2 vs solid cylinder 1 (normals flipped).
  """
  dtype = pos1.dtype
  r1 = size1[..., 0]
  h1 = size1[..., 1:2]
  ax1 = mat1[..., :, 2]
  r2 = size2[..., 0]
  h2 = size2[..., 1:2]
  ax2 = mat2[..., :, 2]

  # 1. side-side (capsule-style single contact).  Valid only when the
  # contact is radial on cylinder 1 (the sphere-at-axis-point model
  # rounds the rim, so cap-dominated configurations must fall through
  # to the rim candidates — unconditional use measured a cap-cap stack
  # at -0.09 instead of +0.01)
  p1, q1 = pos1 - h1 * ax1, pos1 + h1 * ax1
  p2, q2 = pos2 - h2 * ax2, pos2 + h2 * ax2
  c1, _ = math.closest_segment_to_segment_points(p1, q1, p2, q2)
  d_ss, pos_ss, n_ss = _sphere_cylinder(
      c1, mat1, size1, pos2, mat2, size2)           # (..., 1), (..., 1, 3)
  align = jnp.abs(jnp.einsum('...i,...i->...', n_ss[..., 0, :], ax1))
  d_ss = jnp.where(align[..., None] < 0.3, d_ss, 1e10)

  def rim_points(pos, mat, r, h):
    """(..., 2*K, 3) world points on both rim circles."""
    ang = np.linspace(0, 2 * np.pi, _RIM_SAMPLES, endpoint=False)
    circ = np.stack([np.cos(ang), np.sin(ang), np.zeros_like(ang)], -1)
    ends = np.array([-1.0, 1.0])
    local = (r[..., None, None, None] * jnp.asarray(circ, dtype)
             + h[..., None, None] * jnp.asarray(ends, dtype)[:, None, None]
             * jnp.asarray([0.0, 0.0, 1.0], dtype))   # (..., 2, K, 3)
    local = local.reshape(local.shape[:-3] + (2 * _RIM_SAMPLES, 3))
    return (pos[..., None, :]
            + jnp.einsum('...ij,...kj->...ki', mat, local))

  def deepest_rim(points, c_pos, c_mat, c_size):
    """Deepest of the sampled points vs a solid cylinder.

    points (..., k, 3) -> (dist (..., 1), pos (..., 1, 3), n (..., 1, 3))
    """
    shape = points.shape[:-1]                        # (..., k)
    cpos_b = jnp.broadcast_to(c_pos[..., None, :], points.shape)
    cmat_b = jnp.broadcast_to(c_mat[..., None, :, :], shape + (3, 3))
    csize_b = jnp.broadcast_to(c_size[..., None, :],
                               shape + (c_size.shape[-1],))
    ssize_b = jnp.zeros(shape + (c_size.shape[-1],), dtype)
    d, p, n = _sphere_cylinder(points, cmat_b, ssize_b,
                               cpos_b, cmat_b, csize_b)
    d = d[..., 0]                                    # (..., k)
    p = p[..., 0, :]                                 # (..., k, 3)
    n = n[..., 0, :]
    i = jnp.argmin(d, axis=-1)
    d_min = jnp.take_along_axis(d, i[..., None], axis=-1)
    p_min = jnp.take_along_axis(p, i[..., None, None], axis=-2)
    n_min = jnp.take_along_axis(n, i[..., None, None], axis=-2)
    return d_min, p_min, n_min

  rims1 = rim_points(pos1, mat1, r1, h1)
  d_r1, p_r1, n_r1 = deepest_rim(rims1, pos2, mat2, size2)
  rims2 = rim_points(pos2, mat2, r2, h2)
  d_r2, p_r2, n_r2 = deepest_rim(rims2, pos1, mat1, size1)
  n_r2 = -n_r2                                       # geom1 -> geom2

  # 4. cap-face candidates: each axis ENDPOINT vs the other solid
  # cylinder.  Needed for coaxial stacks with equal radii, where every
  # rim sample sits exactly on the other side surface (zero-depth side
  # pushes) and nothing above resists along the axis.
  ends1 = jnp.stack([p1, q1], axis=-2)               # (..., 2, 3)
  d_e1, p_e1, n_e1 = deepest_rim(ends1, pos2, mat2, size2)
  ends2 = jnp.stack([p2, q2], axis=-2)
  d_e2, p_e2, n_e2 = deepest_rim(ends2, pos1, mat1, size1)
  n_e2 = -n_e2

  dists = jnp.concatenate([d_ss, d_r1, d_r2, d_e1, d_e2], -1)  # (..., 5)
  poss = jnp.concatenate([pos_ss, p_r1, p_r2, p_e1, p_e2], -2)
  ns = jnp.concatenate([n_ss, n_r1, n_r2, n_e1, n_e2], -2)
  order = jnp.argsort(dists, axis=-1)[..., :2]
  return (jnp.take_along_axis(dists, order, -1),
          jnp.take_along_axis(poss, order[..., None], -2),
          jnp.take_along_axis(ns, order[..., None], -2))


def _capsule_box(c_pos, c_mat, c_size, b_pos, b_mat, b_size):
  """Two sphere-box tests at segment ends + closest interior point."""
  axis = c_mat[..., :, 2]
  hl = c_size[..., 1:2]
  outs = []
  for t in (-1.0, 1.0):
    p = c_pos + t * hl * axis
    d, pos, n = _sphere_box(p, c_mat, c_size, b_pos, b_mat, b_size)
    outs.append((d, pos, n))
  dists = jnp.concatenate([o[0] for o in outs], -1)
  poss = jnp.concatenate([o[1] for o in outs], -2)
  ns = jnp.concatenate([o[2] for o in outs], -2)
  return dists, poss, ns


def _clip_polygon(pts, valid, n, c):
  """Sutherland-Hodgman half-space clip of a padded polygon.

  pts (K,2), valid (K,) -> clipped polygon against n.x <= c, padded to
  the same K (callers size K to the worst case)."""
  K = pts.shape[0]
  nv = jnp.sum(valid)
  idx = jnp.arange(K)
  nxt = jnp.where(idx + 1 >= nv, 0, idx + 1)
  p0 = pts
  p1 = pts[nxt]
  d0 = p0 @ n - c
  d1 = p1 @ n - c
  in0 = d0 <= 0
  in1 = d1 <= 0
  denom = jnp.where(jnp.abs(d0 - d1) < 1e-12, 1e-12, d0 - d1)
  s = d0 / denom
  inter = p0 + s[:, None] * (p1 - p0)
  edge_active = valid & (idx < nv)
  # per edge: emit p0 if inside; emit intersection if crossing
  out_pts = jnp.concatenate([p0, inter], axis=0)          # (2K, 2)
  out_ok = jnp.concatenate(
      [edge_active & in0, edge_active & (in0 ^ in1)], axis=0)
  # compact, preserving edge order: stable sort by (slot order, validity)
  order = jnp.argsort(
      jnp.where(out_ok, jnp.concatenate([2 * idx, 2 * idx + 1]), 10 * K))
  out_pts = out_pts[order][:K]
  out_ok = out_ok[order][:K]
  return out_pts, out_ok


def _box_box_one(p1, R1, a, p2, R2, b):
  """SAT box-box with face-clipping manifold (up to 8 points).

  Mirrors the reference's native box collider structure (SAT over
  6 face + 9 edge axes, incident-face clipping against the reference
  face); all candidate manifolds are computed and selected branch-free."""
  dtype = p1.dtype
  eps = 1e-10
  R = R1.T @ R2                    # columns: B axes in A frame
  t = R1.T @ (p2 - p1)
  absR = jnp.abs(R) + eps
  tB = R.T @ t

  sep_A = jnp.abs(t) - a - absR @ b            # (3,)
  sep_B = jnp.abs(tB) - b - absR.T @ a         # (3,)

  # edge axes L = A_i x B_j (in A frame)
  seps_E = []
  for i in range(3):
    for j in range(3):
      i1, i2 = (i + 1) % 3, (i + 2) % 3
      L = jnp.zeros(3, dtype).at[i1].set(-R[i2, j]).at[i2].set(R[i1, j])
      norm = jnp.sqrt(jnp.maximum(L @ L, eps))
      Ln = L / norm
      ra = a[i1] * jnp.abs(Ln[i1]) + a[i2] * jnp.abs(Ln[i2])
      rb = jnp.abs(Ln @ R[:, (j + 1) % 3]) * b[(j + 1) % 3] + \
          jnp.abs(Ln @ R[:, (j + 2) % 3]) * b[(j + 2) % 3]
      valid_axis = norm > 1e-5
      seps_E.append(jnp.where(valid_axis, jnp.abs(t @ Ln) - ra - rb,
                              -jnp.inf))
  sep_E = jnp.stack(seps_E)

  # prefer faces (edge separations get a small bias like the reference)
  best_face_A = jnp.argmax(sep_A)
  best_face_B = jnp.argmax(sep_B)
  best_edge = jnp.argmax(sep_E)
  sA = sep_A[best_face_A]
  sB = sep_B[best_face_B]
  sE = sep_E[best_edge] - 1e-4

  def face_manifold(ref_is_a):
    # roles: reference box (r_half, identity frame), incident box whose
    # center sits at c_inc in the reference frame
    if ref_is_a:
      axis_i = best_face_A
      r_half, i_half = a, b
      Rri = R          # incident axes in ref frame
      c_inc = t
    else:
      axis_i = best_face_B
      r_half, i_half = b, a
      Rri = R.T
      c_inc = -tB
    sign = jnp.sign(c_inc[axis_i] + eps)
    normal_r = jnp.zeros(3, dtype).at[axis_i].set(sign)
    # incident face: the face of the incident box most anti-parallel
    inc_axis = jnp.argmax(jnp.abs(normal_r @ Rri))
    inc_sign = -jnp.sign(normal_r @ Rri[:, inc_axis] + eps)
    inc_center = c_inc + inc_sign * i_half[inc_axis] * Rri[:, inc_axis]
    e1_axis = (inc_axis + 1) % 3
    e2_axis = (inc_axis + 2) % 3
    e1 = Rri[:, e1_axis] * i_half[e1_axis]
    e2 = Rri[:, e2_axis] * i_half[e2_axis]
    corners = jnp.stack([inc_center + sx * e1 + sy * e2
                         for sx in (1.0, -1.0) for sy in (-1.0, 1.0)])
    corners = corners[jnp.array([0, 1, 3, 2])]  # ring order
    # 2-D clip in the reference-face plane (axes u, v = other two)
    u_axis = (axis_i + 1) % 3
    v_axis = (axis_i + 2) % 3
    onehot_u = jax.nn.one_hot(u_axis, 3, dtype=dtype)
    onehot_v = jax.nn.one_hot(v_axis, 3, dtype=dtype)
    pts2 = jnp.stack([corners @ onehot_u, corners @ onehot_v], axis=1)
    depth_corner = corners @ normal_r  # along normal
    K = 8
    pts = jnp.zeros((K, 2), dtype).at[:4].set(pts2)
    valid = jnp.arange(K) < 4
    hu = r_half @ onehot_u
    hv = r_half @ onehot_v
    for n2, c in ((jnp.array([1.0, 0.0], dtype), hu),
                  (jnp.array([-1.0, 0.0], dtype), hu),
                  (jnp.array([0.0, 1.0], dtype), hv),
                  (jnp.array([0.0, -1.0], dtype), hv)):
      pts, valid = _clip_polygon(pts, valid, n2, c)
    # depth at clipped points: interpolate the plane of the incident face
    # n_inc . x = n_inc . inc_center in 3-D; reconstruct the normal-axis
    # coordinate from (u, v) via the incident-face plane equation
    n_inc = Rri[:, inc_axis]
    denom = jnp.where(jnp.abs(n_inc[axis_i]) < 1e-8, 1e-8,
                      n_inc[axis_i])
    w = (n_inc @ inc_center
         - pts[:, 0] * n_inc[u_axis] - pts[:, 1] * n_inc[v_axis]) / denom
    # penetration below the reference face (positive = inside)
    depth = r_half[axis_i] - sign * w
    dist = -depth
    # contact points in the reference frame (midway into the overlap)
    pr = (pts[:, 0:1] * onehot_u + pts[:, 1:2] * onehot_v
          + (sign * (r_half[axis_i] - depth / 2))[:, None] * jnp.abs(
              normal_r))
    dist = jnp.where(valid, dist, 1e10)
    # to world; contact normal points from geom1 (A) to geom2 (B)
    if ref_is_a:
      pw = p1 + pr @ R1.T
      nw = R1 @ normal_r           # ref face of A points toward B
    else:
      pw = p2 + pr @ R2.T
      nw = -(R2 @ normal_r)        # ref face of B points toward A
    return dist, pw, jnp.broadcast_to(nw, (8, 3))

  dA, pA, nA = face_manifold(True)
  dB, pB, nB = face_manifold(False)

  # edge-edge contact (single point)
  ei = best_edge // 3
  ej = best_edge % 3
  axesA = jnp.eye(3, dtype=dtype)
  Ai = axesA[ei]
  Bj = R[:, ej]
  L = jnp.cross(Ai, Bj)
  Ln = L / jnp.sqrt(jnp.maximum(L @ L, eps))
  Ln = Ln * jnp.sign(Ln @ t + eps)
  # support edge on A: corner most along +Ln, excluding axis ei
  pa = (jnp.sign(Ln) * a).at[ei].set(0.0)
  LnB = Ln @ R                       # Ln in B axes
  pb_local = (-jnp.sign(LnB) * b).at[ej].set(0.0)
  pb = t + R @ pb_local
  # closest points between the two edge lines (clamped to edge extent)
  r12 = pb - pa
  d1 = Ai
  d2 = Bj
  d1d2 = d1 @ d2
  denom = jnp.maximum(1.0 - d1d2 ** 2, eps)
  s_par = (r12 @ d1 - (r12 @ d2) * d1d2) / denom
  u_par = ((r12 @ d1) * d1d2 - r12 @ d2) / denom
  cA = pa + jnp.clip(s_par, -a[ei], a[ei]) * d1
  cB = pb + jnp.clip(u_par, -b[ej], b[ej]) * d2
  edge_dist = sE + 1e-4
  edge_pos = p1 + R1 @ ((cA + cB) / 2)
  edge_n = R1 @ Ln
  dE = jnp.full((8,), 1e10, dtype).at[0].set(edge_dist)
  pE = jnp.broadcast_to(edge_pos, (8, 3))
  nE = jnp.broadcast_to(edge_n, (8, 3))

  use_B = sB > sA
  use_E = (sE > jnp.maximum(sA, sB))
  d_face = jnp.where(use_B, dB, dA)
  p_face = jnp.where(use_B, pB, pA)
  n_face = jnp.where(use_B, nB, nA)
  dist = jnp.where(use_E, dE, d_face)
  pos = jnp.where(use_E, pE, p_face)
  nrm = jnp.where(use_E, nE, n_face)
  return dist, pos, nrm


def _box_box(pos1, mat1, size1, pos2, mat2, size2):
  """Box-box: SAT + incident-face clipping manifold (vmapped per pair)."""
  return jax.vmap(_box_box_one)(pos1, mat1, size1, pos2, mat2, size2)


def _dir_radius(e_mat, e_size, n):
  """Ellipsoid support radius along world direction n."""
  nl = jnp.einsum('...ij,...i->...j', e_mat, n)
  return 1.0 / jnp.maximum(math.norm_safe(nl / e_size), 1e-12)


def _ellipsoid_cylinder(e_pos, e_mat, e_size, c_pos, c_mat, c_size):
  """Ellipsoid vs cylinder via directional effective radius (two-pass
  sphere-cylinder; adequate for the dog's decorative collision pairs)."""
  d0, p0, n0 = _sphere_cylinder(e_pos, e_mat,
                                jnp.zeros_like(e_size), c_pos, c_mat,
                                c_size)
  n = n0[..., 0, :]
  r = _dir_radius(e_mat, e_size, n)
  dist = d0[..., 0] - r
  pos = p0[..., 0, :] + n * (r / 2)[..., None]
  return dist[..., None], pos[..., None, :], n[..., None, :]


def _ellipsoid_box(e_pos, e_mat, e_size, b_pos, b_mat, b_size):
  """Ellipsoid vs box via directional effective radius."""
  d0, p0, n0 = _sphere_box(e_pos, e_mat, jnp.zeros_like(e_size),
                           b_pos, b_mat, b_size)
  n = n0[..., 0, :]
  r = _dir_radius(e_mat, e_size, n)
  dist = d0[..., 0] - r
  pos = p0[..., 0, :] + n * (r / 2)[..., None]
  return dist[..., None], pos[..., None, :], n[..., None, :]


# ---------------------------------------------------------------------------
# Convex mesh collision (jaco): Frank-Wolfe distance over hull vertices.
# The reference uses libccd MPR inside MuJoCo; here the (precomputed,
# decimated) convex hulls are collided with a fixed-iteration Frank-Wolfe
# projection — branch-free, batched, and adequate for the arm's shallow
# incidental contacts.
# ---------------------------------------------------------------------------

_HULL_PAD = 64


def hull_table(m: Model) -> np.ndarray:
  """(nmesh, _HULL_PAD, 3) hull vertices padded by repetition."""
  cached = m.__dict__.get('_hull_table')
  if cached is not None:
    return cached
  tab = np.zeros((max(len(m.mesh_hull or []), 1), _HULL_PAD, 3))
  for i, hv in enumerate(m.mesh_hull or []):
    n = min(len(hv), _HULL_PAD)
    tab[i, :n] = hv[:n]
    tab[i, n:] = hv[0]
  m.__dict__['_hull_table'] = tab
  return tab


def _fw_closest_point(p, verts, iters=24):
  """Closest point to p in conv(verts): Frank-Wolfe with line search.

  p (..., 3), verts (..., k, 3) -> (..., 3)."""
  x = verts[..., 0, :]
  for it in range(iters):
    g = x - p
    scores = jnp.einsum('...kx,...x->...k', verts, g)
    s = jnp.take_along_axis(
        verts, jnp.argmin(scores, axis=-1)[..., None, None].repeat(3, -1),
        axis=-2)[..., 0, :]
    d = s - x
    denom = jnp.sum(d * d, axis=-1)
    gamma = jnp.clip(-jnp.sum(g * d, axis=-1)
                     / jnp.maximum(denom, 1e-12), 0.0, 1.0)
    x = x + gamma[..., None] * d
  return x


def _sphere_mesh(s_pos, s_mat, s_size, m_pos, m_mat, m_size, hulls):
  """Sphere vs convex hull; hulls (..., k, 3) in mesh local frame."""
  world = m_pos[..., None, :] + jnp.einsum('...ij,...kj->...ki',
                                           m_mat, hulls)
  closest = _fw_closest_point(s_pos, world)
  vec = closest - s_pos
  dist = math.norm_safe(vec) - s_size[..., 0]
  n = math.normalize(vec)
  # deep-center fallback: point inside hull -> use center line
  inside = math.norm_safe(vec) < 1e-9
  ctr = jnp.mean(world, axis=-2)
  n = jnp.where(inside[..., None], math.normalize(ctr - s_pos), n)
  pos = s_pos + n * (s_size[..., 0:1] + dist[..., None] / 2)
  return dist[..., None], pos[..., None, :], n[..., None, :]


def _mesh_mesh(pos1, mat1, size1, pos2, mat2, size2, hulls1, hulls2):
  """Hull vs hull: Frank-Wolfe on the Minkowski difference with witness
  points; penetration depth from support overlap along the final axis."""
  w1 = pos1[..., None, :] + jnp.einsum('...ij,...kj->...ki', mat1, hulls1)
  w2 = pos2[..., None, :] + jnp.einsum('...ij,...kj->...ki', mat2, hulls2)
  # closest points via alternating projection (few iterations suffice
  # for the decimated hulls)
  c1 = jnp.mean(w1, axis=-2)
  c2 = jnp.mean(w2, axis=-2)
  for _ in range(6):
    c1 = _fw_closest_point(c2, w1, iters=8)
    c2 = _fw_closest_point(c1, w2, iters=8)
  vec = c2 - c1
  sep = math.norm_safe(vec)
  n = math.normalize(vec)
  ctr_axis = math.normalize(jnp.mean(w2, -2) - jnp.mean(w1, -2))
  n = jnp.where((sep < 1e-7)[..., None], ctr_axis, n)
  # penetration depth along n when intersecting: support interval overlap
  smax1 = jnp.max(jnp.einsum('...kx,...x->...k', w1, n), axis=-1)
  smin2 = jnp.min(jnp.einsum('...kx,...x->...k', w2, n), axis=-1)
  depth = smax1 - smin2                     # > 0 when overlapping along n
  dist = jnp.where(sep > 1e-7, sep, -depth)
  pos = 0.5 * (c1 + c2)
  return dist[..., None], pos[..., None, :], n[..., None, :]


def _capsule_mesh(c_pos, c_mat, c_size, m_pos, m_mat, m_size, hulls):
  """Capsule vs hull: sphere-hull at both segment ends."""
  axis = c_mat[..., :, 2]
  hl = c_size[..., 1:2]
  outs = [
      _sphere_mesh(c_pos + s * hl * axis, c_mat, c_size,
                   m_pos, m_mat, m_size, hulls)
      for s in (1.0, -1.0)
  ]
  return (jnp.concatenate([o[0] for o in outs], -1),
          jnp.concatenate([o[1] for o in outs], -2),
          jnp.concatenate([o[2] for o in outs], -2))


def _collide_mesh(m: Model, d: Data, grp, g1s, g2s, pos1, mat1, size1,
                  pos2, mat2, size2):
  """Dispatch for groups whose second (or both) geoms are meshes."""
  tab = jnp.asarray(hull_table(m), pos1.dtype)
  did2 = jnp.asarray(m.geom_dataid)[g2s]
  hulls2 = tab[did2]
  if grp.t1 == GeomType.MESH:
    did1 = jnp.asarray(m.geom_dataid)[g1s]
    hulls1 = tab[did1]
    return _mesh_mesh(pos1, mat1, size1, pos2, mat2, size2,
                      hulls1, hulls2)
  if grp.t1 == GeomType.SPHERE:
    return _sphere_mesh(pos1, mat1, size1, pos2, mat2, size2, hulls2)
  if grp.t1 == GeomType.CAPSULE:
    return _capsule_mesh(pos1, mat1, size1, pos2, mat2, size2, hulls2)
  if grp.t1 == GeomType.BOX:
    # box as its 8-corner hull -> hull-vs-hull
    signs = jnp.asarray(
        [[sx, sy, sz] for sx in (-1., 1.) for sy in (-1., 1.)
         for sz in (-1., 1.)], size1.dtype)
    corners = size1[..., None, :] * signs
    return _mesh_mesh(pos1, mat1, size1, pos2, mat2, size2,
                      corners, hulls2)
  if grp.t1 == GeomType.PLANE:
    # plane vs hull: deepest hull vertex below the plane
    n = mat1[..., :, 2]
    world = pos2[..., None, :] + jnp.einsum('...ij,...kj->...ki',
                                            mat2, hulls2)
    h = jnp.einsum('...kx,...x->...k', world - pos1[..., None, :], n)
    idx = jnp.argsort(h, axis=-1)[..., :3]
    dist = jnp.take_along_axis(h, idx, axis=-1)
    pts = jnp.take_along_axis(world, idx[..., None], axis=-2)
    pts = pts - n[..., None, :] * (dist / 2)[..., None]
    ns = jnp.broadcast_to(n[..., None, :], pts.shape)
    return dist, pts, ns
  raise NotImplementedError(f'mesh collider for {grp.t1}')


def _cylinder_box(c_pos, c_mat, c_size, b_pos, b_mat, b_size):
  """Cylinder vs box: capsule approximation of the cylinder, padded to
  the 4-slot layout."""
  d2, p2, n2 = _capsule_box(c_pos, c_mat, c_size, b_pos, b_mat, b_size)
  big = jnp.full_like(d2, 1e10)
  return (jnp.concatenate([d2, big], -1),
          jnp.concatenate([p2, p2], -2),
          jnp.concatenate([n2, n2], -2))


_COLLIDERS = {
    (GeomType.PLANE, GeomType.SPHERE): _plane_sphere,
    (GeomType.PLANE, GeomType.CAPSULE): _plane_capsule,
    (GeomType.PLANE, GeomType.CYLINDER): _plane_cylinder,
    (GeomType.PLANE, GeomType.ELLIPSOID): _plane_ellipsoid,
    (GeomType.PLANE, GeomType.BOX): _plane_box,
    (GeomType.SPHERE, GeomType.SPHERE): _sphere_sphere,
    (GeomType.SPHERE, GeomType.CAPSULE): _sphere_capsule,
    (GeomType.SPHERE, GeomType.CYLINDER): _sphere_cylinder,
    (GeomType.SPHERE, GeomType.ELLIPSOID): _sphere_ellipsoid,
    (GeomType.SPHERE, GeomType.BOX): _sphere_box,
    (GeomType.CAPSULE, GeomType.ELLIPSOID): _capsule_ellipsoid,
    (GeomType.ELLIPSOID, GeomType.ELLIPSOID): _ellipsoid_ellipsoid,
    (GeomType.ELLIPSOID, GeomType.CYLINDER): _ellipsoid_cylinder,
    (GeomType.ELLIPSOID, GeomType.BOX): _ellipsoid_box,
    (GeomType.CYLINDER, GeomType.BOX): _cylinder_box,
    (GeomType.CAPSULE, GeomType.CAPSULE): _capsule_capsule,
    (GeomType.CAPSULE, GeomType.CYLINDER): _capsule_cylinder,
    (GeomType.CAPSULE, GeomType.BOX): _capsule_box,
    (GeomType.BOX, GeomType.BOX): _box_box,
    # cylinder-cylinder: capsule approximation of geom1's axis against the
    # exact cylinder geom2 (adequate for the suite's rare cyl-cyl pairs)
    (GeomType.CYLINDER, GeomType.CYLINDER): _cylinder_cylinder,
}


# ---------------------------------------------------------------------------
# Heightfield collision: local-surface-plane approximation.
# The reference decomposes heightfields into triangular prisms; here each
# candidate point samples the bilinear height + gradient under it and
# collides against the local tangent plane — behaviorally equivalent for
# terrain locomotion (quadruped escape) at static shapes.
# ---------------------------------------------------------------------------


def hfield_height(m: Model, d: Data, hid: int, xy):
  """Bilinear height + gradient of hfield `hid` at local xy (..., 2)."""
  from dm_control_tpu._src import smooth
  dtype = xy.dtype
  nrow = int(m.hfield_nrow[hid])
  ncol = int(m.hfield_ncol[hid])
  adr = int(m.hfield_adr[hid])
  sx, sy, sz = [float(v) for v in m.hfield_size[hid][:3]]
  data = smooth.mparam(m, d, 'hfield_data')[adr:adr + nrow * ncol]
  grid = data.reshape(nrow, ncol) * sz
  fx = (xy[..., 0] + sx) / (2 * sx) * (ncol - 1)
  fy = (xy[..., 1] + sy) / (2 * sy) * (nrow - 1)
  fx = jnp.clip(fx, 0.0, ncol - 1 - 1e-6)
  fy = jnp.clip(fy, 0.0, nrow - 1 - 1e-6)
  x0 = jnp.floor(fx).astype(jnp.int32)
  y0 = jnp.floor(fy).astype(jnp.int32)
  tx = fx - x0
  ty = fy - y0
  h00 = grid[y0, x0]
  h01 = grid[y0, x0 + 1]
  h10 = grid[y0 + 1, x0]
  h11 = grid[y0 + 1, x0 + 1]
  h = (h00 * (1 - tx) * (1 - ty) + h01 * tx * (1 - ty)
       + h10 * (1 - tx) * ty + h11 * tx * ty)
  dx_spacing = 2 * sx / (ncol - 1)
  dy_spacing = 2 * sy / (nrow - 1)
  dhdx = ((h01 - h00) * (1 - ty) + (h11 - h10) * ty) / dx_spacing
  dhdy = ((h10 - h00) * (1 - tx) + (h11 - h01) * tx) / dy_spacing
  return h, dhdx, dhdy


def _hfield_point(m, d, hid, h_pos, h_mat, pts, radius):
  """Collide world points (n,3) with radii against hfield `hid`.

  Returns (dist, pos, n_world) like the point-vs-plane colliders."""
  local = jnp.einsum('nij,ni->nj', h_mat, pts - h_pos)
  h, dhdx, dhdy = hfield_height(m, d, hid, local[..., :2])
  n_local = math.normalize(jnp.stack(
      [-dhdx, -dhdy, jnp.ones_like(h)], axis=-1))
  surf = jnp.stack([local[..., 0], local[..., 1], h], axis=-1)
  dist = jnp.einsum('nx,nx->n', local - surf, n_local) - radius
  n_world = jnp.einsum('nij,nj->ni', h_mat, n_local)
  pos = pts - n_world * (radius + dist / 2)[..., None]
  return dist, pos, n_world


def _collide_hfield(m: Model, d: Data, grp, g1s, pos2, mat2, size2):
  """Heightfield vs sphere/capsule/ellipsoid/cylinder."""
  t2 = grp.t2
  hid = int(m.geom_dataid[grp.g1[0]])
  h_pos = d.geom_xpos[g1s]
  h_mat = d.geom_xmat[g1s]
  if t2 == GeomType.SPHERE:
    dd, pp, nn = _hfield_point(m, d, hid, h_pos, h_mat, pos2,
                               size2[..., 0])
    return dd[:, None], pp[:, None, :], nn[:, None, :]
  if t2 == GeomType.ELLIPSOID:
    # bottom support point approximation (local up in hfield frame)
    up = h_mat[..., :, 2]
    nl = jnp.einsum('nij,ni->nj', mat2, -up)
    sp_l = (size2 * size2 * nl) / jnp.maximum(
        math.norm_safe(nl * size2), 1e-12)[..., None]
    sp = pos2 + jnp.einsum('nij,nj->ni', mat2, sp_l)
    dd, pp, nn = _hfield_point(m, d, hid, h_pos, h_mat, sp,
                               jnp.zeros_like(size2[..., 0]))
    return dd[:, None], pp[:, None, :], nn[:, None, :]
  if t2 == GeomType.CAPSULE:
    axis = mat2[..., :, 2]
    hl = size2[..., 1:2]
    outs = [
        _hfield_point(m, d, hid, h_pos, h_mat, pos2 + s * hl * axis,
                      size2[..., 0])
        for s in (1.0, -1.0)
    ]
    return (jnp.stack([o[0] for o in outs], 1),
            jnp.stack([o[1] for o in outs], 1),
            jnp.stack([o[2] for o in outs], 1))
  if t2 == GeomType.CYLINDER:
    axis = mat2[..., :, 2]
    r = size2[..., 0:1]
    hl = size2[..., 1:2]
    up = h_mat[..., :, 2]
    proj = -up + axis * jnp.sum(up * axis, -1, keepdims=True)
    radial = jnp.where(
        (math.norm_safe(proj) > 1e-8)[..., None],
        math.normalize(proj), mat2[..., :, 0])
    outs = []
    for se in (1.0, -1.0):
      for sr in (1.0, -1.0):
        p = pos2 + se * hl * axis + sr * r * radial
        outs.append(_hfield_point(m, d, hid, h_pos, h_mat, p,
                                  jnp.zeros_like(size2[..., 0])))
    return (jnp.stack([o[0] for o in outs], 1),
            jnp.stack([o[1] for o in outs], 1),
            jnp.stack([o[2] for o in outs], 1))
  raise NotImplementedError(f'hfield vs {t2}')


def _broadphase_distance(m: Model, d: Data, grp, dtype) -> jax.Array:
  """(npairs,) conservative distance for top-K selection (exact for
  plane/sphere/capsule combinations, bounding-sphere otherwise)."""
  t1, t2 = grp.t1, grp.t2
  pos1 = d.geom_xpos[grp.g1]
  pos2 = d.geom_xpos[grp.g2]
  size1 = jnp.asarray(m.geom_size[grp.g1], dtype)
  size2 = jnp.asarray(m.geom_size[grp.g2], dtype)

  def seg(pos, mat, size):
    axis = mat[:, :, 2]
    hl = size[:, 1:2]
    return pos - hl * axis, pos + hl * axis

  if t1 == GeomType.PLANE:
    n = d.geom_xmat[grp.g1][:, :, 2]
    if t2 == GeomType.SPHERE:
      return jnp.einsum('px,px->p', n, pos2 - pos1) - size2[:, 0]
    if t2 == GeomType.CAPSULE:
      a, b = seg(pos2, d.geom_xmat[grp.g2], size2)
      ha = jnp.einsum('px,px->p', n, a - pos1)
      hb = jnp.einsum('px,px->p', n, b - pos1)
      return jnp.minimum(ha, hb) - size2[:, 0]
    rb2 = jnp.asarray(m.geom_rbound[grp.g2], dtype)
    return jnp.einsum('px,px->p', n, pos2 - pos1) - rb2
  if (t1, t2) == (GeomType.SPHERE, GeomType.SPHERE):
    return math.norm_safe(pos2 - pos1) - size1[:, 0] - size2[:, 0]
  if (t1, t2) == (GeomType.SPHERE, GeomType.CAPSULE):
    a, b = seg(pos2, d.geom_xmat[grp.g2], size2)
    c = math.closest_segment_point(a, b, pos1)
    return math.norm_safe(c - pos1) - size1[:, 0] - size2[:, 0]
  if (t1, t2) == (GeomType.CAPSULE, GeomType.CAPSULE):
    a1, b1 = seg(pos1, d.geom_xmat[grp.g1], size1)
    a2, b2 = seg(pos2, d.geom_xmat[grp.g2], size2)
    c1, c2 = math.closest_segment_to_segment_points(a1, b1, a2, b2)
    return math.norm_safe(c2 - c1) - size1[:, 0] - size2[:, 0]
  rb1 = jnp.asarray(m.geom_rbound[grp.g1], dtype)
  rb2 = jnp.asarray(m.geom_rbound[grp.g2], dtype)
  return math.norm_safe(pos2 - pos1) - rb1 - rb2


def collide_all(m: Model, d: Data) -> Data:
  from dm_control_tpu._src import collision as coll
  dtype = d.qpos.dtype

  all_dist, all_pos, all_frame = [], [], []
  all_margin, all_friction = [], []
  all_solref, all_solimp = [], []
  all_g1, all_g2, all_dim = [], [], []
  all_b1, all_b2 = [], []

  for grp in coll.groups(m):
    t1, t2 = grp.t1, grp.t2
    if t1 == GeomType.HFIELD or t2 == GeomType.MESH:
      fn = None  # dispatched to _collide_hfield / _collide_mesh below
    elif (t1, t2) not in _COLLIDERS:
      raise NotImplementedError(f'collider for ({t1}, {t2})')
    else:
      fn = _COLLIDERS[(t1, t2)]
    k = grp.ncon_per_pair
    K = grp.K
    incmargin_np = grp.margin - grp.gap
    bodies1 = m.geom_bodyid[grp.g1].astype(np.int32)
    bodies2 = m.geom_bodyid[grp.g2].astype(np.int32)

    if not grp.dynamic:
      g1s, g2s = grp.g1, grp.g2   # static constants
      pos1, mat1 = d.geom_xpos[g1s], d.geom_xmat[g1s]
      pos2, mat2 = d.geom_xpos[g2s], d.geom_xmat[g2s]
      size1 = jnp.asarray(m.geom_size[g1s], dtype)
      size2 = jnp.asarray(m.geom_size[g2s], dtype)
      solref = jnp.asarray(grp.solref, dtype)
      solimp = jnp.asarray(grp.solimp, dtype)
      incmargin = jnp.asarray(incmargin_np, dtype)
      geom1 = jnp.asarray(grp.g1)
      geom2 = jnp.asarray(grp.g2)
      body1 = jnp.asarray(bodies1)
      body2 = jnp.asarray(bodies2)
    else:
      # top-K broadphase.  For sphere/capsule/plane combinations the
      # score is the EXACT narrowphase distance (cheap closed forms), so
      # the selection can only drop a pair when more than K pairs are
      # simultaneously deepest — bounding-sphere ordering alone misses
      # grazing capsule contacts (seen on humanoid_CMU self-collisions).
      overlap = _broadphase_distance(m, d, grp, dtype)
      score = overlap - jnp.asarray(incmargin_np, dtype)
      _, idx = jax.lax.top_k(-score, K)
      g1s = jnp.asarray(grp.g1)[idx]
      g2s = jnp.asarray(grp.g2)[idx]
      # selected-pair reads as one-hot matmuls: row gathers with the
      # dynamic top-K indices lower to slow per-row dynamic-slice
      # fusions on TPU (profiled ~1.2 ms each at (4096, 20, 3, 3)),
      # while (K, P) @ (P, x) rides the MXU
      P = len(grp.g1)
      sel = jax.nn.one_hot(idx, P, dtype=dtype)          # (K, P)
      pos1 = sel @ d.geom_xpos[grp.g1]
      pos2 = sel @ d.geom_xpos[grp.g2]
      mat1 = (sel @ d.geom_xmat[grp.g1].reshape(P, 9)).reshape(K, 3, 3)
      mat2 = (sel @ d.geom_xmat[grp.g2].reshape(P, 9)).reshape(K, 3, 3)
      size1 = sel @ jnp.asarray(m.geom_size[grp.g1], dtype)
      size2 = sel @ jnp.asarray(m.geom_size[grp.g2], dtype)
      solref = sel @ jnp.asarray(grp.solref, dtype)
      solimp = sel @ jnp.asarray(grp.solimp, dtype)
      incmargin = sel @ jnp.asarray(incmargin_np, dtype)
      geom1, geom2 = g1s, g2s
      body1 = jnp.asarray(bodies1)[idx]
      body2 = jnp.asarray(bodies2)[idx]

    if t1 == GeomType.HFIELD:
      dist, pos, normal_or_frame = _collide_hfield(
          m, d, grp, g1s, pos2, mat2, size2)
    elif t2 == GeomType.MESH:
      dist, pos, normal_or_frame = _collide_mesh(
          m, d, grp, g1s, g2s, pos1, mat1, size1, pos2, mat2, size2)
    else:
      dist, pos, normal_or_frame = fn(pos1, mat1, size1, pos2, mat2, size2)
    if normal_or_frame.ndim == pos.ndim + 1:
      frame = normal_or_frame
    else:
      frame = make_frame(normal_or_frame)

    def rep(x):
      return jnp.repeat(x, k, axis=0)

    all_dist.append(dist.reshape(K * k))
    all_pos.append(pos.reshape(K * k, 3))
    all_frame.append(frame.reshape(K * k, 3, 3))
    all_margin.append(rep(incmargin))
    all_friction.append(jnp.broadcast_to(
        jnp.asarray(grp.friction, dtype)[None], (K * k, 5)))
    all_solref.append(rep(solref))
    all_solimp.append(rep(solimp))
    all_g1.append(rep(geom1).astype(jnp.int32))
    all_g2.append(rep(geom2).astype(jnp.int32))
    all_b1.append(rep(body1).astype(jnp.int32))
    all_b2.append(rep(body2).astype(jnp.int32))
    all_dim.append(jnp.full((K * k,), grp.condim, jnp.int32))

  contact = Contact(
      dist=jnp.concatenate(all_dist),
      pos=jnp.concatenate(all_pos),
      frame=jnp.concatenate(all_frame),
      includemargin=jnp.concatenate(all_margin),
      friction=jnp.concatenate(all_friction),
      solref=jnp.concatenate(all_solref),
      solimp=jnp.concatenate(all_solimp),
      geom1=jnp.concatenate(all_g1),
      geom2=jnp.concatenate(all_g2),
      body1=jnp.concatenate(all_b1),
      body2=jnp.concatenate(all_b2),
      dim=jnp.concatenate(all_dim),
  )
  return d.replace(contact=contact)
