"""In-graph raytraced rendering: RGB / depth / segmentation on the TPU.

Replaces the reference's OpenGL pixel path (GL contexts in
dm_control/_render/, Camera.render at dm_control/mujoco/engine.py:722-822)
with a pure-jnp analytic raytracer over the primitive geoms.  Because it
is ordinary jax code, it runs under jit/vmap ON THE ACCELERATOR: pixel
observations for thousands of batched envs render in-graph with no host
round-trip, no GL context, and no render thread (the reference's
render-executor machinery, _render/executor/, is unnecessary by design).

Supported: plane (checkerboard), sphere, capsule, cylinder, box,
ellipsoid; fixed and targetbody cameras; Lambertian shading with a
headlight plus one directional light.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import math
from dm_control_tpu._src.types import Data, GeomType, Model

_BIG = 1e9


# ---------------------------------------------------------------------------
# Ray-primitive intersections.  rays: o (3,), dirs (N, 3) world frame.
# Each returns (t (N,), normal (N, 3)) with t=_BIG for misses.
# ---------------------------------------------------------------------------


def _to_local(o, dirs, pos, mat):
  dl = dirs @ mat
  ol = jnp.broadcast_to((o - pos) @ mat, dl.shape)
  return ol, dl


def _quadratic(a, b, c):
  disc = b * b - 4 * a * c
  ok = disc >= 0
  sq = jnp.sqrt(jnp.maximum(disc, 0.0))
  t0 = (-b - sq) / (2 * a)
  t1 = (-b + sq) / (2 * a)
  t = jnp.where(t0 > 1e-6, t0, t1)
  return jnp.where(ok & (t > 1e-6), t, _BIG)


def _sphere_hit(ol, dl, r):
  a = jnp.sum(dl * dl, -1)
  b = 2 * jnp.sum(ol * dl, -1)
  c = jnp.sum(ol * ol, -1) - r * r
  t = _quadratic(a, b, c)
  n = ol + t[:, None] * dl
  return t, n


def _capsule_hit(ol, dl, r, hl):
  # infinite cylinder on z
  a = dl[:, 0] ** 2 + dl[:, 1] ** 2
  b = 2 * (ol[:, 0] * dl[:, 0] + ol[:, 1] * dl[:, 1])
  c = ol[:, 0] ** 2 + ol[:, 1] ** 2 - r * r
  t_cyl = _quadratic(jnp.maximum(a, 1e-12), b, c)
  z = ol[:, 2] + t_cyl * dl[:, 2]
  t_cyl = jnp.where(jnp.abs(z) <= hl, t_cyl, _BIG)
  # end spheres
  t_top, _ = _sphere_hit(ol - jnp.array([0, 0, 1.0]) * hl, dl, r)
  t_bot, _ = _sphere_hit(ol + jnp.array([0, 0, 1.0]) * hl, dl, r)
  t = jnp.minimum(t_cyl, jnp.minimum(t_top, t_bot))
  p = ol + t[:, None] * dl
  seg_z = jnp.clip(p[:, 2], -hl, hl)
  n = p - jnp.stack([jnp.zeros_like(seg_z), jnp.zeros_like(seg_z), seg_z],
                    -1)
  return t, n


def _cylinder_hit(ol, dl, r, hl):
  a = dl[:, 0] ** 2 + dl[:, 1] ** 2
  b = 2 * (ol[:, 0] * dl[:, 0] + ol[:, 1] * dl[:, 1])
  c = ol[:, 0] ** 2 + ol[:, 1] ** 2 - r * r
  t_side = _quadratic(jnp.maximum(a, 1e-12), b, c)
  z = ol[:, 2] + t_side * dl[:, 2]
  t_side = jnp.where(jnp.abs(z) <= hl, t_side, _BIG)
  n_side = ol + t_side[:, None] * dl
  n_side = n_side * jnp.array([1.0, 1.0, 0.0])
  # caps
  safe_dz = jnp.where(jnp.abs(dl[:, 2]) < 1e-12, 1e-12, dl[:, 2])
  t_caps = []
  for sign in (1.0, -1.0):
    t = (sign * hl - ol[:, 2]) / safe_dz
    p = ol + t[:, None] * dl
    ok = (t > 1e-6) & (p[:, 0] ** 2 + p[:, 1] ** 2 <= r * r)
    t_caps.append(jnp.where(ok, t, _BIG))
  t_cap = jnp.minimum(t_caps[0], t_caps[1])
  n_cap = jnp.stack([jnp.zeros_like(t_cap), jnp.zeros_like(t_cap),
                     jnp.sign(ol[:, 2] + t_cap * dl[:, 2])], -1)
  use_side = t_side < t_cap
  t = jnp.minimum(t_side, t_cap)
  n = jnp.where(use_side[:, None], n_side, n_cap)
  return t, n


def _box_hit(ol, dl, size):
  safe = jnp.where(jnp.abs(dl) < 1e-12, 1e-12, dl)
  t1 = (-size - ol) / safe
  t2 = (size - ol) / safe
  tmin = jnp.max(jnp.minimum(t1, t2), -1)
  tmax = jnp.min(jnp.maximum(t1, t2), -1)
  ok = (tmax >= tmin) & (tmax > 1e-6)
  t = jnp.where(tmin > 1e-6, tmin, tmax)
  t = jnp.where(ok, t, _BIG)
  p = ol + t[:, None] * dl
  rel = p / size
  axis = jnp.argmax(jnp.abs(rel), -1)
  n = jax.nn.one_hot(axis, 3, dtype=ol.dtype) * jnp.sign(
      jnp.take_along_axis(rel, axis[:, None], -1))
  return t, n


def _ellipsoid_hit(ol, dl, size):
  os_ = ol / size
  ds = dl / size
  a = jnp.sum(ds * ds, -1)
  b = 2 * jnp.sum(os_ * ds, -1)
  c = jnp.sum(os_ * os_, -1) - 1.0
  t = _quadratic(a, b, c)
  p = ol + t[:, None] * dl
  n = p / (size * size)
  return t, n


def _hull_tri_table(m: Model):
  """Per-mesh convex-hull triangles (outward-oriented), padded to one
  (nmesh, T, 3, 3) array; cached on the model.  Rendering meshes traces
  their collision hulls (<=64 verts) rather than the full surface."""
  cached = m.__dict__.get('_hull_tri_table')
  if cached is not None:
    return cached
  from scipy.spatial import ConvexHull
  tris = []
  for hv in (m.mesh_hull or []):
    hv = np.asarray(hv)
    try:
      hull = ConvexHull(hv)
      t = hv[hull.simplices]             # (T, 3, 3)
      cen = hv.mean(axis=0)
      n = np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0])
      flip = np.einsum('ij,ij->i', n, t.mean(axis=1) - cen) < 0
      t[flip] = t[flip][:, ::-1]
    except Exception:
      t = np.zeros((1, 3, 3))
    tris.append(t)
  tmax = max((t.shape[0] for t in tris), default=1)
  tab = np.zeros((max(len(tris), 1), tmax, 3, 3))
  for i, t in enumerate(tris):
    tab[i, :t.shape[0]] = t
    tab[i, t.shape[0]:] = t[-1] if t.shape[0] else 0.0  # degenerate pad
  m.__dict__['_hull_tri_table'] = tab
  return tab


def _mesh_hit(ol, dl, tris):
  """Moller-Trumbore over padded hull triangles: (n,3),(n,3),(T,3,3) ->
  (t, normal) per ray."""
  v0, e1, e2 = tris[:, 0], tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]
  h = jnp.cross(dl[:, None, :], e2[None, :, :])          # (n, T, 3)
  a = jnp.einsum('tj,ntj->nt', e1, h)
  f = jnp.where(jnp.abs(a) < 1e-12, jnp.inf, 1.0 / a)
  s = ol[:, None, :] - v0[None, :, :]
  u = f * jnp.einsum('ntj,ntj->nt', s, h)
  q = jnp.cross(s, e1[None, :, :])
  v = f * jnp.einsum('nj,ntj->nt', dl, q)
  t = f * jnp.einsum('tj,ntj->nt', e2, q)
  ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-9) & jnp.isfinite(t)
  t = jnp.where(ok, t, _BIG)
  best = jnp.argmin(t, axis=1)
  tbest = jnp.take_along_axis(t, best[:, None], 1)[:, 0]
  n = jnp.cross(e1, e2)
  n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
  return tbest, n[best]


def _plane_hit(ol, dl):
  safe_dz = jnp.where(jnp.abs(dl[:, 2]) < 1e-12, 1e-12, dl[:, 2])
  t = -ol[:, 2] / safe_dz
  t = jnp.where(t > 1e-6, t, _BIG)
  n = jnp.broadcast_to(jnp.array([0.0, 0, 1.0], ol.dtype), dl.shape)
  return t, n


# ---------------------------------------------------------------------------
# Camera pose.
# ---------------------------------------------------------------------------


def raycast(m: Model, d: Data, origin: jax.Array, direction: jax.Array,
            exclude_body: int = -1) -> jax.Array:
  """Distance along `direction` from `origin` to the nearest geom surface
  (-1.0 if none).  Replaces the reference's mj_ray (used by rangefinder
  sensors, dm_control/suite/quadruped.py:206-212).  Mesh geoms trace
  their convex collision hulls; heightfields use a march+bisection
  against the bilinear surface."""
  dtype = origin.dtype
  dirs = direction[None]
  best = jnp.full((), _BIG, dtype)
  for g in range(m.ngeom):
    if exclude_body >= 0 and int(m.geom_bodyid[g]) == exclude_body:
      continue
    gt = GeomType(int(m.geom_type[g]))
    if gt == GeomType.MESH:
      tris = jnp.asarray(_hull_tri_table(m)[int(m.geom_dataid[g])],
                         dtype)
      ol, dl = _to_local(origin, dirs, d.geom_xpos[g], d.geom_xmat[g])
      t, _ = _mesh_hit(ol, dl, tris)
      best = jnp.minimum(best, t[0])
      continue
    pos, mat = d.geom_xpos[g], d.geom_xmat[g]
    size = jnp.asarray(m.geom_size[g], dtype)
    ol, dl = _to_local(origin, dirs, pos, mat)
    if gt == GeomType.PLANE:
      t, _ = _plane_hit(ol, dl)
    elif gt == GeomType.SPHERE:
      t, _ = _sphere_hit(ol, dl, size[0])
    elif gt == GeomType.CAPSULE:
      t, _ = _capsule_hit(ol, dl, size[0], size[1])
    elif gt == GeomType.CYLINDER:
      t, _ = _cylinder_hit(ol, dl, size[0], size[1])
    elif gt == GeomType.BOX:
      t, _ = _box_hit(ol, dl, size)
    elif gt == GeomType.ELLIPSOID:
      t, _ = _ellipsoid_hit(ol, dl, size)
    elif gt == GeomType.HFIELD:
      t = _hfield_ray(m, d, int(m.geom_dataid[g]), ol[0], dl[0])[None]
    else:
      continue
    best = jnp.minimum(best, t[0])
  return jnp.where(best > 0.5 * _BIG, jnp.asarray(-1.0, dtype), best)


def _hfield_ray(m: Model, d: Data, hid: int, ol, dl):
  """March + bisect a local-frame ray against the hfield surface."""
  from dm_control_tpu._src import colliders
  dtype = ol.dtype
  sx, sy, sz = [float(v) for v in m.hfield_size[hid][:3]]
  tmax = 2.0 * float(np.sqrt(sx * sx + sy * sy + sz * sz))
  ts = jnp.linspace(0.0, tmax, 64).astype(dtype)
  pts = ol[None, :] + ts[:, None] * dl[None, :]
  h, _, _ = colliders.hfield_height(m, d, hid, pts[:, :2])
  inside = (jnp.abs(pts[:, 0]) <= sx) & (jnp.abs(pts[:, 1]) <= sy)
  below = (pts[:, 2] < h) & inside & (ts > 1e-6)
  hit_any = jnp.any(below)
  first = jnp.argmax(below)
  lo = ts[jnp.maximum(first - 1, 0)]
  hi = ts[first]

  def bisect(_, carry):
    lo, hi = carry
    mid = 0.5 * (lo + hi)
    p = ol + mid * dl
    hm, _, _ = colliders.hfield_height(m, d, hid, p[:2])
    under = p[2] < hm
    return jnp.where(under, lo, mid), jnp.where(under, mid, hi)

  lo, hi = jax.lax.fori_loop(0, 12, bisect, (lo, hi))
  return jnp.where(hit_any, 0.5 * (lo + hi), _BIG)


def camera_pose(m: Model, d: Data, camera_id: int):
  """(position, rotation) of a model camera in world frame.

  Camera looks along -z of its frame (the reference GL convention)."""
  b = int(m.cam_bodyid[camera_id])
  pos = d.xpos[b] + d.xmat[b] @ jnp.asarray(m.cam_pos[camera_id],
                                            d.qpos.dtype)
  rot = d.xmat[b] @ math.quat_to_mat(
      jnp.asarray(m.cam_quat[camera_id], d.qpos.dtype))
  return pos, rot


def free_camera_pose(lookat, distance, azimuth, elevation):
  """World pose of a free camera from the reference MovableCamera's
  (lookat, distance, azimuth, elevation) parameterization
  (dm_control/mujoco/engine.py:875-917); angles in degrees, elevation
  negative when looking down, MuJoCo's mjv free-camera convention.

  Returns (position, rotation) with the camera looking along -z."""
  lookat = jnp.asarray(lookat)
  dtype = lookat.dtype
  az = jnp.deg2rad(jnp.asarray(azimuth, dtype))
  el = jnp.deg2rad(jnp.asarray(elevation, dtype))
  fwd = jnp.stack([jnp.cos(el) * jnp.cos(az),
                   jnp.cos(el) * jnp.sin(az),
                   jnp.sin(el)])
  zw = jnp.asarray([0.0, 0.0, 1.0], dtype)
  right = math.normalize(jnp.cross(fwd, zw)
                         + jnp.asarray([1e-12, 0, 0], dtype))
  up = jnp.cross(right, fwd)
  rot = jnp.stack([right, up, -fwd], axis=-1)
  pos = lookat - distance * fwd
  return pos, rot


def select(m: Model, d: Data, cursor_position, height: int, width: int,
           camera_id: int = 0, camera=None):
  """Pixel -> object pick (reference Camera.select, engine.py:824-872).

  cursor_position: (x, y) in [0, 1] viewport coordinates, origin at the
  bottom-left (the reference convention).  Returns
  (body_id, geom_id, world_position); ids are -1 on background."""
  dtype = d.qpos.dtype
  if camera is None:
    cam_pos, cam_rot = camera_pose(m, d, camera_id)
    fovy = float(m.cam_fovy[camera_id]) * np.pi / 180.0
  else:
    cam_pos, cam_rot, fovy = camera
  cx, cy = cursor_position
  tan = np.tan(fovy / 2)
  x = (2.0 * cx - 1.0) * tan * width / height
  y = (2.0 * cy - 1.0) * tan
  dir_cam = jnp.asarray([x, y, -1.0], dtype)
  direction = math.normalize(dir_cam @ cam_rot.T)
  seg = render(m, d, 1, 1, camera_id, segmentation=True, camera=camera,
               _rays=(cam_pos, direction[None]))
  t = raycast(m, d, cam_pos, direction)
  geom_id = jnp.asarray(seg).ravel()[0]
  body_id = jnp.where(geom_id >= 0,
                      jnp.asarray(m.geom_bodyid, jnp.int32)[
                          jnp.maximum(geom_id, 0)], -1)
  pos = cam_pos + t * direction
  return body_id, geom_id, jnp.where(t > 0, pos,
                                     jnp.full((3,), jnp.nan, dtype))


class MovableCamera:
  """Free camera with a settable pose over the raytracer (reference
  MovableCamera, engine.py:875-917)."""

  def __init__(self, m: Model, height: int = 64, width: int = 64,
               lookat=(0.0, 0.0, 0.5), distance=4.0, azimuth=90.0,
               elevation=-30.0):
    self._m = m
    self._height, self._width = height, width
    self.set_pose(lookat, distance, azimuth, elevation)

  def get_pose(self):
    """(lookat, distance, azimuth, elevation), engine.py:892-899."""
    return self._pose

  def set_pose(self, lookat, distance, azimuth, elevation):
    self._pose = (np.asarray(lookat, np.float64), float(distance),
                  float(azimuth), float(elevation))

  def _camera(self, d: Data, fovy_deg: float = 45.0):
    lookat, dist, az, el = self._pose
    pos, rot = free_camera_pose(jnp.asarray(lookat, d.qpos.dtype),
                                dist, az, el)
    return pos, rot, fovy_deg * np.pi / 180.0

  def render(self, d: Data, depth: bool = False,
             segmentation: bool = False):
    return render(self._m, d, self._height, self._width,
                  depth=depth, segmentation=segmentation,
                  camera=self._camera(d))

  def select(self, d: Data, cursor_position):
    return select(self._m, d, cursor_position, self._height, self._width,
                  camera=self._camera(d))


# ---------------------------------------------------------------------------
# Renderer.
# ---------------------------------------------------------------------------


def render(m: Model, d: Data, height: int = 64, width: int = 64,
           camera_id: int = 0, depth: bool = False,
           segmentation: bool = False, camera=None, _rays=None):
  """Raytrace one camera view. Returns (H, W, 3) RGB float in [0, 1],
  or (H, W) depth (distance along the view ray), or (H, W) int32 geom id
  (-1 background) for segmentation.

  `camera` overrides the model camera with an explicit
  (position, rotation, fovy_radians) pose (e.g. from free_camera_pose);
  `_rays` is an internal (origin, directions) override used by select."""
  dtype = d.qpos.dtype
  if camera is not None:
    cam_pos, cam_rot, fovy = camera
  else:
    cam_pos, cam_rot = camera_pose(m, d, camera_id)
    fovy = float(m.cam_fovy[camera_id]) * np.pi / 180.0

  if _rays is not None:
    o, dirs = _rays
    n_ray = dirs.shape[0]
    height, width = n_ray, 1
  else:
    # pinhole rays in camera frame: x right, y up, looking along -z
    tan = np.tan(fovy / 2)
    ys = jnp.linspace(tan, -tan, height, dtype=dtype)
    xs = jnp.linspace(-tan * width / height, tan * width / height, width,
                      dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys)
    dirs_cam = jnp.stack(
        [gx.ravel(), gy.ravel(), -jnp.ones_like(gx).ravel()], -1)
    dirs = math.normalize(dirs_cam @ cam_rot.T)
    o = cam_pos
    n_ray = height * width
  best_t = jnp.full((n_ray,), _BIG, dtype)
  best_n = jnp.zeros((n_ray, 3), dtype)
  best_rgb = jnp.zeros((n_ray, 3), dtype)
  best_id = jnp.full((n_ray,), -1, jnp.int32)

  # model_var override lets reward visualization recolor geoms per step
  from dm_control_tpu._src import smooth
  if m.geom_rgba is not None:
    rgba = smooth.mparam(m, d, 'geom_rgba').astype(dtype)
  else:
    rgba = jnp.full((m.ngeom, 4), 0.5, dtype)

  for g in range(m.ngeom):
    gtype = GeomType(int(m.geom_type[g]))
    size = m.geom_size[g]
    ol, dl = _to_local(o, dirs, d.geom_xpos[g], d.geom_xmat[g])
    if gtype == GeomType.PLANE:
      t, nl = _plane_hit(ol, dl)
    elif gtype == GeomType.SPHERE:
      t, nl = _sphere_hit(ol, dl, float(size[0]))
    elif gtype == GeomType.CAPSULE:
      t, nl = _capsule_hit(ol, dl, float(size[0]), float(size[1]))
    elif gtype == GeomType.CYLINDER:
      t, nl = _cylinder_hit(ol, dl, float(size[0]), float(size[1]))
    elif gtype == GeomType.BOX:
      t, nl = _box_hit(ol, dl, jnp.asarray(size, dtype))
    elif gtype == GeomType.ELLIPSOID:
      t, nl = _ellipsoid_hit(ol, dl, jnp.asarray(size, dtype))
    elif gtype == GeomType.MESH:
      tris = jnp.asarray(
          _hull_tri_table(m)[int(m.geom_dataid[g])], dtype)
      t, nl = _mesh_hit(ol, dl, tris)
    else:
      continue
    hit = t < best_t
    n_world = math.normalize(nl @ d.geom_xmat[g].T)
    color = rgba[g, :3]
    if gtype == GeomType.PLANE:
      # checkerboard pattern like the reference's grid material
      p = ol + t[:, None] * dl
      checker = ((jnp.floor(p[:, 0] * 2) + jnp.floor(p[:, 1] * 2)) % 2)
      color = color[None, :] * (0.7 + 0.3 * checker)[:, None]
    best_n = jnp.where(hit[:, None], n_world, best_n)
    best_rgb = jnp.where(hit[:, None],
                         jnp.broadcast_to(color, (n_ray, 3)), best_rgb)
    best_id = jnp.where(hit, g, best_id)
    best_t = jnp.where(hit, t, best_t)

  if segmentation:
    return best_id.reshape(height, width)
  if depth:
    return jnp.where(best_t >= _BIG, jnp.inf, best_t).reshape(
        height, width)

  # shading: headlight + one directional light, ambient floor
  hit_mask = best_t < _BIG
  light_dir = math.normalize(jnp.asarray([-0.3, -0.4, 1.0], dtype))
  lambert = jnp.maximum(jnp.sum(best_n * light_dir, -1), 0.0)
  head = jnp.maximum(jnp.sum(best_n * (-dirs), -1), 0.0)
  shade = 0.25 + 0.45 * lambert + 0.3 * head
  sky = jnp.asarray([0.2, 0.3, 0.45], dtype)
  rgb = jnp.where(hit_mask[:, None], best_rgb * shade[:, None],
                  jnp.broadcast_to(sky, (n_ray, 3)))
  return jnp.clip(rgb, 0.0, 1.0).reshape(height, width, 3)
