"""Smooth (unconstrained) dynamics pipeline: pure functions over (Model, Data).

Replaces the native forward-dynamics stages of the reference's physics
library (called through ctypes at dm_control/mujoco/engine.py:153-171 and
296-310): kinematics, com-centered quantities, composite-rigid-body mass
matrix, velocity products, and recursive-Newton-Euler bias forces.

TPU-first design notes:
  * The kinematic tree is unrolled at trace time (nbody is static and
    small); every op is batched over the leading `vmap` axis, so the work
    per op is batch-sized — VPU/MXU friendly, no scatter/gather.
  * The mass matrix is DENSE (nv x nv): at suite scale (nv <= 60) dense
    Cholesky + masked einsums beat sparse LTDL on TPU because they map to
    batched matmuls.
  * Ancestor structure is encoded as a constant 0/1 mask (body_dof_mask),
    turning tree recursions into einsums with the mask baked into the
    XLA graph as a constant.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import math
from dm_control_tpu._src.types import Data, JointType, Model


def mparam(m: Model, d: Data, name: str) -> jnp.ndarray:
  """Model array with optional per-episode override from d.model_var."""
  mv = d.model_var or {}
  if name in mv:
    return jnp.asarray(mv[name], d.qpos.dtype)
  return jnp.asarray(getattr(m, name), d.qpos.dtype)


# ---------------------------------------------------------------------------
# Kinematics.
# ---------------------------------------------------------------------------


def kinematics(m: Model, d: Data) -> Data:
  """Body/geom/site poses from qpos (reference stage: mj_kinematics)."""
  dtype = d.qpos.dtype
  qpos = d.qpos
  qpos0 = jnp.asarray(m.qpos0, dtype)

  xpos = [jnp.zeros(3, dtype)]
  xquat = [jnp.array([1.0, 0, 0, 0], dtype)]
  xmat = [jnp.eye(3, dtype=dtype)]

  body_pos = mparam(m, d, 'body_pos')
  body_quat = mparam(m, d, 'body_quat')
  jnt_pos = jnp.asarray(m.jnt_pos, dtype)
  jnt_axis = jnp.asarray(m.jnt_axis, dtype)

  xanchor = [None] * m.njnt
  xaxis = [None] * m.njnt

  for i in range(1, m.nbody):
    p = int(m.body_parentid[i])
    jadr, jnum = int(m.body_jntadr[i]), int(m.body_jntnum[i])

    if (jnum == 1 and m.jnt_type[jadr] == JointType.FREE):
      adr = int(m.jnt_qposadr[jadr])
      pos = qpos[adr:adr + 3]
      quat = math.normalize(qpos[adr + 3:adr + 7])
      xanchor[jadr] = pos
      xaxis[jadr] = jnt_axis[jadr]
    else:
      # frame from parent
      pos = xpos[p] + math.quat_rotate(xquat[p], body_pos[i])
      quat = math.quat_mul(xquat[p], body_quat[i])
      for k in range(jnum):
        j = jadr + k
        jtype = JointType(int(m.jnt_type[j]))
        adr = int(m.jnt_qposadr[j])
        anchor = math.quat_rotate(quat, jnt_pos[j]) + pos
        axis = math.quat_rotate(quat, jnt_axis[j])
        xanchor[j] = anchor
        xaxis[j] = axis
        if jtype == JointType.SLIDE:
          pos = pos + axis * (qpos[adr] - qpos0[adr])
        elif jtype == JointType.HINGE:
          angle = qpos[adr] - qpos0[adr]
          qloc = math.axis_angle_to_quat(jnt_axis[j], angle)
          quat = math.quat_mul(quat, qloc)
          # rotation is about the anchor, not the frame origin
          pos = anchor - math.quat_rotate(quat, jnt_pos[j])
        elif jtype == JointType.BALL:
          qloc = math.normalize(qpos[adr:adr + 4])
          quat = math.quat_mul(quat, qloc)
          pos = anchor - math.quat_rotate(quat, jnt_pos[j])
        else:
          raise NotImplementedError('free joint must be the only joint')

    quat = math.normalize(quat)
    xpos.append(pos)
    xquat.append(quat)
    xmat.append(math.quat_to_mat(quat))

  xpos = jnp.stack(xpos)
  xquat = jnp.stack(xquat)
  xmat = jnp.stack(xmat)

  # inertial frames
  body_ipos = jnp.asarray(m.body_ipos, dtype)
  body_iquat = jnp.asarray(m.body_iquat, dtype)
  xipos = xpos + jnp.einsum('bij,bj->bi', xmat, body_ipos)
  ximat = jnp.einsum('bij,bjk->bik', xmat,
                     math.quat_to_mat(body_iquat))

  # geoms / sites (pos overridable per episode, e.g. moving targets)
  gb = m.geom_bodyid
  geom_xpos = xpos[gb] + jnp.einsum(
      'gij,gj->gi', xmat[gb], mparam(m, d, 'geom_pos'))
  geom_xmat = jnp.einsum(
      'gij,gjk->gik', xmat[gb],
      math.quat_to_mat(jnp.asarray(m.geom_quat, dtype)))
  sb = m.site_bodyid
  site_xpos = xpos[sb] + jnp.einsum(
      'sij,sj->si', xmat[sb], mparam(m, d, 'site_pos'))
  site_xmat = jnp.einsum(
      'sij,sjk->sik', xmat[sb],
      math.quat_to_mat(jnp.asarray(m.site_quat, dtype)))

  if m.njnt:
    xanchor_a = jnp.stack(xanchor)
    xaxis_a = jnp.stack(xaxis)
  else:
    xanchor_a = jnp.zeros((0, 3), dtype)
    xaxis_a = jnp.zeros((0, 3), dtype)

  return d.replace(
      xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
      geom_xpos=geom_xpos, geom_xmat=geom_xmat,
      site_xpos=site_xpos, site_xmat=site_xmat,
      xanchor=xanchor_a, xaxis=xaxis_a)


# ---------------------------------------------------------------------------
# COM-based quantities (reference stage: mj_comPos).
# ---------------------------------------------------------------------------


def com_pos(m: Model, d: Data) -> Data:
  dtype = d.qpos.dtype
  mass = jnp.asarray(m.body_mass, dtype)

  # subtree com: mass-weighted mean over each body's subtree.
  # subtree_mask[b, b2] = 1 if b2 in subtree(b); built at trace time.
  sub_mask = np.zeros((m.nbody, m.nbody))
  for b2 in range(m.nbody):
    b = b2
    while True:
      sub_mask[b, b2] = 1.0
      if b == 0:
        break
      b = int(m.body_parentid[b])
  sub_mask = jnp.asarray(sub_mask, dtype)
  wpos = mass[:, None] * d.xipos
  subtree_mass = sub_mask @ mass
  subtree_com = (sub_mask @ wpos) / jnp.maximum(
      subtree_mass, 1e-12)[:, None]

  # spatial inertia of each body about its tree-root subtree com.
  root_com = subtree_com[m.body_rootid]
  cinert = math.inert_from_body(
      mass, jnp.asarray(m.body_inertia, dtype), d.ximat,
      d.xipos - root_com)
  # world body: zero
  cinert = cinert.at[0].set(0.0)

  # cdof
  if m.nv:
    xanchor, xaxis = d.xanchor, d.xaxis
    cdofs = []
    for j in range(m.njnt):
      jtype = JointType(int(m.jnt_type[j]))
      bodyid = int(m.jnt_bodyid[j])
      offset = xanchor[j] - root_com[bodyid]
      if jtype == JointType.FREE:
        for k in range(3):
          e = jnp.zeros(6, dtype).at[3 + k].set(1.0)
          cdofs.append(e)
        # rotational dofs: body-frame axes, anchored at body frame origin
        off = d.xpos[bodyid] - root_com[bodyid]
        for k in range(3):
          ax = d.xmat[bodyid, :, k]
          cdofs.append(jnp.concatenate([ax, jnp.cross(off, ax)]))
      elif jtype == JointType.BALL:
        for k in range(3):
          ax = d.xmat[bodyid, :, k]
          cdofs.append(jnp.concatenate([ax, jnp.cross(offset, ax)]))
      elif jtype == JointType.SLIDE:
        cdofs.append(jnp.concatenate([jnp.zeros(3, dtype), xaxis[j]]))
      elif jtype == JointType.HINGE:
        cdofs.append(
            jnp.concatenate([xaxis[j], jnp.cross(offset, xaxis[j])]))
    cdof = jnp.stack(cdofs)
  else:
    cdof = jnp.zeros((0, 6), dtype)

  return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


# ---------------------------------------------------------------------------
# CRB mass matrix + factorization (reference stages: mj_crb, mj_factorM).
# ---------------------------------------------------------------------------


def crb(m: Model, d: Data) -> Data:
  dtype = d.qpos.dtype
  # composite inertia per body: sum of cinert over subtree.
  sub_mask = np.zeros((m.nbody, m.nbody))
  for b2 in range(m.nbody):
    b = b2
    while True:
      sub_mask[b, b2] = 1.0
      if b == 0:
        break
      b = int(m.body_parentid[b])
  crb_inert = jnp.einsum(
      'bc,cd->bd', jnp.asarray(sub_mask, dtype), d.cinert)

  if m.nv == 0:
    return d.replace(qM=jnp.zeros((0, 0), dtype), qLD=jnp.zeros((0, 0), dtype))

  # f_i = I^crb_{body(i)} * cdof_i
  f = math.inert_mul(crb_inert[m.dof_bodyid], d.cdof)  # (nv, 6)
  a = jnp.einsum('ik,jk->ij', f, d.cdof)  # (nv, nv)

  # anc[i, j] = 1 if dof j is on the path to body(dof i) (incl. same body)
  anc = jnp.asarray(m.body_dof_mask[m.dof_bodyid], dtype)  # (nv, nv)
  qm = jnp.where(anc > 0, a, jnp.where(anc.T > 0, a.T, 0.0))
  qm = qm + jnp.diag(jnp.asarray(m.dof_armature, dtype))
  return d.replace(qM=qm)


def factor_m(m: Model, d: Data) -> Data:
  """Dense Cholesky of qM (the TPU replacement for sparse LTDL)."""
  if m.nv == 0:
    return d
  from dm_control_tpu._src import linalg
  return d.replace(qLD=linalg.cholesky(d.qM))


def solve_m(m: Model, d: Data, x: jax.Array) -> jax.Array:
  """Solve qM y = x using the cached Cholesky factor."""
  from dm_control_tpu._src import linalg
  return linalg.cho_solve(d.qLD, x)


# ---------------------------------------------------------------------------
# Velocity products (reference stage: mj_comVel).
# ---------------------------------------------------------------------------


def com_vel(m: Model, d: Data) -> Data:
  dtype = d.qpos.dtype
  cvel = [jnp.zeros(6, dtype)]
  cdof_dot = [None] * m.nv
  for i in range(1, m.nbody):
    p = int(m.body_parentid[i])
    v = cvel[p]
    adr, n = int(m.body_dofadr[i]), int(m.body_dofnum[i])
    jadr, jnum = int(m.body_jntadr[i]), int(m.body_jntnum[i])
    if n == 0:
      cvel.append(v)
      continue
    # iterate joints of this body, accumulating velocity; cdof_dot of a dof
    # uses the velocity accumulated *before* that dof's own contribution,
    # except ball/free rotational triples which use the full local spin.
    dof = adr
    for k in range(jnum):
      j = jadr + k
      jtype = JointType(int(m.jnt_type[j]))
      if jtype == JointType.FREE:
        # translations contribute no cdof_dot
        for t in range(3):
          cdof_dot[dof + t] = jnp.zeros(6, dtype)
        v = v + jnp.einsum('k,kx->x', d.qvel[dof:dof + 3],
                           d.cdof[dof:dof + 3])
        # rotations: cdof_dot = v x cdof (v including translations)
        for t in range(3, 6):
          cdof_dot[dof + t] = math.motion_cross(v, d.cdof[dof + t])
        v = v + jnp.einsum('k,kx->x', d.qvel[dof + 3:dof + 6],
                           d.cdof[dof + 3:dof + 6])
        dof += 6
      elif jtype == JointType.BALL:
        for t in range(3):
          cdof_dot[dof + t] = math.motion_cross(v, d.cdof[dof + t])
        v = v + jnp.einsum('k,kx->x', d.qvel[dof:dof + 3],
                           d.cdof[dof:dof + 3])
        dof += 3
      else:
        cdof_dot[dof] = math.motion_cross(v, d.cdof[dof])
        v = v + d.qvel[dof] * d.cdof[dof]
        dof += 1
    cvel.append(v)
  cvel = jnp.stack(cvel)
  cdof_dot = (jnp.stack(cdof_dot) if m.nv else jnp.zeros((0, 6), dtype))
  return d.replace(cvel=cvel, cdof_dot=cdof_dot)


# ---------------------------------------------------------------------------
# RNE bias forces (reference stage: mj_rne).
# ---------------------------------------------------------------------------


def rne(m: Model, d: Data) -> Data:
  dtype = d.qpos.dtype
  gravity = jnp.asarray(m.opt.gravity, dtype)
  from dm_control_tpu._src.types import DisableBit
  if m.opt.disableflags & DisableBit.GRAVITY:
    gravity = jnp.zeros(3, dtype)

  mask = jnp.asarray(m.body_dof_mask, dtype)  # (nbody, nv)

  # body accelerations (qacc = 0): cacc = -g + sum over path cdof_dot*qvel
  base = jnp.concatenate([jnp.zeros(3, dtype), -gravity])
  if m.nv:
    cacc = base + jnp.einsum(
        'bv,v,vx->bx', mask, d.qvel, d.cdof_dot)
  else:
    cacc = jnp.broadcast_to(base, (m.nbody, 6))

  # per-body forces
  cfrc = (math.inert_mul(d.cinert, cacc)
          + math.motion_cross_force(d.cvel, math.inert_mul(d.cinert, d.cvel)))

  # qfrc_bias_i = cdof_i . sum_{b: i on path(b)} cfrc_b
  if m.nv:
    qfrc_bias = jnp.einsum('bv,bx,vx->v', mask, cfrc, d.cdof)
  else:
    qfrc_bias = jnp.zeros(0, dtype)
  return d.replace(qfrc_bias=qfrc_bias)


# ---------------------------------------------------------------------------
# Tendons (reference stage: mj_tendon) - fixed + site-spatial.
# ---------------------------------------------------------------------------


def tendon(m: Model, d: Data) -> Data:
  dtype = d.qpos.dtype
  if m.ntendon == 0:
    return d
  lengths = []
  jacs = []
  mask = jnp.asarray(m.body_dof_mask, dtype)
  for t in range(m.ntendon):
    adr, num = int(m.tendon_adr[t]), int(m.tendon_num[t])
    wtypes = m.wrap_type[adr:adr + num]
    if all(w == 0 for w in wtypes):  # fixed: joint entries
      length = jnp.zeros((), dtype)
      jac = jnp.zeros(m.nv, dtype)
      wrap_prm = mparam(m, d, 'wrap_prm')
      for w in range(adr, adr + num):
        j = int(m.wrap_objid[w])
        coef = wrap_prm[w]
        qadr = int(m.jnt_qposadr[j])
        dadr = int(m.jnt_dofadr[j])
        length = length + coef * d.qpos[qadr]
        jac = jac.at[dadr].add(coef)
      lengths.append(length)
      jacs.append(jac)
    else:  # spatial with site via-points
      length = jnp.zeros((), dtype)
      jac = jnp.zeros(m.nv, dtype)
      for w in range(adr, adr + num - 1):
        s1, s2 = int(m.wrap_objid[w]), int(m.wrap_objid[w + 1])
        p1, p2 = d.site_xpos[s1], d.site_xpos[s2]
        diff = p2 - p1
        seg_len = math.norm_safe(diff)
        dir_ = diff / jnp.maximum(seg_len, 1e-12)
        length = length + seg_len
        j1 = _point_jacobian(m, d, p1, int(m.site_bodyid[s1]), mask)
        j2 = _point_jacobian(m, d, p2, int(m.site_bodyid[s2]), mask)
        jac = jac + (j2 - j1) @ dir_
      lengths.append(length)
      jacs.append(jac)
  ten_length = jnp.stack(lengths)
  ten_j = jnp.stack(jacs)
  ten_velocity = ten_j @ d.qvel if m.nv else jnp.zeros(m.ntendon, dtype)
  return d.replace(ten_length=ten_length, ten_J=ten_j,
                   ten_velocity=ten_velocity)


def _point_jacobian(m: Model, d: Data, point: jax.Array, bodyid: int,
                    mask: jax.Array) -> jax.Array:
  """Translational jacobian (nv, 3) of a world point on `bodyid`."""
  offset = point - d.subtree_com[m.body_rootid[bodyid]]
  jacp = d.cdof[:, 3:] + jnp.cross(
      jnp.broadcast_to(d.cdof[:, :3], (m.nv, 3)),
      jnp.broadcast_to(offset, (m.nv, 3)))
  return jacp * mask[bodyid][:, None]


def jac(m: Model, d: Data, point: jax.Array,
        bodyid: int) -> Tuple[jax.Array, jax.Array]:
  """(jacp (nv,3), jacr (nv,3)) for a world point on a body."""
  dtype = d.qpos.dtype
  mask = jnp.asarray(m.body_dof_mask, dtype)
  jacp = _point_jacobian(m, d, point, bodyid, mask)
  jacr = d.cdof[:, :3] * mask[bodyid][:, None]
  return jacp, jacr


# ---------------------------------------------------------------------------
# Actuator transmission (reference stage: mj_transmission).
# ---------------------------------------------------------------------------


def transmission(m: Model, d: Data) -> Data:
  from dm_control_tpu._src.types import TrnType
  dtype = d.qpos.dtype
  if m.nu == 0:
    return d.replace(
        actuator_length=jnp.zeros(0, dtype),
        actuator_moment=jnp.zeros((0, m.nv), dtype))
  lengths = []
  moments = []
  for u in range(m.nu):
    trntype = TrnType(int(m.actuator_trntype[u]))
    gear = jnp.asarray(m.actuator_gear[u], dtype)
    if trntype in (TrnType.JOINT, TrnType.JOINTINPARENT):
      j = int(m.actuator_trnid[u, 0])
      jtype = JointType(int(m.jnt_type[j]))
      qadr, dadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
      if jtype in (JointType.SLIDE, JointType.HINGE):
        lengths.append(d.qpos[qadr] * gear[0])
        moments.append(jnp.zeros(m.nv, dtype).at[dadr].set(gear[0]))
      elif jtype == JointType.BALL:
        # length 0; moment = gear[:3] in joint-local axes
        lengths.append(jnp.zeros((), dtype))
        mom = jnp.zeros(m.nv, dtype)
        mom = mom.at[dadr:dadr + 3].set(gear[:3])
        moments.append(mom)
      else:  # FREE
        lengths.append(jnp.zeros((), dtype))
        mom = jnp.zeros(m.nv, dtype).at[dadr:dadr + 6].set(gear[:6])
        moments.append(mom)
    elif trntype == TrnType.TENDON:
      t = int(m.actuator_trnid[u, 0])
      lengths.append(d.ten_length[t] * gear[0])
      moments.append(d.ten_J[t] * gear[0])
    else:
      raise NotImplementedError(f'transmission {trntype}')
  return d.replace(actuator_length=jnp.stack(lengths),
                   actuator_moment=jnp.stack(moments))
