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
  """Body/geom/site poses from qpos (reference stage: mj_kinematics).

  Bodies are processed level-by-level with one batched computation per
  (level, joint-signature) group — XLA graph size is O(tree depth), not
  O(nbody)."""
  from dm_control_tpu._src import tree
  tr = tree.get(m)
  dtype = d.qpos.dtype
  qpos = d.qpos
  qpos0 = mparam(m, d, 'qpos0')

  body_pos = mparam(m, d, 'body_pos')
  body_quat = mparam(m, d, 'body_quat')
  jnt_pos = jnp.asarray(m.jnt_pos, dtype)
  jnt_axis = jnp.asarray(m.jnt_axis, dtype)

  xpos = jnp.zeros((m.nbody, 3), dtype)
  xquat = jnp.zeros((m.nbody, 4), dtype).at[0, 0].set(1.0)
  xanchor = jnp.zeros((m.njnt, 3), dtype)
  xaxis = jnp.zeros((m.njnt, 3), dtype)

  for grp in tr.kin_groups:
    ids = grp['ids']
    jids = grp['jids']
    if grp['free']:
      q = qpos[grp['qadr']]                      # (nb, 7)
      pos = q[:, :3]
      quat = math.normalize(q[:, 3:7])
      anchors = pos[:, None, :]
      axes = jnt_axis[jids]
    else:
      ppos = xpos[grp['par']]
      pquat = xquat[grp['par']]
      pos = ppos + math.quat_rotate(pquat, body_pos[ids])
      quat = math.quat_mul(pquat, body_quat[ids])
      anchor_l, axis_l = [], []
      q_g = qpos[grp['qadr']] if grp['qadr'].size else None
      q0_g = qpos0[grp['qadr']] if grp['qadr'].size else None
      off = 0
      for k, jtype in enumerate(grp['sig']):
        jp = jnt_pos[jids[:, k]]                 # (nb, 3)
        ja = jnt_axis[jids[:, k]]
        anchor = math.quat_rotate(quat, jp) + pos
        axis = math.quat_rotate(quat, ja)
        anchor_l.append(anchor)
        axis_l.append(axis)
        if jtype == JointType.SLIDE:
          pos = pos + axis * (q_g[:, off] - q0_g[:, off])[:, None]
          off += 1
        elif jtype == JointType.HINGE:
          angle = q_g[:, off] - q0_g[:, off]
          qloc = math.axis_angle_to_quat(ja, angle)
          quat = math.quat_mul(quat, qloc)
          # rotation is about the anchor, not the frame origin
          pos = anchor - math.quat_rotate(quat, jp)
          off += 1
        elif jtype == JointType.BALL:
          qloc = math.normalize(q_g[:, off:off + 4])
          quat = math.quat_mul(quat, qloc)
          pos = anchor - math.quat_rotate(quat, jp)
          off += 4
        else:
          raise NotImplementedError('free joint must be the only joint')
      quat = math.normalize(quat)
      anchors = (jnp.stack(anchor_l, axis=1) if anchor_l
                 else jnp.zeros((len(ids), 0, 3), dtype))
      axes = (jnp.stack(axis_l, axis=1) if axis_l
              else jnp.zeros((len(ids), 0, 3), dtype))
    xpos = math.safe_set(xpos, ids, pos)
    xquat = math.safe_set(xquat, ids, quat)
    if jids.size:
      xanchor = math.safe_set(xanchor, jids, anchors)
      xaxis = math.safe_set(xaxis, jids, axes)

  xmat = math.quat_to_mat(xquat)

  # inertial frames (math.mul33/rot3: fused elementwise forms — the
  # einsum spelling lowers to convolution + layout copies on TPU)
  body_ipos = jnp.asarray(m.body_ipos, dtype)
  body_iquat = jnp.asarray(m.body_iquat, dtype)
  xipos = xpos + math.rot3(xmat, body_ipos)
  ximat = math.mul33(xmat, math.quat_to_mat(body_iquat))

  # geoms / sites (pos overridable per episode, e.g. moving targets)
  gb = m.geom_bodyid
  geom_xpos = xpos[gb] + math.rot3(xmat[gb], mparam(m, d, 'geom_pos'))
  geom_xmat = math.mul33(
      xmat[gb], math.quat_to_mat(jnp.asarray(m.geom_quat, dtype)))
  sb = m.site_bodyid
  site_xpos = xpos[sb] + math.rot3(xmat[sb], mparam(m, d, 'site_pos'))
  site_xmat = math.mul33(
      xmat[sb], math.quat_to_mat(jnp.asarray(m.site_quat, dtype)))

  return d.replace(
      xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
      geom_xpos=geom_xpos, geom_xmat=geom_xmat,
      site_xpos=site_xpos, site_xmat=site_xmat,
      xanchor=xanchor, xaxis=xaxis)


# ---------------------------------------------------------------------------
# COM-based quantities (reference stage: mj_comPos).
# ---------------------------------------------------------------------------


def com_pos(m: Model, d: Data) -> Data:
  from dm_control_tpu._src import tree
  tr = tree.get(m)
  dtype = d.qpos.dtype
  mass = jnp.asarray(m.body_mass, dtype)

  # subtree com: mass-weighted mean over each body's subtree (static mask)
  sub_mask = jnp.asarray(tr.subtree_mask, dtype)
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
  cinert = math.safe_set(cinert, 0, 0.0)

  # cdof, one batched computation per joint-type group
  cdof = jnp.zeros((m.nv, 6), dtype)
  if len(tr.slide_jids):
    jid = tr.slide_jids
    rows = jnp.concatenate(
        [jnp.zeros((len(jid), 3), dtype), d.xaxis[jid]], axis=1)
    cdof = math.safe_set(cdof, m.jnt_dofadr[jid], rows)
  if len(tr.hinge_jids):
    jid = tr.hinge_jids
    offset = d.xanchor[jid] - root_com[m.jnt_bodyid[jid]]
    ax = d.xaxis[jid]
    rows = jnp.concatenate([ax, jnp.cross(offset, ax)], axis=1)
    cdof = math.safe_set(cdof, m.jnt_dofadr[jid], rows)
  if len(tr.ball_jids):
    jid = tr.ball_jids
    bid = m.jnt_bodyid[jid]
    offset = d.xanchor[jid] - root_com[bid]          # (nb, 3)
    axes = d.xmat[bid].swapaxes(-1, -2)              # (nb, 3 axes, 3)
    rows = jnp.concatenate(
        [axes, jnp.cross(offset[:, None, :], axes)], axis=-1)  # (nb,3,6)
    cdof = math.safe_set(cdof, tr.ball_dmat, rows)
  if len(tr.free_jids):
    jid = tr.free_jids
    bid = m.jnt_bodyid[jid]
    nb = len(jid)
    trans = jnp.broadcast_to(
        jnp.concatenate([jnp.zeros((3, 3), dtype),
                         jnp.eye(3, dtype=dtype)], axis=1)[None],
        (nb, 3, 6))
    off = d.xpos[bid] - root_com[bid]
    axes = d.xmat[bid].swapaxes(-1, -2)
    rot = jnp.concatenate(
        [axes, jnp.cross(off[:, None, :], axes)], axis=-1)
    cdof = math.safe_set(cdof, tr.free_dmat, 
        jnp.concatenate([trans, rot], axis=1))

  return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


# ---------------------------------------------------------------------------
# CRB mass matrix + factorization (reference stages: mj_crb, mj_factorM).
# ---------------------------------------------------------------------------


def crb(m: Model, d: Data) -> Data:
  from dm_control_tpu._src import tree
  tr = tree.get(m)
  dtype = d.qpos.dtype
  # composite inertia per body: sum of cinert over subtree (static mask).
  crb_inert = jnp.einsum(
      'bc,cd->bd', jnp.asarray(tr.subtree_mask, dtype), d.cinert)

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
  """Body spatial velocities + cdof time-derivatives (mj_comVel analog).

  The tree prefix-sums become two constant-mask matmuls: cvel[b] sums
  qvel*cdof over the dofs on b's path; cdof_dot[i] crosses cdof[i] with
  the velocity accumulated strictly before dof i (tree.dof_before)."""
  from dm_control_tpu._src import tree
  tr = tree.get(m)
  dtype = d.qpos.dtype
  if m.nv == 0:
    return d.replace(cvel=jnp.zeros((m.nbody, 6), dtype),
                     cdof_dot=jnp.zeros((0, 6), dtype))
  vc = d.qvel[:, None] * d.cdof                      # (nv, 6)
  cvel = jnp.asarray(m.body_dof_mask, dtype) @ vc    # (nbody, 6)
  v_before = jnp.asarray(tr.dof_before, dtype) @ vc  # (nv, 6)
  cdof_dot = math.motion_cross(v_before, d.cdof)
  cdof_dot = jnp.where(
      jnp.asarray(tr.free_trans)[:, None], 0.0, cdof_dot)
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
  """Tendon lengths/Jacobians: fixed tendons as one segment-sum, spatial
  site-chain tendons as one batched segment computation."""
  dtype = d.qpos.dtype
  if m.ntendon == 0:
    return d
  ten_length = jnp.zeros(m.ntendon, dtype)
  ten_j = jnp.zeros((m.ntendon, m.nv), dtype)

  # static wrap metadata
  fw_tid, fw_wid = [], []
  sp_tid, sp_s1, sp_s2 = [], [], []
  for t in range(m.ntendon):
    adr, num = int(m.tendon_adr[t]), int(m.tendon_num[t])
    wtypes = m.wrap_type[adr:adr + num]
    if all(w == 0 for w in wtypes):  # fixed: joint entries
      for w in range(adr, adr + num):
        fw_tid.append(t)
        fw_wid.append(w)
    else:  # spatial with site via-points
      for w in range(adr, adr + num - 1):
        sp_tid.append(t)
        sp_s1.append(int(m.wrap_objid[w]))
        sp_s2.append(int(m.wrap_objid[w + 1]))

  if fw_tid:
    fw_tid = np.asarray(fw_tid, np.int32)
    fw_wid = np.asarray(fw_wid, np.int32)
    jid = m.wrap_objid[fw_wid]
    wrap_prm = mparam(m, d, 'wrap_prm')
    coef = wrap_prm[fw_wid]
    contrib = coef * d.qpos[m.jnt_qposadr[jid]]
    ten_length = math.safe_add(ten_length, fw_tid, contrib)
    ten_j = math.safe_add(ten_j, (fw_tid, m.jnt_dofadr[jid]), coef)

  if sp_tid:
    sp_tid = np.asarray(sp_tid, np.int32)
    sp_s1 = np.asarray(sp_s1, np.int32)
    sp_s2 = np.asarray(sp_s2, np.int32)
    p1 = d.site_xpos[sp_s1]
    p2 = d.site_xpos[sp_s2]
    diff = p2 - p1
    seg_len = math.norm_safe(diff)
    dir_ = diff / jnp.maximum(seg_len, 1e-12)[:, None]
    ten_length = math.safe_add(ten_length, sp_tid, seg_len)

    def point_jacs(pts, bodies):
      mask = jnp.asarray(m.body_dof_mask[bodies], dtype)  # (ns, nv)
      offset = pts - d.subtree_com[m.body_rootid[bodies]]
      ns = len(bodies)
      jp = (d.cdof[None, :, 3:] + jnp.cross(
          jnp.broadcast_to(d.cdof[None, :, :3], (ns, m.nv, 3)),
          jnp.broadcast_to(offset[:, None, :], (ns, m.nv, 3))))
      return jp * mask[:, :, None]

    j1 = point_jacs(p1, m.site_bodyid[sp_s1])
    j2 = point_jacs(p2, m.site_bodyid[sp_s2])
    contrib = jnp.einsum('svx,sx->sv', j2 - j1, dir_)
    ten_j = math.safe_add(ten_j, sp_tid, contrib)

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
  """Actuator lengths/moments, one batched op per transmission group."""
  from dm_control_tpu._src.types import TrnType
  dtype = d.qpos.dtype
  if m.nu == 0:
    return d.replace(
        actuator_length=jnp.zeros(0, dtype),
        actuator_moment=jnp.zeros((0, m.nv), dtype))
  trn = np.asarray(m.actuator_trntype)
  known = np.isin(trn, [int(TrnType.JOINT), int(TrnType.JOINTINPARENT),
                        int(TrnType.TENDON)])
  if not known.all():
    raise NotImplementedError(
        f'transmission {TrnType(int(trn[~known][0]))}')
  lengths = jnp.zeros(m.nu, dtype)
  moments = jnp.zeros((m.nu, m.nv), dtype)

  jsel = np.where((trn == int(TrnType.JOINT))
                  | (trn == int(TrnType.JOINTINPARENT)))[0]
  if len(jsel):
    jid = m.actuator_trnid[jsel, 0]
    jt = m.jnt_type[jid]
    hs = jsel[np.isin(jt, [int(JointType.SLIDE), int(JointType.HINGE)])]
    if len(hs):
      jj = m.actuator_trnid[hs, 0]
      g0 = jnp.asarray(m.actuator_gear[hs, 0], dtype)
      lengths = math.safe_set(lengths, hs, d.qpos[m.jnt_qposadr[jj]] * g0)
      moments = math.safe_set(moments, (hs, m.jnt_dofadr[jj]), g0)
    for nvj, sel_t in ((3, int(JointType.BALL)), (6, int(JointType.FREE))):
      sel = jsel[jt == sel_t]
      if len(sel):
        jj = m.actuator_trnid[sel, 0]
        dmat = (m.jnt_dofadr[jj][:, None]
                + np.arange(nvj)[None, :]).astype(np.int32)
        urep = np.repeat(sel[:, None], nvj, axis=1)
        gear = jnp.asarray(m.actuator_gear[sel, :nvj], dtype)
        moments = math.safe_set(moments, (urep, dmat), gear)

  tsel = np.where(trn == int(TrnType.TENDON))[0]
  if len(tsel):
    tid = m.actuator_trnid[tsel, 0]
    g0 = jnp.asarray(m.actuator_gear[tsel, 0], dtype)
    lengths = math.safe_set(lengths, tsel, d.ten_length[tid] * g0)
    moments = math.safe_set(moments, tsel, d.ten_J[tid] * g0[:, None])

  return d.replace(actuator_length=lengths, actuator_moment=moments)
