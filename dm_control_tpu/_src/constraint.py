"""Constraint assembly: equality / friction / limit / contact -> efc rows.

Replaces the reference's native mj_makeConstraint stage with a fixed-size
row layout (static shapes for XLA), derived once per model by efc.layout.
The soft-constraint parameterization (solref/solimp -> stiffness, damping,
impedance, and the regularizer R) follows the reference's documented
constraint model; row parameters (efc_D, efc_aref, row Jacobians) are
validated field-by-field against the oracle in tests/test_constraint.py.

TPU-first: every row family (dof friction, joint/tendon limits, contact
normal / pyramid-edge / elliptic-friction rows) is assembled as ONE batched
computation over static index arrays — the XLA graph size is O(row
families), not O(rows), which is what keeps humanoid_CMU/dog-scale models
compiling fast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import efc
from dm_control_tpu._src import math
from dm_control_tpu._src import smooth
from dm_control_tpu._src.types import (Data, DisableBit, EqType, JointType,
                                       Model)

layout = efc.layout


# the reference clamps impedance endpoints into [mjMINIMP, mjMAXIMP]
# BEFORE interpolating (verified against oracle efc_D on solimp dmin=0
# models like finger.xml).
_MINIMP, _MAXIMP = 1e-4, 0.9999


def _impedance(solimp, pos_minus_margin):
  """Impedance d(x) from solimp = (dmin, dmax, width, midpoint, power)."""
  dmin = jnp.clip(solimp[..., 0], _MINIMP, _MAXIMP)
  dmax = jnp.clip(solimp[..., 1], _MINIMP, _MAXIMP)
  width, mid, power = solimp[..., 2], solimp[..., 3], solimp[..., 4]
  x = jnp.clip(jnp.abs(pos_minus_margin) / jnp.maximum(width, 1e-14),
               0.0, 1.0)
  # reflected power sigmoid through (0,0), (mid, mid'), (1,1)
  a = 1.0 / jnp.power(jnp.maximum(mid, 1e-14), power - 1.0)
  b = 1.0 / jnp.power(jnp.maximum(1.0 - mid, 1e-14), power - 1.0)
  y_lo = a * jnp.power(x, power)
  y_hi = 1.0 - b * jnp.power(1.0 - x, power)
  y = jnp.where(x < mid, y_lo, y_hi)
  return dmin + y * (dmax - dmin)


def _kbi(m: Model, solref, solimp, pos_minus_margin):
  """(stiffness k, damping b, impedance) from solref/solimp."""
  imp = _impedance(solimp, pos_minus_margin)
  dmax = jnp.clip(solimp[..., 1], _MINIMP, _MAXIMP)
  timeconst, dampratio = solref[..., 0], solref[..., 1]
  if not (m.opt.disableflags & DisableBit.REFSAFE):
    timeconst = jnp.maximum(timeconst, 2.0 * m.opt.timestep)
  direct = solref[..., 0] <= 0
  k_std = 1.0 / jnp.maximum(
      dmax * dmax * timeconst * timeconst * dampratio * dampratio, 1e-14)
  b_std = 2.0 / jnp.maximum(dmax * timeconst, 1e-14)
  k = jnp.where(direct, -solref[..., 0] / jnp.maximum(dmax * dmax, 1e-14),
                k_std)
  b = jnp.where(direct, -solref[..., 1] / jnp.maximum(dmax, 1e-14), b_std)
  return k, b, imp


class _Blocks:
  """Ordered efc blocks, concatenated once at the end (static shapes)."""

  def __init__(self, m: Model, d: Data):
    self.m, self.d = m, d
    self.J, self.pos, self.margin = [], [], []
    self.D, self.aref, self.frictionloss = [], [], []
    self.active = []

  def add(self, J, pos, margin, solref, solimp, invweight, active,
          frictionloss=None, pos_for_imp=None, D=None, aref=None):
    """One block of n rows.  J (n, nv); scalars broadcast to (n,)."""
    m, d = self.m, self.d
    dtype = d.qpos.dtype
    n = J.shape[0]
    b1 = lambda x: jnp.broadcast_to(jnp.asarray(x, dtype), (n,))
    pos = b1(pos)
    margin = b1(margin)
    if D is None or aref is None:
      pmm = (b1(pos_for_imp) if pos_for_imp is not None else pos) - margin
      k, b, imp = _kbi(m, jnp.asarray(solref, dtype),
                       jnp.asarray(solimp, dtype), pmm)
      if D is None:
        r = jnp.maximum((1.0 - imp) / imp * b1(invweight), 1e-14)
        D = 1.0 / r
      if aref is None:
        vel = J @ d.qvel
        aref = -b * vel - k * imp * (pos - margin)
    self.J.append(J)
    self.pos.append(pos)
    self.margin.append(margin)
    self.D.append(b1(D))
    self.aref.append(b1(aref))
    self.frictionloss.append(
        b1(0.0 if frictionloss is None else frictionloss))
    self.active.append(jnp.broadcast_to(jnp.asarray(active, bool), (n,)))

  def finalize(self) -> Data:
    d = self.d
    nefc = d.efc_J.shape[0]
    if not self.J:
      assert nefc == 0
      return d
    J = jnp.concatenate(self.J)
    assert J.shape[0] == nefc, (
        f'constraint row count {J.shape[0]} != allocated {nefc}')
    return d.replace(
        efc_J=J,
        efc_pos=jnp.concatenate(self.pos),
        efc_margin=jnp.concatenate(self.margin),
        efc_D=jnp.concatenate(self.D),
        efc_aref=jnp.concatenate(self.aref),
        efc_frictionloss=jnp.concatenate(self.frictionloss),
        efc_active=jnp.concatenate(self.active),
    )


def make_constraint(m: Model, d: Data) -> Data:
  if m.opt.disableflags & DisableBit.CONSTRAINT:
    return d
  lay = layout(m)
  dtype = d.qpos.dtype
  blocks = _Blocks(m, d)

  # --- equality (per-row loop; neq is small) -------------------------------
  if not (m.opt.disableflags & DisableBit.EQUALITY):
    for e in range(m.neq):
      _equality_rows(m, d, e, blocks)

  # --- dof friction loss ----------------------------------------------------
  if lay.fric_dof.size:
    idx = lay.fric_dof
    J = jnp.asarray(np.eye(m.nv)[idx], dtype)
    vel = d.qvel[idx]
    solref = jnp.asarray(m.dof_solref[idx], dtype)
    solimp = jnp.asarray(m.dof_solimp[idx], dtype)
    _, b, imp = _kbi(m, solref, solimp, jnp.zeros(idx.size, dtype))
    r = jnp.maximum(
        (1.0 - imp) / imp * jnp.asarray(m.dof_invweight0[idx], dtype),
        1e-14)
    blocks.add(J, 0.0, 0.0, solref, solimp, None, True,
               frictionloss=jnp.asarray(m.dof_frictionloss[idx], dtype),
               D=1.0 / r, aref=-b * vel)

  # --- tendon friction loss ---------------------------------------------------
  if lay.fric_ten.size:
    idx = lay.fric_ten
    J = d.ten_J[idx]
    vel = d.ten_velocity[idx]
    solref = jnp.asarray(m.tendon_solref_fri[idx], dtype)
    solimp = jnp.asarray(m.tendon_solimp_fri[idx], dtype)
    _, b, imp = _kbi(m, solref, solimp, jnp.zeros(idx.size, dtype))
    r = jnp.maximum(
        (1.0 - imp) / imp * jnp.asarray(m.tendon_invweight0[idx], dtype),
        1e-14)
    blocks.add(J, 0.0, 0.0, solref, solimp, None, True,
               frictionloss=jnp.asarray(m.tendon_frictionloss[idx], dtype),
               D=1.0 / r, aref=-b * vel)

  # --- joint limits (slide/hinge, vectorized) --------------------------------
  if lay.lim_jnt.size:
    jid = lay.lim_jnt
    qadr = m.jnt_qposadr[jid]
    dadr = m.jnt_dofadr[jid]
    lo = jnp.asarray(m.jnt_range[jid, 0], dtype)
    hi = jnp.asarray(m.jnt_range[jid, 1], dtype)
    q = d.qpos[qadr]
    dist_lo = q - lo
    dist_hi = hi - q
    lower_closer = dist_lo < dist_hi
    dist = jnp.minimum(dist_lo, dist_hi)
    sign = jnp.where(lower_closer, 1.0, -1.0)
    J = jnp.asarray(np.eye(m.nv)[dadr], dtype) * sign[:, None]
    margin = jnp.asarray(m.jnt_margin[jid], dtype)
    blocks.add(J, dist, margin, jnp.asarray(m.jnt_solref[jid], dtype),
               jnp.asarray(m.jnt_solimp[jid], dtype),
               jnp.asarray(m.dof_invweight0[dadr], dtype), dist < margin)

  # --- ball joint limits (loop; rare) -----------------------------------------
  for j in lay.lim_ball:
    qadr, dadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
    margin = float(m.jnt_margin[j])
    axis = math.quat_sub(d.qpos[qadr:qadr + 4],
                         jnp.asarray([1.0, 0, 0, 0], dtype))
    angle = math.norm_safe(axis)
    limit = float(np.max(np.abs(m.jnt_range[j])))
    dist = limit - angle
    dir_ = axis / jnp.maximum(angle, 1e-14)
    J = math.safe_set(jnp.zeros((1, m.nv), dtype), (0, slice(dadr, dadr + 3)), -dir_)
    blocks.add(J, dist, margin, m.jnt_solref[j], m.jnt_solimp[j],
               float(m.dof_invweight0[dadr]), dist < margin)

  # --- tendon limits -----------------------------------------------------------
  if lay.lim_ten.size:
    tid = lay.lim_ten
    lo = jnp.asarray(m.tendon_range[tid, 0], dtype)
    hi = jnp.asarray(m.tendon_range[tid, 1], dtype)
    length = d.ten_length[tid]
    dist_lo = length - lo
    dist_hi = hi - length
    lower_closer = dist_lo < dist_hi
    dist = jnp.minimum(dist_lo, dist_hi)
    sign = jnp.where(lower_closer, 1.0, -1.0)
    J = d.ten_J[tid] * sign[:, None]
    margin = jnp.asarray(m.tendon_margin[tid], dtype)
    blocks.add(J, dist, margin,
               jnp.asarray(m.tendon_solref_lim[tid], dtype),
               jnp.asarray(m.tendon_solimp_lim[tid], dtype),
               jnp.asarray(m.tendon_invweight0[tid], dtype), dist < margin)

  # --- contacts -----------------------------------------------------------------
  if lay.contact is not None and lay.contact.ncon:
    _contact_rows(m, d, lay, blocks)

  return blocks.finalize()


def _equality_rows(m: Model, d: Data, e: int, blocks: _Blocks):
  dtype = d.qpos.dtype
  etype = EqType(int(m.eq_type[e]))
  solref, solimp = m.eq_solref[e], m.eq_solimp[e]
  data = m.eq_data[e]
  active = bool(m.eq_active0[e])
  if etype == EqType.CONNECT:
    b1, b2 = int(m.eq_obj1id[e]), int(m.eq_obj2id[e])
    anchor = jnp.asarray(data[:3], dtype)
    # anchor is in body1 local frame
    p1 = d.xpos[b1] + d.xmat[b1] @ anchor
    p2 = d.xpos[b2] + d.xmat[b2] @ jnp.asarray(data[3:6], dtype)
    jac1p, _ = smooth.jac(m, d, p1, b1)
    jac2p, _ = smooth.jac(m, d, p2, b2)
    jdiff = (jac1p - jac2p).T  # (3, nv)
    pos = p1 - p2
    invweight = float(m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0])
    blocks.add(jdiff, pos, 0.0, np.broadcast_to(solref, (3, 2)),
               np.broadcast_to(solimp, (3, 5)), invweight, active)
  elif etype == EqType.WELD:
    b1, b2 = int(m.eq_obj1id[e]), int(m.eq_obj2id[e])
    anchor = jnp.asarray(data[:3], dtype)
    relpose = jnp.asarray(data[3:10], dtype)
    p1 = d.xpos[b1] + d.xmat[b1] @ anchor
    p2 = d.xpos[b2] + d.xmat[b2] @ anchor  # same local anchor on body2
    jac1p, jac1r = smooth.jac(m, d, p1, b1)
    jac2p, jac2r = smooth.jac(m, d, p2, b2)
    jdiffp = (jac1p - jac2p).T
    jdiffr = (jac1r - jac2r).T
    pos = p1 - p2
    # orientation error: quat difference vs relpose
    qtarget = math.quat_mul(d.xquat[b2], relpose[3:7])
    qerr = math.quat_sub(d.xquat[b1], qtarget)
    invweight_t = float(m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0])
    invweight_r = float(m.body_invweight0[b1, 1] + m.body_invweight0[b2, 1])
    blocks.add(jdiffp, pos, 0.0, np.broadcast_to(solref, (3, 2)),
               np.broadcast_to(solimp, (3, 5)), invweight_t, active)
    blocks.add(jdiffr, qerr, 0.0, np.broadcast_to(solref, (3, 2)),
               np.broadcast_to(solimp, (3, 5)), invweight_r, active)
  elif etype == EqType.JOINT:
    j1, j2 = int(m.eq_obj1id[e]), int(m.eq_obj2id[e])
    q1adr, d1adr = int(m.jnt_qposadr[j1]), int(m.jnt_dofadr[j1])
    poly = jnp.asarray(data[:5], dtype)
    q1 = d.qpos[q1adr] - smooth.mparam(m, d, 'qpos0')[q1adr]
    invweight = float(m.dof_invweight0[d1adr])
    if j2 >= 0:
      q2adr, d2adr = int(m.jnt_qposadr[j2]), int(m.jnt_dofadr[j2])
      q2 = d.qpos[q2adr] - smooth.mparam(m, d, 'qpos0')[q2adr]
      # pos = q1 - qpos0_1 - poly(q2 - qpos0_2)
      powers = jnp.stack([q2 ** i for i in range(5)])
      pos = q1 - poly @ powers
      dpoly = jnp.stack(
          [i * q2 ** (i - 1) if i > 0 else jnp.zeros((), dtype)
           for i in range(5)])
      jrow = math.safe_set(jnp.zeros(m.nv, dtype), d1adr, 1.0)
      jrow = math.safe_set(jrow, d2adr, -(poly @ dpoly))
      invweight += float(m.dof_invweight0[d2adr])
    else:
      pos = q1 - poly[0]
      jrow = math.safe_set(jnp.zeros(m.nv, dtype), d1adr, 1.0)
    blocks.add(jrow[None], pos, 0.0, solref[None], solimp[None],
               invweight, active)
  elif etype == EqType.TENDON:
    t1, t2 = int(m.eq_obj1id[e]), int(m.eq_obj2id[e])
    poly = jnp.asarray(data[:5], dtype)
    l1 = d.ten_length[t1] - jnp.asarray(m.tendon_length0[t1], dtype)
    invweight = float(m.tendon_invweight0[t1])
    if t2 >= 0:
      l2 = d.ten_length[t2] - jnp.asarray(m.tendon_length0[t2], dtype)
      powers = jnp.stack([l2 ** i for i in range(5)])
      pos = l1 - poly @ powers
      dpoly = jnp.stack(
          [i * l2 ** (i - 1) if i > 0 else jnp.zeros((), dtype)
           for i in range(5)])
      jrow = d.ten_J[t1] - (poly @ dpoly) * d.ten_J[t2]
      invweight += float(m.tendon_invweight0[t2])
    else:
      pos = l1 - poly[0]
      jrow = d.ten_J[t1]
    blocks.add(jrow[None], pos, 0.0, solref[None], solimp[None],
               invweight, active)
  else:
    raise NotImplementedError(f'equality {etype}')


def contact_jacobians(m: Model, d: Data, lay: efc.Layout):
  """Batched contact-frame Jacobians.

  Returns (jn (ncon, nv), jdirs (ncon, ndir, nv)): the normal-direction
  relative-velocity Jacobian of each contact, and the tangential (+
  rotational, when any contact has condim > 3) direction rows.

  TPU formulation (profiled on humanoid@4096): the naive per-contact
  point Jacobian materializes (ncon, nv, 3) tensors whose einsum
  contractions dominate the substep (one 4.9 ms fusion + layout copies
  per evaluation).  The directional rows only ever need
  J . f = mask * (f . cdof_lin[v] + (off x f) . cdof_ang[v])
  (scalar triple product a x b . c = a . (b x c)), which is two
  (ncon, 3) @ (3, nv) matmuls per direction — MXU work with no rank-3
  intermediate.  Body-indexed reads go through one-hot matmuls instead
  of row gathers (the top-K broadphase makes the ids dynamic)."""
  con = d.contact
  c = lay.contact
  dtype = d.qpos.dtype
  nbody = m.nbody
  dof_mask = jnp.asarray(m.body_dof_mask, dtype)      # (nbody, nv)
  B1 = jax.nn.one_hot(con.body1, nbody, dtype=dtype)  # (ncon, nbody)
  B2 = jax.nn.one_hot(con.body2, nbody, dtype=dtype)
  # subtree_com of each body's tree root; rootid indexing is static
  root_com = d.subtree_com[np.asarray(m.body_rootid)]  # (nbody, 3)
  mask1 = B1 @ dof_mask                                # (ncon, nv)
  mask2 = B2 @ dof_mask
  off1 = con.pos - B1 @ root_com                       # (ncon, 3)
  off2 = con.pos - B2 @ root_com
  cdof_ang, cdof_lin = d.cdof[:, :3], d.cdof[:, 3:]

  def jdiff_p(f):
    lin = f @ cdof_lin.T                               # (ncon, nv)
    a1 = jnp.cross(off1, f) @ cdof_ang.T
    a2 = jnp.cross(off2, f) @ cdof_ang.T
    return mask2 * (lin + a2) - mask1 * (lin + a1)

  jn = jdiff_p(con.frame[:, 0])
  ndir = min(c.max_dir, 2) if c.max_dir <= 2 else 5
  if ndir == 0:
    return jn, jnp.zeros((c.ncon, 0, m.nv), dtype)
  jt = jnp.stack([jdiff_p(con.frame[:, 1]),
                  jdiff_p(con.frame[:, 2])], axis=1)   # (ncon, 2, nv)
  if ndir <= 2:
    return jn, jt
  dmask = mask2 - mask1
  jr = jnp.stack([dmask * (con.frame[:, k] @ cdof_ang.T)
                  for k in range(3)], axis=1)          # (ncon, 3, nv)
  return jn, jnp.concatenate([jt, jr], axis=1)


def _contact_rows(m: Model, d: Data, lay: efc.Layout, blocks: _Blocks):
  """All contact efc rows as one scatter into a contiguous block."""
  con = d.contact
  c = lay.contact
  dtype = d.qpos.dtype
  nrows = lay.nefc - lay.n_noncontact
  base = lay.n_noncontact
  impratio = float(getattr(m.opt, 'impratio', 1.0))

  jn, jdirs = contact_jacobians(m, d, lay)

  # per-contact soft-constraint params
  dist = con.dist
  margin = con.includemargin
  k, b, imp = _kbi(m, con.solref, con.solimp, dist - margin)
  # invweight gathered by (possibly traced) contact body ids
  biw = jnp.asarray(m.body_invweight0[:, 0], dtype)
  iw = biw[con.body1] + biw[con.body2]
  r_n = jnp.maximum((1.0 - imp) / imp * iw, 1e-14)
  d_n = 1.0 / r_n                      # plain normal-row D
  active = dist < margin
  vel_n = jn @ d.qvel
  aref_n = -b * vel_n - k * imp * (dist - margin)
  mu1 = jnp.asarray(c.friction[:, 0] if c.ncon else np.zeros(0), dtype)

  J = jnp.zeros((nrows, m.nv), dtype)
  pos = jnp.zeros((nrows,), dtype)
  marg = jnp.zeros((nrows,), dtype)
  D = jnp.full((nrows,), 1.0, dtype)
  aref = jnp.zeros((nrows,), dtype)
  act = jnp.zeros((nrows,), bool)

  # normal rows (condim==1 contacts + elliptic normals)
  if c.nrm_row.size:
    rows = c.nrm_row - base
    ci = c.nrm_con
    J = math.safe_set(J, rows, jn[ci])
    pos = math.safe_set(pos, rows, dist[ci])
    marg = math.safe_set(marg, rows, margin[ci])
    D = math.safe_set(D, rows, d_n[ci])
    aref = math.safe_set(aref, rows, aref_n[ci])
    act = math.safe_set(act, rows, active[ci])

  # pyramidal edge rows
  if c.pyr_row.size:
    rows = c.pyr_row - base
    ci = c.pyr_con
    mu_dir = jnp.asarray(c.friction[c.pyr_con, c.pyr_dir], dtype)
    sign = jnp.asarray(c.pyr_sign, dtype)
    Jp = jn[ci] + (sign * mu_dir)[:, None] * jdirs[ci, c.pyr_dir]
    vel = Jp @ d.qvel
    # pyramid-edge D: all edges share the mu_1-based scaling
    # (oracle-verified: efc_D identical across directions), / impratio.
    mu2 = mu1[ci] * mu1[ci]
    d_p = d_n[ci] / (2.0 * mu2 * (1.0 + mu2)) * impratio
    aref_p = -b[ci] * vel - (k * imp)[ci] * (dist[ci] - margin[ci])
    J = math.safe_set(J, rows, Jp)
    pos = math.safe_set(pos, rows, dist[ci])
    marg = math.safe_set(marg, rows, margin[ci])
    D = math.safe_set(D, rows, d_p)
    aref = math.safe_set(aref, rows, aref_p)
    act = math.safe_set(act, rows, active[ci])

  # elliptic friction rows
  if c.ellf_row.size:
    rows = c.ellf_row - base
    ci = c.ellf_con
    Jf = jdirs[ci, c.ellf_dir]
    vel = Jf @ d.qvel
    mu_dir = jnp.asarray(c.friction[c.ellf_con, c.ellf_dir], dtype)
    ratio = mu_dir / mu1[ci]
    d_f = d_n[ci] * ratio * ratio * impratio
    J = math.safe_set(J, rows, Jf)
    # pos/margin stay 0: elliptic friction rows have no spring term
    D = math.safe_set(D, rows, d_f)
    aref = math.safe_set(aref, rows, -b[ci] * vel)
    act = math.safe_set(act, rows, active[ci])

  blocks.J.append(J)
  blocks.pos.append(pos)
  blocks.margin.append(marg)
  blocks.D.append(D)
  blocks.aref.append(aref)
  blocks.frictionloss.append(jnp.zeros((nrows,), dtype))
  blocks.active.append(act)
