"""Constraint assembly: equality / friction / limit / contact -> efc rows.

Replaces the reference's native mj_makeConstraint stage with a fixed-size,
maskable row layout (static shapes for XLA): rows are always allocated,
`efc_active` marks which participate this step.  The soft-constraint
parameterization (solref/solimp -> stiffness, damping, impedance, and the
regularizer R) follows the reference's documented constraint model so
forces match within float tolerance.

Row order (matching the reference): equality, dof friction, joint limits,
tendon limits, contacts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import math
from dm_control_tpu._src import smooth
from dm_control_tpu._src.types import (ConeType, Data, DisableBit, EqType,
                                       JointType, Model)
from dm_control_tpu._src import solver as _solver


def _impedance(solimp, pos_minus_margin):
  """Impedance d(x) from solimp = (dmin, dmax, width, midpoint, power)."""
  dmin, dmax, width, mid, power = (
      solimp[..., 0], solimp[..., 1], solimp[..., 2], solimp[..., 3],
      solimp[..., 4])
  x = jnp.clip(jnp.abs(pos_minus_margin) / jnp.maximum(width, 1e-14),
               0.0, 1.0)
  # reflected power sigmoid through (0,0), (mid, mid'), (1,1)
  a = 1.0 / jnp.power(jnp.maximum(mid, 1e-14), power - 1.0)
  b = 1.0 / jnp.power(jnp.maximum(1.0 - mid, 1e-14), power - 1.0)
  y_lo = a * jnp.power(x, power)
  y_hi = 1.0 - b * jnp.power(1.0 - x, power)
  y = jnp.where(x < mid, y_lo, y_hi)
  imp = dmin + y * (dmax - dmin)
  return jnp.clip(imp, 1e-8, 1.0 - 1e-8)


def _kbi(m: Model, solref, solimp, pos_minus_margin):
  """(stiffness k, damping b, impedance) from solref/solimp."""
  imp = _impedance(solimp, pos_minus_margin)
  dmax = solimp[..., 1]
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


class Rows:
  """Accumulates efc rows (python lists of jnp values, stacked at the end)."""

  def __init__(self, m: Model, d: Data):
    self.m, self.d = m, d
    self.J, self.pos, self.margin = [], [], []
    self.D, self.aref, self.frictionloss = [], [], []
    self.active = []
    self.types = []

  def add(self, jrow, pos, margin, solref, solimp, invweight,
          active, frictionloss=0.0, pos_for_imp=None,
          rowtype=_solver.ONESIDED):
    """One row. pos_for_imp overrides the impedance input (contacts)."""
    m, d = self.m, self.d
    dtype = d.qpos.dtype
    pmm = (pos_for_imp if pos_for_imp is not None else pos) - margin
    k, b, imp = _kbi(m, jnp.asarray(solref, dtype),
                     jnp.asarray(solimp, dtype), pmm)
    r = jnp.maximum((1.0 - imp) / imp * invweight, 1e-14)
    vel = jrow @ d.qvel
    aref = -b * vel - k * imp * (pos - margin)
    self.J.append(jrow)
    self.pos.append(jnp.asarray(pos, dtype))
    self.margin.append(jnp.asarray(margin, dtype))
    self.D.append(1.0 / r)
    self.aref.append(aref)
    self.frictionloss.append(jnp.asarray(frictionloss, dtype))
    self.active.append(jnp.asarray(active, bool))
    self.types.append(rowtype)

  def finalize(self) -> Data:
    d = self.d
    nefc = d.efc_J.shape[0]
    dtype = d.qpos.dtype
    n = len(self.J)
    assert n == nefc, f'constraint row count {n} != allocated {nefc}'
    _solver.register_row_types(self.m, self.types)
    if n == 0:
      return d
    return d.replace(
        efc_J=jnp.stack(self.J),
        efc_pos=jnp.stack(self.pos),
        efc_margin=jnp.stack(self.margin),
        efc_D=jnp.stack(self.D),
        efc_aref=jnp.stack(self.aref),
        efc_frictionloss=jnp.stack(self.frictionloss),
        efc_active=jnp.stack(self.active),
    )


def make_constraint(m: Model, d: Data) -> Data:
  if m.opt.disableflags & DisableBit.CONSTRAINT:
    return d
  dtype = d.qpos.dtype
  rows = Rows(m, d)

  # --- equality ----------------------------------------------------------
  if not (m.opt.disableflags & DisableBit.EQUALITY):
    for e in range(m.neq):
      _equality_rows(m, d, e, rows)

  # --- dof friction loss -------------------------------------------------
  if not (m.opt.disableflags & DisableBit.FRICTIONLOSS):
    for v in range(m.nv):
      fl = float(m.dof_frictionloss[v])
      if fl <= 0:
        continue
      jrow = jnp.zeros(m.nv, dtype).at[v].set(1.0)
      rows.add(jrow, jnp.zeros((), dtype), 0.0,
               m.dof_solref[v], m.dof_solimp[v],
               float(m.dof_invweight0[v]), True, frictionloss=fl,
               rowtype=_solver.FRICTION)

  # --- joint limits ------------------------------------------------------
  if not (m.opt.disableflags & DisableBit.LIMIT):
    for j in range(m.njnt):
      if not m.jnt_limited[j]:
        continue
      jtype = JointType(int(m.jnt_type[j]))
      qadr, dadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
      margin = float(m.jnt_margin[j])
      if jtype in (JointType.SLIDE, JointType.HINGE):
        lo, hi = m.jnt_range[j]
        dist_lo = d.qpos[qadr] - lo
        dist_hi = hi - d.qpos[qadr]
        lower_closer = dist_lo < dist_hi
        dist = jnp.minimum(dist_lo, dist_hi)
        sign = jnp.where(lower_closer, 1.0, -1.0)
        jrow = jnp.zeros(m.nv, dtype).at[dadr].set(1.0) * sign
        rows.add(jrow, dist, margin, m.jnt_solref[j], m.jnt_solimp[j],
                 float(m.dof_invweight0[dadr]), dist < margin)
      elif jtype == JointType.BALL:
        # axis-angle magnitude limited by max(|range|)
        axis = math.quat_sub(
            d.qpos[qadr:qadr + 4],
            jnp.asarray([1.0, 0, 0, 0], dtype))
        angle = math.norm_safe(axis)
        limit = float(np.max(np.abs(m.jnt_range[j])))
        dist = limit - angle
        dir_ = axis / jnp.maximum(angle, 1e-14)
        jrow = jnp.zeros(m.nv, dtype).at[dadr:dadr + 3].set(-dir_)
        rows.add(jrow, dist, margin, m.jnt_solref[j], m.jnt_solimp[j],
                 float(m.dof_invweight0[dadr]), dist < margin)

  # --- tendon limits -----------------------------------------------------
  if not (m.opt.disableflags & DisableBit.LIMIT):
    for t in range(m.ntendon):
      if not m.tendon_limited[t]:
        continue
      lo, hi = m.tendon_range[t]
      margin = float(m.tendon_margin[t])
      length = d.ten_length[t]
      dist_lo = length - lo
      dist_hi = hi - length
      lower_closer = dist_lo < dist_hi
      dist = jnp.minimum(dist_lo, dist_hi)
      sign = jnp.where(lower_closer, 1.0, -1.0)
      jrow = d.ten_J[t] * sign
      rows.add(jrow, dist, margin, m.tendon_solref_lim[t],
               m.tendon_solimp_lim[t], float(m.tendon_invweight0[t]),
               dist < margin)

  # --- contacts ----------------------------------------------------------
  if not (m.opt.disableflags & DisableBit.CONTACT):
    _contact_rows(m, d, rows)

  return rows.finalize()


def _equality_rows(m: Model, d: Data, e: int, rows: Rows):
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
    for k in range(3):
      rows.add(jdiff[k], pos[k], 0.0, solref, solimp, invweight, active,
               rowtype=_solver.EQUALITY)
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
    for k in range(3):
      rows.add(jdiffp[k], pos[k], 0.0, solref, solimp, invweight_t, active,
               rowtype=_solver.EQUALITY)
    for k in range(3):
      rows.add(jdiffr[k], qerr[k], 0.0, solref, solimp, invweight_r, active,
               rowtype=_solver.EQUALITY)
  elif etype == EqType.JOINT:
    j1, j2 = int(m.eq_obj1id[e]), int(m.eq_obj2id[e])
    q1adr, d1adr = int(m.jnt_qposadr[j1]), int(m.jnt_dofadr[j1])
    poly = jnp.asarray(data[:5], dtype)
    q1 = d.qpos[q1adr] - jnp.asarray(m.qpos0[q1adr], dtype)
    invweight = float(m.dof_invweight0[d1adr])
    if j2 >= 0:
      q2adr, d2adr = int(m.jnt_qposadr[j2]), int(m.jnt_dofadr[j2])
      q2 = d.qpos[q2adr] - jnp.asarray(m.qpos0[q2adr], dtype)
      # pos = q1 - qpos0_1 - poly(q2 - qpos0_2)
      powers = jnp.stack([q2 ** i for i in range(5)])
      pos = q1 - poly @ powers
      dpoly = jnp.stack(
          [i * q2 ** (i - 1) if i > 0 else jnp.zeros((), dtype)
           for i in range(5)])
      jrow = jnp.zeros(m.nv, dtype).at[d1adr].set(1.0)
      jrow = jrow.at[d2adr].set(-(poly @ dpoly))
      invweight += float(m.dof_invweight0[d2adr])
    else:
      pos = q1 - poly[0]
      jrow = jnp.zeros(m.nv, dtype).at[d1adr].set(1.0)
    rows.add(jrow, pos, 0.0, solref, solimp, invweight, active,
             rowtype=_solver.EQUALITY)
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
    rows.add(jrow, pos, 0.0, solref, solimp, invweight, active,
             rowtype=_solver.EQUALITY)
  else:
    raise NotImplementedError(f'equality {etype}')


def _contact_rows(m: Model, d: Data, rows: Rows):
  """Contact efc rows (pyramidal or elliptic) from the padded Contact set."""
  from dm_control_tpu._src import collision as coll
  dtype = d.qpos.dtype
  con = d.contact
  idx = 0
  for g1, g2, p, npoints in coll._pair_entries(m):
    condim = p['condim'] if p else coll._pair_condim(m, g1, g2)
    b1, b2 = int(m.geom_bodyid[g1]), int(m.geom_bodyid[g2])
    invweight = float(m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0])
    for k in range(npoints):
      i = idx + k
      active = con.dist[i] < con.includemargin[i]
      pos = con.dist[i]
      margin = con.includemargin[i]
      # jacobian of relative velocity at contact point, in contact frame
      jac1p, jac1r = smooth.jac(m, d, con.pos[i], b1)
      jac2p, jac2r = smooth.jac(m, d, con.pos[i], b2)
      jdiff = (jac2p - jac1p)  # (nv, 3): vel of geom2 body rel geom1
      frame = con.frame[i]  # rows: normal, t1, t2
      jn = jdiff @ frame[0]
      if condim == 1:
        rows.add(jn, pos, margin, con.solref[i], con.solimp[i],
                 invweight, active, pos_for_imp=pos)
      else:
        jt1 = jdiff @ frame[1]
        jt2 = jdiff @ frame[2]
        mu = con.friction[i]
        if m.opt.cone == ConeType.ELLIPTIC:
          # elliptic: rows = normal + condim-1 friction rows
          rows.add(jn, pos, margin, con.solref[i], con.solimp[i],
                   invweight, active, pos_for_imp=pos)
          fr_rows = [jt1, jt2]
          jrot = (jdiff if condim <= 4 else None)
          fr = [mu[0], mu[1]]
          if condim > 4:
            jr_ = (jac2r - jac1r)
            fr_rows += [jr_ @ frame[0], jr_ @ frame[1], jr_ @ frame[2]]
            fr += [mu[2], mu[3], mu[4]]
          for t in range(condim - 1):
            rows.add(fr_rows[t], jnp.zeros((), dtype), margin,
                     con.solref[i], con.solimp[i], invweight, active,
                     pos_for_imp=pos)
        else:
          # pyramidal: 2*(condim-1) rows; edge t± = n*mu_t +- t
          fr_rows = [jt1, jt2]
          mus = [mu[0], mu[1]]
          if condim > 4:
            jr_ = (jac2r - jac1r)
            fr_rows += [jr_ @ frame[0], jr_ @ frame[1], jr_ @ frame[2]]
            mus += [mu[2], mu[3], mu[4]]
          for t in range(condim - 1):
            # pyramid-edge invweight = 2 mu^2 (1 + mu^2) iw
            # (fit exactly against oracle efc_D across mu values)
            iw = invweight * 2.0 * mus[t] ** 2 * (1.0 + mus[t] ** 2)
            for sign in (1.0, -1.0):
              # edge direction in force space: n + sign*mu*t
              jrow = jn + sign * mus[t] * fr_rows[t]
              rows.add(jrow, pos, margin, con.solref[i], con.solimp[i],
                       iw, active, pos_for_imp=pos)
    idx += npoints


def static_row_types(m: Model) -> np.ndarray:
  """Row-type layout (EQUALITY/FRICTION/ONESIDED) computed statically.

  Must mirror make_constraint's row emission order exactly; used by the
  solver so it never depends on trace-order side effects.
  """
  from dm_control_tpu._src import collision as coll
  types = []
  if m.opt.disableflags & DisableBit.CONSTRAINT:
    return np.zeros(0, np.int32)
  if not (m.opt.disableflags & DisableBit.EQUALITY):
    for e in range(m.neq):
      etype = EqType(int(m.eq_type[e]))
      n = {EqType.CONNECT: 3, EqType.WELD: 6, EqType.JOINT: 1,
           EqType.TENDON: 1}[etype]
      types += [_solver.EQUALITY] * n
  if not (m.opt.disableflags & DisableBit.FRICTIONLOSS):
    for v in range(m.nv):
      if float(m.dof_frictionloss[v]) > 0:
        types.append(_solver.FRICTION)
  if not (m.opt.disableflags & DisableBit.LIMIT):
    for j in range(m.njnt):
      if m.jnt_limited[j] and int(m.jnt_type[j]) != int(JointType.FREE):
        types.append(_solver.ONESIDED)
    for t in range(m.ntendon):
      if m.tendon_limited[t]:
        types.append(_solver.ONESIDED)
  if not (m.opt.disableflags & DisableBit.CONTACT):
    for g1, g2, p, npoints in coll._pair_entries(m):
      condim = p['condim'] if p else coll._pair_condim(m, g1, g2)
      rows = 1 if condim == 1 else 2 * (condim - 1)
      types += [_solver.ONESIDED] * (rows * npoints)
  return np.asarray(types, np.int32)
