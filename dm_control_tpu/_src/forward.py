"""Forward dynamics pipeline + integrators: the engine's `step`.

Replaces the reference's native mj_forward/mj_step call chain (invoked via
ctypes at dm_control/mujoco/engine.py:153-171): one pure function
`step(model)(data) -> data`, jit/vmap-compatible, with Euler (semi-implicit,
implicit joint damping) and RK4 integrators matching the reference
semantics so trajectories are comparable step-for-step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import math
from dm_control_tpu._src import smooth
from dm_control_tpu._src.types import (
    BiasType, Contact, Data, DisableBit, DynType, GainType, Integrator,
    JointType, Model)


# ---------------------------------------------------------------------------
# Data construction.
# ---------------------------------------------------------------------------


def make_data(m: Model, dtype=None) -> Data:
  """Fresh Data at qpos0 (derived fields zeroed; call forward to fill)."""
  if dtype is None:
    dtype = jnp.zeros(0).dtype  # respects jax_enable_x64
  nq, nv, nu, na = m.nq, m.nv, m.nu, m.na
  nbody, ngeom, nsite = m.nbody, m.ngeom, m.nsite
  ncon, nefc = contact_capacity(m)
  z = lambda *s: jnp.zeros(s, dtype)
  return Data(
      time=jnp.zeros((), dtype),
      qpos=jnp.asarray(m.qpos0, dtype),
      qvel=z(nv), act=z(na), ctrl=z(nu),
      qfrc_applied=z(nv), xfrc_applied=z(nbody, 6),
      xpos=z(nbody, 3), xquat=z(nbody, 4), xmat=z(nbody, 3, 3),
      xipos=z(nbody, 3), ximat=z(nbody, 3, 3),
      geom_xpos=z(ngeom, 3), geom_xmat=z(ngeom, 3, 3),
      site_xpos=z(nsite, 3), site_xmat=z(nsite, 3, 3),
      xanchor=z(m.njnt, 3), xaxis=z(m.njnt, 3),
      subtree_com=z(nbody, 3), cinert=z(nbody, 10),
      cdof=z(nv, 6), cdof_dot=z(nv, 6), cvel=z(nbody, 6),
      qM=z(nv, nv), qLD=z(nv, nv),
      ten_length=z(m.ntendon), ten_velocity=z(m.ntendon),
      ten_J=z(m.ntendon, nv),
      actuator_length=z(nu), actuator_velocity=z(nu),
      actuator_moment=z(nu, nv), actuator_force=z(nu), act_dot=z(na),
      qfrc_bias=z(nv), qfrc_spring=z(nv), qfrc_damper=z(nv),
      qfrc_gravcomp=z(nv), qfrc_fluid=z(nv), qfrc_passive=z(nv),
      qfrc_actuator=z(nv), qfrc_smooth=z(nv), qacc_smooth=z(nv),
      qfrc_constraint=z(nv), qacc=z(nv), qacc_warmstart=z(nv),
      contact=Contact(
          dist=jnp.full((ncon,), 1e10, dtype), pos=z(ncon, 3),
          frame=z(ncon, 3, 3), includemargin=z(ncon),
          friction=z(ncon, 5), solref=z(ncon, 2), solimp=z(ncon, 5),
          geom1=jnp.full((ncon,), -1, jnp.int32),
          geom2=jnp.full((ncon,), -1, jnp.int32),
          body1=jnp.zeros((ncon,), jnp.int32),
          body2=jnp.zeros((ncon,), jnp.int32),
          dim=jnp.full((ncon,), 3, jnp.int32)),
      efc_J=z(nefc, nv), efc_pos=z(nefc), efc_margin=z(nefc),
      efc_D=z(nefc), efc_aref=z(nefc), efc_frictionloss=z(nefc),
      efc_force=z(nefc), efc_active=jnp.zeros(nefc, bool),
      sensordata=z(m.nsensordata),
      energy=z(2), diverged=jnp.zeros((), bool),
      model_var={},
  )


def contact_capacity(m: Model):
  """(max contacts, max constraint rows) - static padding sizes.

  Both sizes come from the single static efc layout (efc.layout), so the
  allocator, the assembler, and the solver can never disagree on row
  counts."""
  from dm_control_tpu._src import collision
  from dm_control_tpu._src import efc
  return collision.count_max_contacts(m), efc.layout(m).nefc


# ---------------------------------------------------------------------------
# Passive forces (reference stage: mj_passive).
# ---------------------------------------------------------------------------


def _body_jacs(m: Model, d: Data):
  """Batched translational/rotational Jacobians at every body's xipos.

  (nbody, nv, 3) each; one fused computation replacing per-body
  smooth.jac calls (shared by xfrc, fluid, and gravcomp stages)."""
  dtype = d.qpos.dtype
  mask = jnp.asarray(m.body_dof_mask, dtype)  # (nbody, nv)
  offset = d.xipos - d.subtree_com[m.body_rootid]  # (nbody, 3)
  cdof_ang, cdof_lin = d.cdof[:, :3], d.cdof[:, 3:]
  jacp = (cdof_lin[None, :, :]
          + jnp.cross(jnp.broadcast_to(cdof_ang[None, :, :],
                                       (m.nbody, m.nv, 3)),
                      jnp.broadcast_to(offset[:, None, :],
                                       (m.nbody, m.nv, 3))))
  jacp = jacp * mask[:, :, None]
  jacr = cdof_ang[None, :, :] * mask[:, :, None]
  return jacp, jacr


def passive(m: Model, d: Data) -> Data:
  dtype = d.qpos.dtype
  z = jnp.zeros(m.nv, dtype)
  if m.opt.disableflags & DisableBit.PASSIVE == DisableBit.PASSIVE or m.nv == 0:
    return d.replace(qfrc_spring=z, qfrc_damper=z, qfrc_passive=z,
                     qfrc_gravcomp=z, qfrc_fluid=z)
  from dm_control_tpu._src import tree
  tr = tree.get(m)

  # joint springs: per joint, force = -stiffness * (qpos - qpos_spring)
  qfrc_spring = jnp.zeros(m.nv, dtype)
  if not (m.opt.disableflags & DisableBit.SPRING):
    qpos_spring = smooth.mparam(m, d, 'qpos_spring')
    stiff = m.jnt_stiffness
    hs = tr.hs_jids[stiff[tr.hs_jids] > 0] if len(tr.hs_jids) else tr.hs_jids
    if len(hs):
      qadr = m.jnt_qposadr[hs]
      dadr = m.jnt_dofadr[hs]
      k = jnp.asarray(stiff[hs], dtype)
      qfrc_spring = math.safe_add(qfrc_spring, dadr, 
          -k * (d.qpos[qadr] - qpos_spring[qadr]))
    for j in tr.ball_jids:
      k = float(stiff[j])
      if k == 0.0:
        continue
      qadr, dadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
      dif = math.quat_sub(d.qpos[qadr:qadr + 4],
                          qpos_spring[qadr:qadr + 4])
      qfrc_spring = math.safe_add(qfrc_spring, slice(dadr, dadr + 3), -k * dif)
    for j in tr.free_jids:
      k = float(stiff[j])
      if k == 0.0:
        continue
      qadr, dadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
      qfrc_spring = math.safe_add(qfrc_spring, slice(dadr, dadr + 3), 
          -k * (d.qpos[qadr:qadr + 3] - qpos_spring[qadr:qadr + 3]))
      dif = math.quat_sub(d.qpos[qadr + 3:qadr + 7],
                          qpos_spring[qadr + 3:qadr + 7])
      qfrc_spring = math.safe_add(qfrc_spring, slice(dadr + 3, dadr + 6), -k * dif)

    # tendon springs (with deadband semantics), vectorized over tendons
    tsel = np.where(m.tendon_stiffness > 0)[0] if m.ntendon else np.zeros(
        0, np.int32)
    if len(tsel):
      lo = m.tendon_lengthspring[tsel, 0].copy()
      hi = m.tendon_lengthspring[tsel, 1].copy()
      unset = lo < 0
      l0_all = np.asarray(m.tendon_length0)
      # scalar placeholder until setconst fills per-tendon lengths
      l0 = (l0_all[tsel] if l0_all.ndim
            else np.zeros(len(tsel)))
      lo[unset] = l0[unset]
      hi[unset] = l0[unset]
      lo = jnp.asarray(lo, dtype)
      hi = jnp.asarray(hi, dtype)
      k = jnp.asarray(m.tendon_stiffness[tsel], dtype)
      length = d.ten_length[tsel]
      disp = jnp.where(length > hi, hi - length,
                       jnp.where(length < lo, lo - length, 0.0))
      qfrc_spring = qfrc_spring + jnp.einsum(
          'tv,t->v', d.ten_J[tsel], k * disp)

  # dampers
  qfrc_damper = jnp.zeros(m.nv, dtype)
  if not (m.opt.disableflags & DisableBit.DAMPER):
    qfrc_damper = -jnp.asarray(m.dof_damping, dtype) * d.qvel
    tsel = np.where(m.tendon_damping > 0)[0] if m.ntendon else np.zeros(
        0, np.int32)
    if len(tsel):
      b = jnp.asarray(m.tendon_damping[tsel], dtype)
      qfrc_damper = qfrc_damper - jnp.einsum(
          'tv,t->v', d.ten_J[tsel], b * d.ten_velocity[tsel])

  # gravity compensation (batched over the bodies that use it)
  qfrc_gravcomp = jnp.zeros(m.nv, dtype)
  if (m.body_gravcomp is not None and np.any(m.body_gravcomp > 0)
      and not (m.opt.disableflags & DisableBit.GRAVITY)):
    gravity = jnp.asarray(m.opt.gravity, dtype)
    jacp, _ = _body_jacs(m, d)
    gc = jnp.asarray(m.body_gravcomp * m.body_mass, dtype)
    force = -gravity[None, :] * gc[:, None]  # (nbody, 3)
    qfrc_gravcomp = jnp.einsum('bvx,bx->v', jacp, force)

  # fluid forces (inertia-box model; exercised by swimmer/fish)
  qfrc_fluid = jnp.zeros(m.nv, dtype)
  if m.opt.viscosity > 0 or m.opt.density > 0:
    qfrc_fluid = _inertia_box_fluid(m, d)

  qfrc_passive = qfrc_spring + qfrc_damper + qfrc_gravcomp + qfrc_fluid
  return d.replace(qfrc_spring=qfrc_spring, qfrc_damper=qfrc_damper,
                   qfrc_gravcomp=qfrc_gravcomp, qfrc_fluid=qfrc_fluid,
                   qfrc_passive=qfrc_passive)


def _inertia_box_fluid(m: Model, d: Data) -> jax.Array:
  """Viscous + density fluid forces via the equivalent-inertia-box model,
  batched over all bodies (no per-body trace unroll)."""
  dtype = d.qpos.dtype
  viscosity = float(m.opt.viscosity)
  density = float(m.opt.density)
  wind = jnp.asarray(m.opt.wind, dtype)

  # equivalent box half-sizes from principal inertia (static)
  mass_np = np.asarray(m.body_mass)
  inert = np.asarray(m.body_inertia)
  safe_mass = np.maximum(mass_np, 1e-12)
  box_np = np.sqrt(np.maximum(1e-12, np.stack([
      inert[:, 1] + inert[:, 2] - inert[:, 0],
      inert[:, 0] + inert[:, 2] - inert[:, 1],
      inert[:, 0] + inert[:, 1] - inert[:, 2]], axis=1))
      * 3.0 / (2.0 * safe_mass[:, None]))
  box = jnp.asarray(box_np, dtype)
  has_mass = jnp.asarray((mass_np > 0) & (np.arange(m.nbody) > 0), dtype)

  # 6D velocity of each body com, rotated into the inertial frame
  offset = d.xipos - d.subtree_com[m.body_rootid]
  rot = d.ximat.swapaxes(-1, -2)
  lvel6 = math.transform_motion(d.cvel, offset, rot)   # (nbody, 6)
  ang, lin = lvel6[..., :3], lvel6[..., 3:]
  lin = lin - jnp.einsum('bij,j->bi', rot, wind)

  frc = jnp.zeros((m.nbody, 3), dtype)
  trq = jnp.zeros((m.nbody, 3), dtype)
  if viscosity > 0:
    diam = jnp.sum(box, axis=-1) * 2.0 / 3.0
    frc = frc - 3.0 * jnp.pi * viscosity * diam[:, None] * lin
    trq = trq - jnp.pi * viscosity * (diam ** 3)[:, None] * ang
  if density > 0:
    # quadratic drag: force_i ~ -0.5 rho area_i |v_i| v_i
    area = 4.0 * jnp.stack(
        [box[:, 1] * box[:, 2], box[:, 0] * box[:, 2],
         box[:, 0] * box[:, 1]], axis=1)
    frc = frc - 0.5 * density * area * jnp.abs(lin) * lin
    # angular quadratic drag (form validated numerically vs the oracle)
    b4 = box ** 4
    coef = jnp.stack(
        [box[:, 0] * (b4[:, 1] + b4[:, 2]),
         box[:, 1] * (b4[:, 0] + b4[:, 2]),
         box[:, 2] * (b4[:, 0] + b4[:, 1])], axis=1)
    trq = trq - 0.5 * density * coef * jnp.abs(ang) * ang
  # rotate back to world, apply at xipos
  frc_w = jnp.einsum('bij,bj->bi', d.ximat, frc) * has_mass[:, None]
  trq_w = jnp.einsum('bij,bj->bi', d.ximat, trq) * has_mass[:, None]
  jacp, jacr = _body_jacs(m, d)
  return (jnp.einsum('bvx,bx->v', jacp, frc_w)
          + jnp.einsum('bvx,bx->v', jacr, trq_w))


# ---------------------------------------------------------------------------
# Actuation (reference stage: mj_fwdActuation).
# ---------------------------------------------------------------------------


def actuation(m: Model, d: Data) -> Data:
  dtype = d.qpos.dtype
  if m.nu == 0 or (m.opt.disableflags & DisableBit.ACTUATION):
    return d.replace(qfrc_actuator=jnp.zeros(m.nv, dtype),
                     actuator_force=jnp.zeros(m.nu, dtype),
                     act_dot=jnp.zeros(m.na, dtype))

  ctrl = d.ctrl
  if not (m.opt.disableflags & DisableBit.CLAMPCTRL):
    limited = m.actuator_ctrllimited
    lo = jnp.asarray(m.actuator_ctrlrange[:, 0], dtype)
    hi = jnp.asarray(m.actuator_ctrlrange[:, 1], dtype)
    ctrl = jnp.where(jnp.asarray(limited), jnp.clip(ctrl, lo, hi), ctrl)

  # actuator velocity
  vel = d.actuator_moment @ d.qvel

  # activation dynamics (vectorized per dyntype group)
  dyn = np.asarray(m.actuator_dyntype)
  actadr = np.asarray(m.actuator_actadr)
  known = np.isin(dyn, [int(DynType.NONE), int(DynType.INTEGRATOR),
                        int(DynType.FILTER), int(DynType.FILTEREXACT)])
  if not known.all():
    raise NotImplementedError(
        f'dyntype {DynType(int(dyn[~known][0]))}')
  act_dot = jnp.zeros(m.na, dtype)
  sel = np.where(dyn == int(DynType.INTEGRATOR))[0]
  if len(sel):
    act_dot = math.safe_set(act_dot, actadr[sel], ctrl[sel])
  sel = np.where((dyn == int(DynType.FILTER))
                 | (dyn == int(DynType.FILTEREXACT)))[0]
  if len(sel):
    tau = jnp.asarray(
        np.maximum(m.actuator_dynprm[sel, 0], 1e-12), dtype)
    act_dot = math.safe_set(act_dot, actadr[sel], 
        (ctrl[sel] - d.act[actadr[sel]]) / tau)
  stateless = jnp.asarray(dyn == int(DynType.NONE))
  if m.na:
    input_ = jnp.where(stateless, ctrl, d.act[np.maximum(actadr, 0)])
  else:
    input_ = ctrl

  # gain / bias (vectorized: FIXED/AFFINE via masks)
  gt = np.asarray(m.actuator_gaintype)
  bt = np.asarray(m.actuator_biastype)
  if not np.isin(gt, [int(GainType.FIXED), int(GainType.AFFINE)]).all():
    raise NotImplementedError(f'gaintype {GainType(int(gt.max()))}')
  if not np.isin(bt, [int(BiasType.NONE), int(BiasType.AFFINE)]).all():
    raise NotImplementedError(f'biastype {BiasType(int(bt.max()))}')
  gp = jnp.asarray(m.actuator_gainprm, dtype)
  bp = jnp.asarray(m.actuator_biasprm, dtype)
  gain_affine = gp[:, 0] + gp[:, 1] * d.actuator_length + gp[:, 2] * vel
  gain = jnp.where(jnp.asarray(gt == int(GainType.FIXED)),
                   gp[:, 0], gain_affine)
  bias_affine = bp[:, 0] + bp[:, 1] * d.actuator_length + bp[:, 2] * vel
  bias = jnp.where(jnp.asarray(bt == int(BiasType.NONE)),
                   0.0, bias_affine)
  force = gain * input_ + bias

  if m.actuator_forcelimited.any():
    lo = jnp.asarray(m.actuator_forcerange[:, 0], dtype)
    hi = jnp.asarray(m.actuator_forcerange[:, 1], dtype)
    force = jnp.where(jnp.asarray(m.actuator_forcelimited),
                      jnp.clip(force, lo, hi), force)

  qfrc_actuator = d.actuator_moment.T @ force

  # clamp per-joint total actuator force (jnt_actfrcrange)
  if m.njnt and m.jnt_actfrclimited.any():
    sel = np.where(m.jnt_actfrclimited)[0]
    adr = m.jnt_dofadr[sel]
    lo = jnp.asarray(m.jnt_actfrcrange[sel, 0], dtype)
    hi = jnp.asarray(m.jnt_actfrcrange[sel, 1], dtype)
    qfrc_actuator = math.safe_set(qfrc_actuator, adr, 
        jnp.clip(qfrc_actuator[adr], lo, hi))

  return d.replace(actuator_velocity=vel, actuator_force=force,
                   act_dot=act_dot, qfrc_actuator=qfrc_actuator)


# ---------------------------------------------------------------------------
# Applied external forces.
# ---------------------------------------------------------------------------


def xfrc_accumulate(m: Model, d: Data) -> jax.Array:
  """Project xfrc_applied (per-body world wrench at xipos) into qfrc."""
  dtype = d.qpos.dtype
  qfrc = jnp.zeros(m.nv, dtype)
  # mapped via com-based jacobian: for each body, wrench at xipos
  mask = jnp.asarray(m.body_dof_mask, dtype)  # (nbody, nv)
  offset = d.xipos - d.subtree_com[m.body_rootid]  # (nbody, 3)
  # jacp[b, v, :] = cdof_lin[v] + cdof_ang[v] x offset[b]
  cdof_ang, cdof_lin = d.cdof[:, :3], d.cdof[:, 3:]
  jacp = (cdof_lin[None, :, :]
          + jnp.cross(jnp.broadcast_to(cdof_ang[None, :, :],
                                       (m.nbody, m.nv, 3)),
                      jnp.broadcast_to(offset[:, None, :],
                                       (m.nbody, m.nv, 3))))
  jacr = jnp.broadcast_to(cdof_ang[None, :, :], (m.nbody, m.nv, 3))
  force, torque = d.xfrc_applied[:, :3], d.xfrc_applied[:, 3:]
  qfrc = jnp.einsum('bv,bvx,bx->v', mask, jacp, force)
  qfrc = qfrc + jnp.einsum('bv,bvx,bx->v', mask, jacr, torque)
  return qfrc


# ---------------------------------------------------------------------------
# Forward pipeline.
# ---------------------------------------------------------------------------


def fwd_position(m: Model, d: Data) -> Data:
  d = smooth.kinematics(m, d)
  d = smooth.com_pos(m, d)
  d = smooth.crb(m, d)
  d = smooth.factor_m(m, d)
  d = smooth.tendon(m, d)
  from dm_control_tpu._src import collision
  d = collision.collide(m, d)
  d = smooth.transmission(m, d)
  from dm_control_tpu._src import constraint
  d = constraint.make_constraint(m, d)
  return d


def fwd_velocity(m: Model, d: Data) -> Data:
  d = smooth.com_vel(m, d)
  d = smooth.rne(m, d)
  d = passive(m, d)
  return d


def fwd_actuation(m: Model, d: Data) -> Data:
  return actuation(m, d)


def fwd_acceleration(m: Model, d: Data) -> Data:
  qfrc_smooth = (d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator
                 + d.qfrc_applied)
  if m.nbody > 1:
    qfrc_smooth = qfrc_smooth + xfrc_accumulate(m, d)
  qacc_smooth = smooth.solve_m(m, d, qfrc_smooth) if m.nv else qfrc_smooth
  return d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)


@math.f32_dots
def step1(m: Model, d: Data, skipsensor: bool = False) -> Data:
  """Position + velocity stages + pos/vel sensors (mj_step1 analog)."""
  d = fwd_position(m, d)
  d = fwd_velocity(m, d)
  if not skipsensor:
    from dm_control_tpu._src import sensor
    d = sensor.sensors(m, d, stages='posvel')
    d = _energy(m, d)
  return d


@math.f32_dots
def _acc_stage(m: Model, d: Data, skipsensor: bool = False) -> Data:
  """Actuation + acceleration + constraint solve (+ acc sensors)."""
  d = fwd_actuation(m, d)
  d = fwd_acceleration(m, d)
  from dm_control_tpu._src import solver
  d = solver.solve(m, d)
  if not skipsensor:
    from dm_control_tpu._src import sensor
    d = sensor.sensors(m, d, stages='acc')
  return d


@math.f32_dots
def forward(m: Model, d: Data) -> Data:
  d = step1(m, d)
  d = _acc_stage(m, d)
  return d


@math.f32_dots
def _forward_core(m: Model, d: Data) -> Data:
  """Full pipeline without sensors/energy (RK4 internal stages)."""
  d = fwd_position(m, d)
  d = fwd_velocity(m, d)
  d = _acc_stage(m, d, skipsensor=True)
  return d


def _energy(m: Model, d: Data) -> Data:
  dtype = d.qpos.dtype
  gravity = jnp.asarray(m.opt.gravity, dtype)
  mass = jnp.asarray(m.body_mass, dtype)
  potential = -jnp.einsum('b,bx,x->', mass, d.xipos, gravity)
  # spring potential (vectorized over slide/hinge joints)
  from dm_control_tpu._src import tree
  tr = tree.get(m)
  qpos_spring = smooth.mparam(m, d, 'qpos_spring')
  hs = (tr.hs_jids[m.jnt_stiffness[tr.hs_jids] > 0]
        if len(tr.hs_jids) else tr.hs_jids)
  if len(hs):
    qadr = m.jnt_qposadr[hs]
    k = jnp.asarray(m.jnt_stiffness[hs], dtype)
    dif = d.qpos[qadr] - qpos_spring[qadr]
    potential = potential + 0.5 * jnp.sum(k * dif * dif)
  kinetic = 0.5 * d.qvel @ (d.qM @ d.qvel) if m.nv else jnp.zeros((), dtype)
  return d.replace(energy=jnp.stack([potential, kinetic]))


# ---------------------------------------------------------------------------
# Integrators.
# ---------------------------------------------------------------------------


def _integrate_pos(m: Model, qpos: jax.Array, qvel: jax.Array,
                   dt) -> jax.Array:
  """Advance qpos by qvel*dt with quaternion handling, one batched op per
  joint-type group."""
  from dm_control_tpu._src import tree
  tr = tree.get(m)
  out = qpos
  if len(tr.hs_jids):
    out = math.safe_set(out, tr.hs_qadr, 
        qpos[tr.hs_qadr] + dt * qvel[tr.hs_dadr])
  if len(tr.ball_jids):
    out = math.safe_set(out, tr.ball_qmat, math.quat_integrate(
        qpos[tr.ball_qmat], qvel[tr.ball_dmat], dt))
  if len(tr.free_jids):
    q = qpos[tr.free_qmat]
    v = qvel[tr.free_dmat]
    pos = q[:, :3] + dt * v[:, :3]
    quat = math.quat_integrate(q[:, 3:7], v[:, 3:6], dt)
    out = math.safe_set(out, tr.free_qmat, jnp.concatenate([pos, quat], axis=1))
  return out


def _advance(m: Model, d: Data, qacc: jax.Array,
             act_dot: jax.Array, qvel_override=None) -> Data:
  """Shared integrator tail: advance act, qvel, qpos, time."""
  dtype = d.qpos.dtype
  h = jnp.asarray(m.opt.timestep, dtype)
  act = d.act + h * act_dot
  if m.na and m.actuator_actlimited.any():
    # clamp activations per-actuator
    lo = np.full(m.na, -np.inf)
    hi = np.full(m.na, np.inf)
    for u in range(m.nu):
      a = int(m.actuator_actadr[u])
      if a >= 0 and m.actuator_actlimited[u]:
        lo[a], hi[a] = m.actuator_actrange[u]
    act = jnp.clip(act, jnp.asarray(lo, dtype), jnp.asarray(hi, dtype))
  qvel = d.qvel + h * qacc if qvel_override is None else qvel_override
  qpos = _integrate_pos(m, d.qpos, qvel, h)
  return d.replace(qpos=qpos, qvel=qvel, act=act, time=d.time + h)


def euler(m: Model, d: Data) -> Data:
  """Semi-implicit Euler with implicit joint damping (mj_Euler parity)."""
  dtype = d.qpos.dtype
  qacc = d.qacc
  if (m.nv and not (m.opt.disableflags & DisableBit.EULERDAMP)
      and np.any(m.dof_damping > 0)):
    h = float(m.opt.timestep)
    from dm_control_tpu._src import linalg
    mhb = d.qM + h * jnp.diag(jnp.asarray(m.dof_damping, dtype))
    qfrc = d.qfrc_smooth + d.qfrc_constraint
    qacc = linalg.solve_psd(mhb, qfrc)
  return _advance(m, d, qacc, d.act_dot)


_RK4_A = np.array([
    [0.5, 0.0, 0.0],
    [0.0, 0.5, 0.0],
    [0.0, 0.0, 1.0],
])
_RK4_B = np.array([1.0 / 6, 1.0 / 3, 1.0 / 3, 1.0 / 6])


def rk4(m: Model, d: Data) -> Data:
  """Classic RK4 over (qpos, qvel, act) with full pipeline per stage."""
  dtype = d.qpos.dtype
  h = float(m.opt.timestep)
  d0 = d
  qvels = [d.qvel]
  qaccs = [d.qacc]
  act_dots = [d.act_dot]
  for i in range(3):
    a = _RK4_A[i]
    dqvel = sum(a[j] * qvels[j] for j in range(i + 1))
    dqacc = sum(a[j] * qaccs[j] for j in range(i + 1))
    dact = sum(a[j] * act_dots[j] for j in range(i + 1))
    di = d0.replace(
        qpos=_integrate_pos(m, d0.qpos, dqvel, h),
        qvel=d0.qvel + h * dqacc,
        act=d0.act + h * dact,
    )
    di = _forward_core(m, di)
    qvels.append(di.qvel)
    qaccs.append(di.qacc)
    act_dots.append(di.act_dot)
  fvel = sum(_RK4_B[j] * qvels[j] for j in range(4))
  facc = sum(_RK4_B[j] * qaccs[j] for j in range(4))
  fact = sum(_RK4_B[j] * act_dots[j] for j in range(4))
  qpos = _integrate_pos(m, d0.qpos, fvel, h)
  qvel = d0.qvel + h * facc
  act = d0.act + h * fact
  return d0.replace(qpos=qpos, qvel=qvel, act=act,
                    time=d0.time + jnp.asarray(h, dtype))


@math.f32_dots
def step(m: Model, d: Data) -> Data:
  """One physics step with the reference's step2-then-step1 ordering
  (dm_control/mujoco/engine.py:147-171, legacy_step=True): the input Data
  must be step1-synced (reset/forward establish this); on return every
  position/velocity-dependent field matches the new qpos/qvel, so task
  observation code reads a consistent state.  Acc-stage quantities (qacc,
  contact forces, touch sensors) are from the pre-integration state, as
  in the reference."""
  d = _acc_stage(m, d)
  if m.opt.integrator == Integrator.RK4:
    d = rk4(m, d)
  else:
    d = euler(m, d)
  d = step1(m, d)
  d = _check_divergence(m, d)
  return d


# True integration state: everything else in Data is recomputed from
# these by the pipeline stages each step.
_STATE_FIELDS = ('time', 'qpos', 'qvel', 'act', 'ctrl', 'qfrc_applied',
                 'xfrc_applied', 'qacc_warmstart', 'diverged', 'model_var')


def substeps(m: Model, d: Data, n: int) -> Data:
  """Advance `n` physics steps; final Data is step()-complete.

  TPU-critical structure (profiled on humanoid@4096, v5e):
  - The scan carries ONLY the integration state.  Carrying full Data
    turns every derived field into a loop variable: trace-constant
    contact body/geom ids become dynamic tensors, so downstream
    Jacobian/sensor indexing lowers to real gathers/scatters
    (s32[B*ncon] index vectors) plus per-iteration HBM copies of the
    whole derived state.
  - To make the minimal carry possible, each iteration runs in the
    STANDARD order (position/velocity stages, then acc+solve, then
    integrate) instead of the reference's legacy acc-then-step1
    bracketing.  The composed trajectory is IDENTICAL: legacy substep
    k's acc stage consumes step1 outputs computed at the end of
    substep k-1 at the same state where we recompute them (step1 is a
    pure function of the state).  A trailing full step() restores the
    legacy invariant that the returned Data's acc-stage quantities
    (qacc, contact forces, touch sensors) are from the final
    pre-integration state and its position/velocity-derived fields
    match the final qpos/qvel.
  - Sensors and energy are evaluated only on the last step.  Task code
    reads them strictly at control-step boundaries; inside the scan
    they were pure dead weight (~30% of the humanoid substep).
  """
  if n <= 1:
    # Self-sync before stepping: callers (runner auto-reset lanes,
    # rollout_fn's state-only carry) may pass Data whose derived fields
    # (qM/qLD, contacts, qfrc_bias, moments) belong to a DIFFERENT
    # state.  step1 is a pure function of the integration state, so for
    # already-synced input this is a value-level no-op.
    return step(m, step1(m, d, skipsensor=True))

  def sub(st, _):
    dd = d.replace(**st)
    dd = step1(m, dd, skipsensor=True)
    dd = _acc_stage(m, dd, skipsensor=True)
    if m.opt.integrator == Integrator.RK4:
      dd = rk4(m, dd)
    else:
      dd = euler(m, dd)
    dd = _check_divergence(m, dd)
    return {f: getattr(dd, f) for f in _STATE_FIELDS}, None

  st0 = {f: getattr(d, f) for f in _STATE_FIELDS}
  st, _ = jax.lax.scan(sub, st0, None, length=n - 1)
  dd = step1(m, d.replace(**st), skipsensor=True)  # sync for the acc stage
  return step(m, dd)


def _check_divergence(m: Model, d: Data) -> Data:
  """Divergence flag: replaces the reference's warning-counter snapshot
  mechanism (dm_control/mujoco/engine.py:312-335) with an in-graph
  `diverged` boolean that batched runners use for auto-reset."""
  bad = jnp.logical_or(
      jnp.logical_not(jnp.all(jnp.isfinite(d.qpos))),
      jnp.logical_not(jnp.all(jnp.isfinite(d.qvel))))
  big = jnp.any(jnp.abs(d.qpos) > 1e10)
  return d.replace(diverged=jnp.logical_or(d.diverged,
                                           jnp.logical_or(bad, big)))
