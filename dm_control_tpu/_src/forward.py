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
          dim=jnp.full((ncon,), 3, jnp.int32)),
      efc_J=z(nefc, nv), efc_pos=z(nefc), efc_margin=z(nefc),
      efc_D=z(nefc), efc_aref=z(nefc), efc_frictionloss=z(nefc),
      efc_force=z(nefc), efc_active=jnp.zeros(nefc, bool),
      sensordata=z(m.nsensordata),
      energy=z(2), diverged=jnp.zeros((), bool),
      model_var={},
  )


def contact_capacity(m: Model):
  """(max contacts, max constraint rows) - static padding sizes."""
  from dm_control_tpu._src import collision
  ncon = collision.count_max_contacts(m)
  nefc = 0
  if not m.opt.disableflags & DisableBit.CONSTRAINT:
    # limits: one row per limited joint/tendon; friction dofs;
    # equality rows; contacts: condim rows each (pyramidal: 2*(dim-1)+...).
    nefc += int(m.jnt_limited.sum()) if m.njnt else 0
    nefc += int(m.tendon_limited.sum()) if m.ntendon else 0
    nefc += int((m.dof_frictionloss > 0).sum()) if m.nv else 0
    for i in range(m.neq):
      nefc += {0: 3, 1: 6, 2: 1, 3: 1}[int(m.eq_type[i])]
    from dm_control_tpu._src.types import ConeType
    for i in range(ncon and 1):
      pass
    # contact rows counted by collision module (depends on condim/cone)
    nefc += collision.count_contact_rows(m)
  return ncon, nefc


# ---------------------------------------------------------------------------
# Passive forces (reference stage: mj_passive).
# ---------------------------------------------------------------------------


def passive(m: Model, d: Data) -> Data:
  dtype = d.qpos.dtype
  z = jnp.zeros(m.nv, dtype)
  if m.opt.disableflags & DisableBit.PASSIVE == DisableBit.PASSIVE or m.nv == 0:
    return d.replace(qfrc_spring=z, qfrc_damper=z, qfrc_passive=z,
                     qfrc_gravcomp=z, qfrc_fluid=z)

  # joint springs: per joint, force = -stiffness * (qpos - qpos_spring)
  qfrc_spring = jnp.zeros(m.nv, dtype)
  if not (m.opt.disableflags & DisableBit.SPRING):
    qpos_spring = jnp.asarray(m.qpos_spring, dtype)
    for j in range(m.njnt):
      k = float(m.jnt_stiffness[j])
      if k == 0.0:
        continue
      jtype = JointType(int(m.jnt_type[j]))
      qadr, dadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
      if jtype in (JointType.SLIDE, JointType.HINGE):
        qfrc_spring = qfrc_spring.at[dadr].add(
            -k * (d.qpos[qadr] - qpos_spring[qadr]))
      elif jtype == JointType.BALL:
        dif = math.quat_sub(d.qpos[qadr:qadr + 4],
                            qpos_spring[qadr:qadr + 4])
        qfrc_spring = qfrc_spring.at[dadr:dadr + 3].add(-k * dif)
      else:  # FREE
        qfrc_spring = qfrc_spring.at[dadr:dadr + 3].add(
            -k * (d.qpos[qadr:qadr + 3] - qpos_spring[qadr:qadr + 3]))
        dif = math.quat_sub(d.qpos[qadr + 3:qadr + 7],
                            qpos_spring[qadr + 3:qadr + 7])
        qfrc_spring = qfrc_spring.at[dadr + 3:dadr + 6].add(-k * dif)

    # tendon springs (with deadband semantics)
    for t in range(m.ntendon):
      k = float(m.tendon_stiffness[t])
      if k == 0.0:
        continue
      lo, hi = m.tendon_lengthspring[t]
      if lo < 0:  # unset -> use length0
        lo = hi = float(m.tendon_length0[t]) if np.ndim(
            m.tendon_length0) else 0.0
      length = d.ten_length[t]
      displacement = jnp.where(
          length > hi, hi - length, jnp.where(length < lo, lo - length, 0.0))
      qfrc_spring = qfrc_spring + d.ten_J[t] * (k * displacement)

  # dampers
  qfrc_damper = jnp.zeros(m.nv, dtype)
  if not (m.opt.disableflags & DisableBit.DAMPER):
    qfrc_damper = -jnp.asarray(m.dof_damping, dtype) * d.qvel
    for t in range(m.ntendon):
      b = float(m.tendon_damping[t])
      if b == 0.0:
        continue
      qfrc_damper = qfrc_damper + d.ten_J[t] * (-b * d.ten_velocity[t])

  # gravity compensation
  qfrc_gravcomp = jnp.zeros(m.nv, dtype)
  if (m.body_gravcomp is not None and np.any(m.body_gravcomp > 0)
      and not (m.opt.disableflags & DisableBit.GRAVITY)):
    gravity = jnp.asarray(m.opt.gravity, dtype)
    mask = jnp.asarray(m.body_dof_mask, dtype)
    for b in range(1, m.nbody):
      gc = float(m.body_gravcomp[b])
      if gc == 0.0:
        continue
      force = -gravity * float(m.body_mass[b]) * gc
      jacp, _ = smooth.jac(m, d, d.xipos[b], b)
      qfrc_gravcomp = qfrc_gravcomp + jacp @ force
    del mask

  # fluid forces (inertia-box model; exercised by swimmer/fish)
  qfrc_fluid = jnp.zeros(m.nv, dtype)
  if m.opt.viscosity > 0 or m.opt.density > 0:
    qfrc_fluid = _inertia_box_fluid(m, d)

  qfrc_passive = qfrc_spring + qfrc_damper + qfrc_gravcomp + qfrc_fluid
  return d.replace(qfrc_spring=qfrc_spring, qfrc_damper=qfrc_damper,
                   qfrc_gravcomp=qfrc_gravcomp, qfrc_fluid=qfrc_fluid,
                   qfrc_passive=qfrc_passive)


def _inertia_box_fluid(m: Model, d: Data) -> jax.Array:
  """Viscous + density fluid forces via the equivalent-inertia-box model."""
  dtype = d.qpos.dtype
  viscosity = float(m.opt.viscosity)
  density = float(m.opt.density)
  wind = jnp.asarray(m.opt.wind, dtype)
  mask = jnp.asarray(m.body_dof_mask, dtype)  # (nbody, nv)

  qfrc = jnp.zeros(m.nv, dtype)
  for b in range(1, m.nbody):
    mass = float(m.body_mass[b])
    if mass <= 0:
      continue
    inert = m.body_inertia[b]
    # equivalent box half-sizes from principal inertia
    box = np.sqrt(np.maximum(1e-12, np.array([
        inert[1] + inert[2] - inert[0],
        inert[0] + inert[2] - inert[1],
        inert[0] + inert[1] - inert[2]])) * 3.0 / (2.0 * mass))
    box = jnp.asarray(box, dtype)

    # 6D velocity of body com, rotated into the inertial frame
    offset = d.xipos[b] - d.subtree_com[m.body_rootid[b]]
    lvel6 = math.transform_motion(d.cvel[b], offset, d.ximat[b].T)
    ang, lin = lvel6[:3], lvel6[3:]
    lin = lin - d.ximat[b].T @ wind

    frc = jnp.zeros(3, dtype)
    trq = jnp.zeros(3, dtype)
    if viscosity > 0:
      diam = (box[0] + box[1] + box[2]) * 2.0 / 3.0
      frc = frc - 3.0 * jnp.pi * diam * viscosity * lin
      trq = trq - jnp.pi * diam ** 3 * viscosity * ang
    if density > 0:
      # quadratic drag: force_i ~ -0.5 rho area_i |v_i| v_i
      area = 4.0 * jnp.stack(
          [box[1] * box[2], box[0] * box[2], box[0] * box[1]])
      frc = frc - 0.5 * density * area * jnp.abs(lin) * lin
      # angular quadratic drag (form validated numerically vs the oracle)
      def ang_drag(i, j, k):
        return -density * box[i] * (box[j] ** 4 + box[k] ** 4) * jnp.abs(
            ang[i]) * ang[i] / 2.0
      trq = trq + jnp.stack([ang_drag(0, 1, 2), ang_drag(1, 0, 2),
                             ang_drag(2, 0, 1)])
    # rotate back to world, apply at xipos
    frc_w = d.ximat[b] @ frc
    trq_w = d.ximat[b] @ trq
    jacp, jacr = smooth.jac(m, d, d.xipos[b], b)
    qfrc = qfrc + jacp @ frc_w + jacr @ trq_w
  del mask
  return qfrc


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

  # activation dynamics
  act_dot = jnp.zeros(m.na, dtype)
  inputs = []
  for u in range(m.nu):
    dyn = DynType(int(m.actuator_dyntype[u]))
    if dyn == DynType.NONE:
      inputs.append(ctrl[u])
    else:
      a = int(m.actuator_actadr[u])
      act = d.act[a]
      if dyn == DynType.INTEGRATOR:
        act_dot = act_dot.at[a].set(ctrl[u])
      elif dyn in (DynType.FILTER, DynType.FILTEREXACT):
        tau = max(float(m.actuator_dynprm[u, 0]), 1e-12)
        act_dot = act_dot.at[a].set((ctrl[u] - act) / tau)
      else:
        raise NotImplementedError(f'dyntype {dyn}')
      inputs.append(act)
  input_ = jnp.stack(inputs)

  # gain / bias
  forces = []
  for u in range(m.nu):
    gain_t = GainType(int(m.actuator_gaintype[u]))
    bias_t = BiasType(int(m.actuator_biastype[u]))
    gp = m.actuator_gainprm[u]
    bp = m.actuator_biasprm[u]
    if gain_t == GainType.FIXED:
      gain = jnp.asarray(gp[0], dtype)
    elif gain_t == GainType.AFFINE:
      gain = gp[0] + gp[1] * d.actuator_length[u] + gp[2] * vel[u]
    else:
      raise NotImplementedError(f'gaintype {gain_t}')
    if bias_t == BiasType.NONE:
      bias = jnp.zeros((), dtype)
    elif bias_t == BiasType.AFFINE:
      bias = bp[0] + bp[1] * d.actuator_length[u] + bp[2] * vel[u]
    else:
      raise NotImplementedError(f'biastype {bias_t}')
    forces.append(gain * input_[u] + bias)
  force = jnp.stack(forces)

  if m.actuator_forcelimited.any():
    lo = jnp.asarray(m.actuator_forcerange[:, 0], dtype)
    hi = jnp.asarray(m.actuator_forcerange[:, 1], dtype)
    force = jnp.where(jnp.asarray(m.actuator_forcelimited),
                      jnp.clip(force, lo, hi), force)

  qfrc_actuator = d.actuator_moment.T @ force

  # clamp per-joint total actuator force (jnt_actfrcrange)
  if m.njnt and m.jnt_actfrclimited.any():
    for j in range(m.njnt):
      if not m.jnt_actfrclimited[j]:
        continue
      adr = int(m.jnt_dofadr[j])
      lo, hi = m.jnt_actfrcrange[j]
      qfrc_actuator = qfrc_actuator.at[adr].set(
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


def step1(m: Model, d: Data) -> Data:
  """Position + velocity stages + pos/vel sensors (mj_step1 analog)."""
  d = fwd_position(m, d)
  d = fwd_velocity(m, d)
  from dm_control_tpu._src import sensor
  d = sensor.sensors(m, d, stages='posvel')
  d = _energy(m, d)
  return d


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


def forward(m: Model, d: Data) -> Data:
  d = step1(m, d)
  d = _acc_stage(m, d)
  return d


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
  # spring potential
  qpos_spring = jnp.asarray(m.qpos_spring, dtype)
  for j in range(m.njnt):
    k = float(m.jnt_stiffness[j])
    if k == 0.0:
      continue
    jtype = JointType(int(m.jnt_type[j]))
    qadr = int(m.jnt_qposadr[j])
    if jtype in (JointType.SLIDE, JointType.HINGE):
      dif = d.qpos[qadr] - qpos_spring[qadr]
      potential = potential + 0.5 * k * dif * dif
  kinetic = 0.5 * d.qvel @ (d.qM @ d.qvel) if m.nv else jnp.zeros((), dtype)
  return d.replace(energy=jnp.stack([potential, kinetic]))


# ---------------------------------------------------------------------------
# Integrators.
# ---------------------------------------------------------------------------


def _integrate_pos(m: Model, qpos: jax.Array, qvel: jax.Array,
                   dt) -> jax.Array:
  """Advance qpos by qvel*dt with quaternion handling per joint type."""
  parts = []
  for j in range(m.njnt):
    jtype = JointType(int(m.jnt_type[j]))
    qadr, dadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
    if jtype == JointType.FREE:
      pos = qpos[qadr:qadr + 3] + dt * qvel[dadr:dadr + 3]
      quat = math.quat_integrate(
          qpos[qadr + 3:qadr + 7], qvel[dadr + 3:dadr + 6], dt)
      parts.append(pos)
      parts.append(quat)
    elif jtype == JointType.BALL:
      parts.append(math.quat_integrate(
          qpos[qadr:qadr + 4], qvel[dadr:dadr + 3], dt))
    else:
      parts.append(qpos[qadr:qadr + 1] + dt * qvel[dadr:dadr + 1])
  if not parts:
    return qpos
  return jnp.concatenate(parts)


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
