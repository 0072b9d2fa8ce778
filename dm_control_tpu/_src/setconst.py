"""Derived model constants computed at qpos0 (reference: mj_setConst).

Runs the engine's own smooth pipeline once at the reference configuration
and writes inverse-weight statistics back into the Model.  These scale the
constraint regularizer R = (1-imp)/imp * invweight (see constraint.py), so
they must match the oracle for constraint-force parity; validated in
tests/test_constraint.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import forward as fwd
from dm_control_tpu._src import smooth
from dm_control_tpu._src.types import Model


def set_const(m: Model) -> Model:
  """Fill dof/body/tendon invweight0, actuator_acc0/length0, tendon_length0."""
  if m.nv == 0:
    return m

  def stats(qpos):
    d = fwd.make_data(m)
    d = d.replace(qpos=qpos)
    d = smooth.kinematics(m, d)
    d = smooth.com_pos(m, d)
    d = smooth.crb(m, d)
    d = smooth.factor_m(m, d)
    d = smooth.tendon(m, d)
    d = smooth.transmission(m, d)
    minv = jnp.linalg.inv(d.qM)
    out = dict(
        dof_invweight0=jnp.diag(minv),
        ten_length=d.ten_length,
        actuator_length=d.actuator_length,
        meaninertia=jnp.trace(d.qM) / m.nv,
    )
    # body invweights: mean diagonal of J M^-1 J^T at body com
    biw = []
    for b in range(m.nbody):
      jacp, jacr = smooth.jac(m, d, d.xipos[b], b)
      at = jnp.trace(jacp.T @ minv @ jacp) / 3.0
      ar = jnp.trace(jacr.T @ minv @ jacr) / 3.0
      biw.append(jnp.stack([at, ar]))
    out['body_invweight0'] = jnp.stack(biw)
    if m.ntendon:
      out['tendon_invweight0'] = jnp.einsum(
          'tv,vw,tw->t', d.ten_J, minv, d.ten_J)
    if m.nu:
      acc = jnp.einsum('uv,vw->uw', d.actuator_moment, minv)
      out['actuator_acc0'] = jnp.linalg.norm(acc, axis=-1)
    return out

  res = jax.jit(stats)(jnp.asarray(m.qpos0))
  m.dof_invweight0 = np.array(res['dof_invweight0'], np.float64)
  # the reference averages dof invweights within ball / free-joint triples
  # (verified against oracle dof_invweight0 on free-root models)
  from dm_control_tpu._src.types import JointType
  for j in range(m.njnt):
    jt = JointType(int(m.jnt_type[j]))
    adr = int(m.jnt_dofadr[j])
    if jt == JointType.BALL:
      m.dof_invweight0[adr:adr + 3] = m.dof_invweight0[adr:adr + 3].mean()
    elif jt == JointType.FREE:
      m.dof_invweight0[adr:adr + 3] = m.dof_invweight0[adr:adr + 3].mean()
      m.dof_invweight0[adr + 3:adr + 6] = (
          m.dof_invweight0[adr + 3:adr + 6].mean())
  m.body_invweight0 = np.asarray(res['body_invweight0'], np.float64)
  m.tendon_length0 = np.asarray(res['ten_length'], np.float64)
  m.actuator_length0 = np.asarray(res['actuator_length'], np.float64)
  if m.ntendon:
    m.tendon_invweight0 = np.asarray(res['tendon_invweight0'], np.float64)
  if m.nu:
    m.actuator_acc0 = np.asarray(res['actuator_acc0'], np.float64)
  # springdamper joints: the reference compiler derives stiffness/damping
  # from the dof inertia so the joint behaves as a mass-spring-damper with
  # the given (timeconst, dampratio): k = I/(t^2 z^2), d = 2 I/t
  # (fitted exactly against the oracle's dog.xml caudal joints).
  if m.jnt_springdamper is not None and m.njnt:
    m.jnt_stiffness = np.array(m.jnt_stiffness, np.float64)
    m.dof_damping = np.array(m.dof_damping, np.float64)
    for j in range(m.njnt):
      tau, zeta = m.jnt_springdamper[j]
      if tau <= 0:
        continue
      dadr = int(m.jnt_dofadr[j])
      inertia = 1.0 / max(float(m.dof_invweight0[dadr]), 1e-12)
      m.jnt_stiffness[j] = inertia / (tau * tau * zeta * zeta)
      m.dof_damping[dadr] = 2.0 * inertia / tau

  m.stat_meaninertia = float(res['meaninertia'])
  # any efc layout cached during this pass saw placeholder invweights;
  # layouts are structural-only now, but drop it anyway for hygiene.
  m.__dict__.pop('_efc_layout', None)
  return m
