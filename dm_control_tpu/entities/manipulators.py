"""Manipulator entities (reference:
entities/manipulators/kinova/jaco_arm.py:52, jaco_hand.py:37).

The reference builds the Jaco arm/hand from per-link mesh MJCF files;
here the vendored j2s7s300 model (the same arm the suite jaco domain
uses) is exposed as an attachable composer entity with the standard
proprioceptive observables (joints_pos sin/cos, joints_vel,
joints_torque analog via actuator force)."""

from __future__ import annotations

import numpy as np

from dm_control_tpu.composer.entity import Entity
from dm_control_tpu.composer.observation import ObservableSpec


def JacoArm(name: str = 'jaco') -> Entity:
  """The 7-DoF Kinova Jaco j2s7s300 with its 3-finger hand as one
  attachable entity (reference jaco_arm.py:52 + jaco_hand.py:37; the
  hand is integral to the vendored model)."""
  import jax.numpy as jnp
  from dm_control_tpu.manipulation.tasks import _jaco_entity
  base = _jaco_entity()

  def joints(m, prefix):
    pref = prefix or name
    qs, ds = [], []
    for j in range(m.njnt):
      nm = m.id2name('joint', j) or ''
      if nm.startswith(pref + '/'):
        qs.append(int(m.jnt_qposadr[j]))
        ds.append(int(m.jnt_dofadr[j]))
    return np.asarray(qs), np.asarray(ds)

  def obs_pos(m, prefix):
    qs, _ = joints(m, prefix)
    return ObservableSpec(fn=lambda m_, d: jnp.concatenate(
        [jnp.sin(d.qpos[qs]), jnp.cos(d.qpos[qs])]))

  def obs_vel(m, prefix):
    _, ds = joints(m, prefix)
    return ObservableSpec(fn=lambda m_, d: d.qvel[ds])

  return Entity(mjcf_root=base.mjcf_root, name=name,
                observables={'joints_pos': obs_pos,
                             'joints_vel': obs_vel})
