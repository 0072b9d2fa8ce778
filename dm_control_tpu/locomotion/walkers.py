"""Walker entities with egocentric observables
(reference: locomotion/walkers/base.py:83-131, ant.py).

The ant walker's model is generated procedurally (own design, not the
reference asset): a spherical torso with four 2-segment capsule legs,
torque actuators, and the standard proprioceptive sensor suite."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import jax.numpy as jnp
import numpy as np

from dm_control_tpu.composer.entity import Entity
from dm_control_tpu.composer.observation import ObservableSpec


def _ant_xml(torso_radius=0.25, leg_length=0.35, foot_length=0.45):
  root = ET.Element('mujoco')
  default = ET.SubElement(root, 'default')
  ET.SubElement(default, 'joint', dict(
      damping='1', armature='0.1', limited='true'))
  ET.SubElement(default, 'geom', dict(
      friction='1 0.5 0.5', density='400'))
  ET.SubElement(default, 'motor', dict(
      ctrllimited='true', ctrlrange='-1 1', gear='60'))
  wb = ET.SubElement(root, 'worldbody')
  torso = ET.SubElement(wb, 'body', dict(name='torso', pos='0 0 0.55'))
  ET.SubElement(torso, 'freejoint', dict(name='root'))
  ET.SubElement(torso, 'geom', dict(
      name='torso_geom', type='sphere', size=str(torso_radius)))
  ET.SubElement(torso, 'site', dict(name='imu', pos='0 0 0'))
  act = ET.SubElement(root, 'actuator')
  sens = ET.SubElement(root, 'sensor')
  ET.SubElement(sens, 'velocimeter', dict(name='torso_vel', site='imu'))
  ET.SubElement(sens, 'gyro', dict(name='torso_gyro', site='imu'))
  ET.SubElement(sens, 'accelerometer', dict(name='torso_acc', site='imu'))
  for i, (dx, dy) in enumerate([(1, 1), (-1, 1), (-1, -1), (1, -1)]):
    nx, ny = dx / np.sqrt(2), dy / np.sqrt(2)
    hip = ET.SubElement(torso, 'body', dict(
        name=f'hip_{i}',
        pos=f'{nx * torso_radius} {ny * torso_radius} 0'))
    ET.SubElement(hip, 'joint', dict(
        name=f'hip_{i}', type='hinge', axis='0 0 1', range='-40 40'))
    ET.SubElement(hip, 'geom', dict(
        name=f'upper_leg_{i}', type='capsule', size='0.06',
        fromto=f'0 0 0 {nx * leg_length} {ny * leg_length} 0'))
    knee = ET.SubElement(hip, 'body', dict(
        name=f'knee_{i}',
        pos=f'{nx * leg_length} {ny * leg_length} 0'))
    ET.SubElement(knee, 'joint', dict(
        name=f'knee_{i}', type='hinge',
        axis=f'{-ny} {nx} 0', range='30 100'))
    ET.SubElement(knee, 'geom', dict(
        name=f'lower_leg_{i}', type='capsule', size='0.05',
        fromto=f'0 0 0 {nx * foot_length} {ny * foot_length} '
               f'{-foot_length}'))
    ET.SubElement(act, 'motor', dict(name=f'hip_{i}', joint=f'hip_{i}'))
    ET.SubElement(act, 'motor', dict(name=f'knee_{i}', joint=f'knee_{i}'))
  return root


class Ant(Entity):
  """Quadruped walker with the reference's egocentric observable groups
  (proprioception: joints_pos/joints_vel; kinematics: world_zaxis,
  body_height; dynamics: sensors_velocimeter/gyro/accelerometer —
  reference walkers/base.py:159-203)."""

  def __init__(self, name='walker'):
    super().__init__(mjcf_root=_ant_xml(), name=name)

  def observables_for(self, m, prefix):
    """name -> ObservableSpec, resolved against the compiled model."""
    torso = m.name2id('body', f'{prefix}/torso')
    hinge_q = np.array(
        [int(m.jnt_qposadr[j]) for j in range(m.njnt)
         if m.id2name('joint', j).startswith(prefix + '/')
         and int(m.jnt_type[j]) == 3])
    hinge_d = np.array(
        [int(m.jnt_dofadr[j]) for j in range(m.njnt)
         if m.id2name('joint', j).startswith(prefix + '/')
         and int(m.jnt_type[j]) == 3])

    def sensor_slice(name):
      s = m.names['sensor'][f'{prefix}/{name}']
      return int(m.sensor_adr[s]), int(m.sensor_dim[s])

    out = {}
    out['joints_pos'] = ObservableSpec(
        fn=lambda _m, d: d.qpos[hinge_q])
    out['joints_vel'] = ObservableSpec(
        fn=lambda _m, d: d.qvel[hinge_d])
    out['world_zaxis'] = ObservableSpec(
        fn=lambda _m, d: d.xmat[torso, 2])
    out['body_height'] = ObservableSpec(
        fn=lambda _m, d: d.xpos[torso, 2])
    for sname in ('torso_vel', 'torso_gyro', 'torso_acc'):
      adr, dim = sensor_slice(sname)
      out[f'sensors_{sname}'] = ObservableSpec(
          fn=lambda _m, d, a=adr, n=dim: d.sensordata[a:a + n])
    return out, torso
