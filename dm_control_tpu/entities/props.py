"""Primitive props and the position detector (reference:
entities/props/primitive.py:28, position_detector.py:45).

A Primitive is a single free-jointed geom with pose/velocity
observables (the reference attaches framepos/framequat/framelinvel/
frameangvel sensors; here the observables read the free joint's
qpos/qvel directly — same values, no sensor rows burned).

A PositionDetector reports whether registered entities' bodies lie
inside a cuboidal region.  The reference flips geom colors via a
host-side hook; here detection is a pure function of Data exposed as an
observable and a `detected(m, d, body)` predicate usable in rewards and
terminations (in-graph, batched)."""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence
import xml.etree.ElementTree as ET

import jax.numpy as jnp
import numpy as np

from dm_control_tpu.composer.entity import Entity
from dm_control_tpu.composer.observation import ObservableSpec

_GEOM_SIZES = {'sphere': 1, 'capsule': 2, 'cylinder': 2, 'ellipsoid': 3,
               'box': 3}


class Primitive(Entity):
  """Free prop of a single geom (reference primitive.py:28-58)."""

  def __init__(self, geom_type: str, size: Sequence[float],
               name: str = 'prop', mass: Optional[float] = None,
               rgba=(0.8, 0.6, 0.2, 1.0), friction=None, pos=(0, 0, 0.5)):
    if geom_type not in _GEOM_SIZES:
      raise ValueError(f'unsupported geom type {geom_type!r}')
    if len(size) != _GEOM_SIZES[geom_type]:
      raise ValueError(
          f'{geom_type} wants {_GEOM_SIZES[geom_type]} size values')
    root = ET.Element('mujoco')
    wb = ET.SubElement(root, 'worldbody')
    body = ET.SubElement(wb, 'body', dict(
        name=name, pos=' '.join(str(v) for v in pos)))
    ET.SubElement(body, 'freejoint', dict(name=f'{name}_root'))
    geom = dict(name=f'{name}_geom', type=geom_type,
                size=' '.join(str(v) for v in size),
                rgba=' '.join(str(v) for v in rgba))
    if mass is not None:
      geom['mass'] = str(mass)
    if friction is not None:
      geom['friction'] = ' '.join(str(v) for v in friction)
    ET.SubElement(body, 'geom', geom)
    super().__init__(mjcf_root=root, name=name,
                     observables=self._make_observables(name))
    self.geom_type = geom_type
    self.size = tuple(size)

  @staticmethod
  def _make_observables(name):
    def factory(field, sl):
      def make(m, prefix):
        jname = f'{prefix or name}/{name}_root'
        j = m.name2id('joint', jname)
        if field == 'qpos':
          adr = int(m.jnt_qposadr[j])
        else:
          adr = int(m.jnt_dofadr[j])
        lo, n = sl
        return ObservableSpec(
            fn=lambda m_, d, a=adr + lo, k=n:
            getattr(d, field)[a:a + k])
      return make
    return {
        'position': factory('qpos', (0, 3)),
        'orientation': factory('qpos', (3, 4)),
        'linear_velocity': factory('qvel', (0, 3)),
        'angular_velocity': factory('qvel', (3, 3)),
    }

  def root_joint(self, m, prefix=None):
    """(qpos_adr, dof_adr) of the prop's free joint in a compiled model."""
    j = m.name2id('joint', f'{prefix or self.name}/{self.name}_root')
    return int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])


@dataclasses.dataclass
class PositionDetector:
  """Cuboidal region detector (reference position_detector.py:45-130).

  2D mode (len(pos) == 2): infinite z extent.  `inverted` detects
  bodies OUTSIDE the region."""
  pos: Sequence[float]
  size: Sequence[float]
  inverted: bool = False
  name: str = 'position_detector'

  def __post_init__(self):
    if len(self.pos) != len(self.size) or len(self.pos) not in (2, 3):
      raise ValueError('pos/size must both have length 2 or 3')

  def site_entity(self, rgba=(1, 1, 1, 0.25)) -> Entity:
    """Optional visual marker for the region (non-colliding geom)."""
    root = ET.Element('mujoco')
    wb = ET.SubElement(root, 'worldbody')
    pos3 = tuple(self.pos) + (0.0,) * (3 - len(self.pos))
    size3 = tuple(self.size) + (0.01,) * (3 - len(self.size))
    ET.SubElement(wb, 'geom', dict(
        name=f'{self.name}_region', type='box', contype='0',
        conaffinity='0', pos=' '.join(str(v) for v in pos3),
        size=' '.join(str(v) for v in size3),
        rgba=' '.join(str(v) for v in rgba)))
    return Entity(mjcf_root=root, name=self.name)

  def detected(self, m, d, body: int):
    """In-graph: is `body`'s frame origin inside (or outside when
    inverted) the region?"""
    k = len(self.pos)
    p = d.xpos[body][:k]
    lo = jnp.asarray(self.pos, p.dtype) - jnp.asarray(self.size, p.dtype)
    hi = jnp.asarray(self.pos, p.dtype) + jnp.asarray(self.size, p.dtype)
    inside = jnp.all((p >= lo) & (p <= hi))
    return jnp.logical_not(inside) if self.inverted else inside

  def observable(self, body: int) -> ObservableSpec:
    return ObservableSpec(
        fn=lambda m, d: self.detected(m, d, body).astype(d.qpos.dtype)[
            None])
