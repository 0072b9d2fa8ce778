"""Walker rescaling + range-scaled actuators.

Build-time XML utilities matching the reference's
locomotion/walkers/rescale.py:28-75 (recursive subtree geometry
scaling, humanoid mass retargeting) and scaled_actuators.py:40-135
(position/velocity actuators whose [ctrlmin, ctrlmax] maps affinely
onto a desired qpos/qvel range).  Everything here runs on MJCF
fragments before compilation, so the resulting Model stays static."""

from __future__ import annotations

from typing import Optional, Sequence
import xml.etree.ElementTree as ET

import numpy as np


def _floats(s: str) -> np.ndarray:
  return np.array([float(x) for x in s.split()]) if s else np.zeros(0)


def _fmt(v) -> str:
  return ' '.join(repr(float(x)) for x in np.atleast_1d(v))


def rescale_subtree(el: ET.Element, position_factor: float,
                    size_factor: float):
  """Recursively rescale positions/sizes of an XML subtree (reference
  rescale.py:28-43: fromto midpoints scale by position, half-extents by
  size; pos by position; size by size)."""
  for child in list(el):
    ft = child.attrib.get('fromto')
    if ft is not None:
      v = _floats(ft)
      mid = position_factor * 0.5 * (v[3:] + v[:3])
      half = size_factor * 0.5 * (v[3:] - v[:3])
      child.set('fromto', _fmt(np.concatenate([mid - half, mid + half])))
    pos = child.attrib.get('pos')
    if pos is not None:
      child.set('pos', _fmt(position_factor * _floats(pos)))
    size = child.attrib.get('size')
    if size is not None:
      child.set('size', _fmt(size_factor * _floats(size)))
    if child.tag in ('body', 'worldbody'):
      rescale_subtree(child, position_factor, size_factor)


def rescale_walker(entity, position_factor: float,
                   size_factor: Optional[float] = None,
                   mass: Optional[float] = None):
  """Rescale a walker entity's fragment (reference rescale.py:46-75).

  When `mass` is given, geom masses/densities are scaled so the
  compiled total mass equals it (the reference reads subtreemass from a
  live physics; here the fragment is compiled once to measure it)."""
  if size_factor is None:
    size_factor = position_factor
  wb = entity.mjcf_root.find('worldbody')
  rescale_subtree(wb, position_factor, size_factor)
  if mass is not None:
    from dm_control_tpu.mjcf.compiler import MJCFCompiler
    import copy
    m = MJCFCompiler(copy.deepcopy(entity.mjcf_root)).build()
    current = float(np.sum(np.asarray(m.body_mass)))
    factor = mass / current
    for geom in entity.mjcf_root.iter('geom'):
      if 'mass' in geom.attrib:
        geom.set('mass', repr(float(geom.attrib['mass']) * factor))
      else:
        density = float(geom.attrib.get('density', 1000.0))
        geom.set('density', repr(density * factor))
    for inertial in entity.mjcf_root.iter('inertial'):
      inertial.set('mass',
                   repr(float(inertial.attrib['mass']) * factor))
  return entity


_ALLOWED_TAGS = ('joint', 'tendon', 'site')


def _add_general(root: ET.Element, target_tag: str, target_name: str,
                 gainprm, biasprm, ctrlrange, **kwargs) -> ET.Element:
  if target_tag not in _ALLOWED_TAGS:
    raise TypeError(f'target tag should be one of {_ALLOWED_TAGS}: '
                    f'got {target_tag}')
  sec = root.find('actuator')
  if sec is None:
    sec = ET.SubElement(root, 'actuator')
  attrs = {k: str(v) for k, v in kwargs.items()}
  attrs.update({
      'biastype': 'affine',
      'gainprm': _fmt(gainprm),
      'biasprm': _fmt(biasprm),
      'ctrllimited': 'true',
      'ctrlrange': _fmt(ctrlrange),
      target_tag: target_name,
  })
  return ET.SubElement(sec, 'general', attrs)


def add_position_actuator(root: ET.Element, target_tag: str,
                          target_name: str, qposrange: Sequence[float],
                          ctrlrange: Sequence[float] = (-1, 1),
                          kp: float = 1.0, **kwargs) -> ET.Element:
  """<general> actuator mapping ctrlrange affinely onto qposrange
  (reference scaled_actuators.py:40-70: g0 = kp*slope,
  b0 = kp*(qpos0 - slope*ctrl0), b1 = -kp)."""
  slope = (qposrange[1] - qposrange[0]) / (ctrlrange[1] - ctrlrange[0])
  g0 = kp * slope
  b0 = kp * (qposrange[0] - slope * ctrlrange[0])
  return _add_general(root, target_tag, target_name,
                      [g0], [b0, -kp, 0.0], ctrlrange, **kwargs)


def add_velocity_actuator(root: ET.Element, target_tag: str,
                          target_name: str, qvelrange: Sequence[float],
                          ctrlrange: Sequence[float] = (-1, 1),
                          kv: float = 1.0, **kwargs) -> ET.Element:
  """<general> actuator mapping ctrlrange affinely onto qvelrange
  (reference scaled_actuators.py:105-135)."""
  slope = (qvelrange[1] - qvelrange[0]) / (ctrlrange[1] - ctrlrange[0])
  g0 = kv * slope
  b0 = kv * (qvelrange[0] - slope * ctrlrange[0])
  return _add_general(root, target_tag, target_name,
                      [g0], [b0, 0.0, -kv], ctrlrange, **kwargs)
