"""Procedural arenas (reference: locomotion/arenas/floors.py:30,
corridors.py:75,181,340).  Arenas are composer Entities whose XML is
generated at build time — static topology, so batched environments share
one compiled model."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np

from dm_control_tpu.composer.entity import Entity


def _base(timestep=0.0025):
  root = ET.Element('mujoco')
  ET.SubElement(root, 'option', dict(timestep=str(timestep)))
  ET.SubElement(root, 'worldbody')
  return root


def floor(size=(8.0, 8.0), name='floor', timestep=0.0025) -> Entity:
  """An infinite-plane floor arena (reference arenas/floors.py:30)."""
  root = _base(timestep)
  wb = root.find('worldbody')
  ET.SubElement(wb, 'geom', dict(
      name='groundplane', type='plane',
      size=f'{size[0]} {size[1]} 0.25', friction='0.7 0.005 0.0001'))
  return Entity(mjcf_root=root, name=name)


def empty_corridor(length=40.0, width=4.0, timestep=0.0025) -> Entity:
  """EmptyCorridor (reference arenas/corridors.py:75): a floor strip with
  side walls running along +x."""
  root = _base(timestep)
  wb = root.find('worldbody')
  ET.SubElement(wb, 'geom', dict(
      name='floor', type='plane', pos=f'{length / 2} 0 0',
      size=f'{length / 2 + 1} {width / 2} 0.25'))
  for sign, tag in ((1.0, 'left'), (-1.0, 'right')):
    ET.SubElement(wb, 'geom', dict(
        name=f'wall_{tag}', type='box',
        pos=f'{length / 2} {sign * (width / 2 + 0.1)} 0.5',
        size=f'{length / 2 + 1} 0.1 0.5'))
  return Entity(mjcf_root=root, name='corridor')


def gaps_corridor(length=40.0, width=4.0, platform_length=2.5,
                  gap_length=0.5, timestep=0.0025) -> Entity:
  """GapsCorridor (reference arenas/corridors.py:181): floor platforms
  separated by gaps over a lethal ground plane."""
  root = _base(timestep)
  wb = root.find('worldbody')
  ET.SubElement(wb, 'geom', dict(
      name='lava', type='plane', pos=f'{length / 2} 0 -1',
      size=f'{length / 2 + 2} {width / 2 + 2} 0.25'))
  x = 0.0
  i = 0
  while x < length:
    plen = platform_length if i else 3.0  # longer start platform
    ET.SubElement(wb, 'geom', dict(
        name=f'platform_{i}', type='box',
        pos=f'{x + plen / 2} 0 -0.25',
        size=f'{plen / 2} {width / 2} 0.25'))
    x += plen + gap_length
    i += 1
  for sign, tag in ((1.0, 'left'), (-1.0, 'right')):
    ET.SubElement(wb, 'geom', dict(
        name=f'wall_{tag}', type='box',
        pos=f'{length / 2} {sign * (width / 2 + 0.1)} 0.5',
        size=f'{length / 2 + 1} 0.1 0.5'))
  return Entity(mjcf_root=root, name='corridor')


def walls_corridor(length=40.0, width=4.0, wall_gap=2.0, wall_width=1.2,
                   rng_seed=0, timestep=0.0025) -> Entity:
  """WallsCorridor (reference arenas/corridors.py:340): staggered wall
  obstacles the walker must slalom through."""
  root = _base(timestep)
  wb = root.find('worldbody')
  ET.SubElement(wb, 'geom', dict(
      name='floor', type='plane', pos=f'{length / 2} 0 0',
      size=f'{length / 2 + 1} {width / 2} 0.25'))
  rng = np.random.RandomState(rng_seed)
  x = 4.0
  i = 0
  while x < length:
    side = 1.0 if i % 2 == 0 else -1.0
    y = side * (width / 2 - wall_width / 2)
    ET.SubElement(wb, 'geom', dict(
        name=f'obstacle_{i}', type='box', pos=f'{x} {y} 0.5',
        size=f'0.1 {wall_width / 2} 0.5'))
    x += wall_gap + rng.uniform(0, 1.0)
    i += 1
  for sign, tag in ((1.0, 'left'), (-1.0, 'right')):
    ET.SubElement(wb, 'geom', dict(
        name=f'wall_{tag}', type='box',
        pos=f'{length / 2} {sign * (width / 2 + 0.1)} 0.5',
        size=f'{length / 2 + 1} 0.1 0.5'))
  return Entity(mjcf_root=root, name='corridor')
