"""Locomotion props (reference locomotion/props/target_sphere.py:25-124).

TargetSphere: a non-colliding sphere that activates on touch and stays
activated for the rest of the episode.  The reference detects activation
through contact pairs against specific geoms; geoms here are
non-colliding by construction, so activation is a proximity test of
named trigger bodies against the sphere — evaluated in-graph by entity
lifecycle hooks, with the activation latch carried in the Data.model_var
overlay (so it batches, auto-resets per lane, and recolors the sphere
through the same overlay the reward visualizer uses)."""

from __future__ import annotations

from typing import Optional, Sequence
import xml.etree.ElementTree as ET

import jax.numpy as jnp

from dm_control_tpu.composer.entity import Entity


class TargetSphere(Entity):
  """Touch-activated target.  Attach to a task, then call
  `install_hooks(trigger_bodies=[...])` with the FULL (prefixed) names
  of the bodies whose proximity activates it."""

  def __init__(self, radius: float = 0.6,
               height_above_ground: float = 1.0,
               rgb1: Sequence[float] = (0.0, 0.4, 0.0),
               rgb2: Sequence[float] = (0.0, 0.7, 0.0),
               name: str = 'target'):
    root = ET.fromstring('<mujoco><worldbody/></mujoco>')
    wb = root.find('worldbody')
    ET.SubElement(wb, 'geom', dict(
        name='target', type='sphere', size=str(radius),
        pos=f'0 0 {height_above_ground}', contype='0', conaffinity='0',
        rgba=f'{rgb1[0]} {rgb1[1]} {rgb1[2]} 1'))
    super().__init__(mjcf_root=root, name=name)
    self.radius = radius
    self._rgb1 = tuple(rgb1) + (1.0,)
    self._rgb2 = tuple(rgb2) + (1.0,)
    self._triggers: Optional[Sequence[str]] = None
    self.init_hook = self._init
    self.after_step_hook = self._after_step

  def install_hooks(self, trigger_bodies: Sequence[str]):
    """Bodies (full prefixed names) whose proximity activates this."""
    self._triggers = list(trigger_bodies)
    return self

  # -- in-graph hooks --------------------------------------------------------

  def _state_key(self, prefix):
    return f'{prefix or self.name}_activated'

  def _geom_id(self, m, prefix):
    return m.name2id('geom', f'{prefix}/target' if prefix else 'target')

  def touching(self, m, d, prefix):
    """In-graph proximity test of the trigger bodies this step."""
    gid = self._geom_id(m, prefix)
    center = (d.model_var or {}).get(
        'geom_pos', jnp.asarray(m.geom_pos, d.qpos.dtype))[gid]
    tb = jnp.asarray([m.name2id('body', b) for b in self._triggers or []])
    if tb.shape[0] == 0:
      return jnp.zeros((), bool)
    dist = jnp.linalg.norm(d.xpos[tb] - center[None], axis=-1)
    return jnp.min(dist) < self.radius

  def activated(self, m, d, prefix=None):
    return (d.model_var or {}).get(
        self._state_key(prefix), jnp.zeros((), d.qpos.dtype)) > 0.5

  def _init(self, m, d, key, prefix):
    mv = dict(d.model_var or {})
    dtype = d.qpos.dtype
    mv[self._state_key(prefix)] = jnp.zeros((), dtype)
    gid = self._geom_id(m, prefix)
    rgba = mv.get('geom_rgba', jnp.asarray(m.geom_rgba, dtype))
    mv['geom_rgba'] = rgba.at[gid].set(jnp.asarray(self._rgb1, dtype))
    return d.replace(model_var=mv)

  def _after_step(self, m, d, key, prefix):
    mv = dict(d.model_var or {})
    dtype = d.qpos.dtype
    was = mv.get(self._state_key(prefix), jnp.zeros((), dtype))
    now = jnp.maximum(was, self.touching(m, d, prefix).astype(dtype))
    mv[self._state_key(prefix)] = now
    gid = self._geom_id(m, prefix)
    rgba = mv.get('geom_rgba', jnp.asarray(m.geom_rgba, dtype))
    color = jnp.where(now > 0.5, jnp.asarray(self._rgb2, dtype),
                      jnp.asarray(self._rgb1, dtype))
    mv['geom_rgba'] = rgba.at[gid].set(color)
    return d.replace(model_var=mv)
