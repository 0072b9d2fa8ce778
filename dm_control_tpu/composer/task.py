"""ComposerTask: compose entities into a compiled model + pure task fns.

Functional analog of dm_control.composer.Task (composer/task.py:44-318):
a root entity (arena) plus attached entities, compiled once; episode
hooks are pure functions; observables come from the entities plus
task-level additions.
"""

from __future__ import annotations

import copy
import dataclasses
from typing import Callable, Dict, List, Optional, Tuple
import xml.etree.ElementTree as ET

import jax
import jax.numpy as jnp

from dm_control_tpu._src import setconst
from dm_control_tpu._src.types import Data, Model
from dm_control_tpu.composer.entity import Entity, attach
from dm_control_tpu.composer.observation import ObservableSpec
from dm_control_tpu.mjcf import compiler as mjcf_compiler


@dataclasses.dataclass
class ComposerTask:
  """Arena + attached entities + reward/termination/init functions."""
  arena: Entity
  control_timestep: Optional[float] = None
  physics_timestep: Optional[float] = None

  def __post_init__(self):
    self._attachments: List[Tuple[Entity, dict]] = []
    self._observables: Dict[str, ObservableSpec] = {}
    # observables registered via add_observable(), kept separately so
    # they survive per-episode recompiles (recompile() rebuilds
    # _observables from entity factories; user specs are re-merged)
    self._user_observables: Dict[str, ObservableSpec] = {}
    self._reward_fn: Optional[Callable] = None
    self._termination_fn: Optional[Callable] = None
    self._init_fns: List[Callable] = []
    self._model: Optional[Model] = None

  # -- composition ---------------------------------------------------------

  def attach(self, entity: Entity, prefix: Optional[str] = None,
             site_body: Optional[str] = None, pos: Optional[str] = None):
    self._attachments.append(
        (entity, dict(prefix=prefix, site_body=site_body, pos=pos)))
    return self

  def add_observable(self, name: str, spec: ObservableSpec):
    self._user_observables[name] = spec
    if self._model is not None:
      self._observables[name] = spec
    return self

  def set_reward(self, fn: Callable[[Model, Data], jax.Array]):
    self._reward_fn = fn
    return self

  def set_termination(self, fn):
    self._termination_fn = fn
    return self

  def add_init_hook(self, fn):
    """fn(model, data, key) -> Data, applied in order at episode init."""
    self._init_fns.append(fn)
    return self

  # -- compilation ---------------------------------------------------------

  @property
  def has_mjcf_hooks(self) -> bool:
    """True when any entity varies its MJCF per episode, so the
    environment must recompile each reset (ref environment.py:296)."""
    return any(e.mjcf_hook is not None
               for e, _ in [(self.arena, None)] + self._attachments)

  def step_hooks(self, stage: str):
    """[(fn, prefix)] for an in-graph stage: before_step,
    before_substep, after_substep, after_step."""
    out = []
    for entity, kw in [(self.arena, {})] + self._attachments:
      fn = getattr(entity, f'{stage}_hook')
      if fn is not None:
        prefix = (kw or {}).get('prefix') or (
            entity.name if entity is not self.arena else None)
        out.append((fn, prefix))
    return out

  def recompile(self, random_state=None) -> Model:
    """Re-run mjcf hooks on every entity fragment and rebuild the
    Model (per-episode MJCF variation, ref environment.py:296-323)."""
    self._model = None
    self._observables = {}
    return self.compile(random_state)

  def compile(self, random_state=None) -> Model:
    if self._model is not None:
      return self._model
    for entity, _ in [(self.arena, None)] + self._attachments:
      if entity.mjcf_hook is not None:
        entity.mjcf_hook(entity.mjcf_root, random_state)
    root = copy.deepcopy(self.arena.mjcf_root)
    for entity, kw in self._attachments:
      attach(root, entity, **kw)
    if self.physics_timestep is not None:
      opt = root.find('option')
      if opt is None:
        opt = ET.SubElement(root, 'option')
      opt.set('timestep', str(self.physics_timestep))
    m = mjcf_compiler.MJCFCompiler(root).build()
    self._model = setconst.set_const(m)
    # entity observables resolve names post-compile
    for entity, kw in self._attachments:
      prefix = kw.get('prefix') or entity.name
      for oname, factory in entity.observables.items():
        self._observables[f'{prefix}/{oname}'] = factory(
            self._model, prefix)
    for oname, factory in self.arena.observables.items():
      self._observables[oname] = factory(self._model, None)
    for entity, kw in [(self.arena, {})] + self._attachments:
      if entity.after_compile_hook is not None:
        prefix = (kw or {}).get('prefix') or (
            entity.name if entity is not self.arena else None)
        entity.after_compile_hook(self._model, prefix)
    # re-merge task-level observables (they survive recompiles)
    self._observables.update(self._user_observables)
    return self._model

  @property
  def model(self) -> Model:
    return self.compile()

  @property
  def observables(self) -> Dict[str, ObservableSpec]:
    self.compile()
    return dict(self._observables)

  def init_episode(self, m: Model, d: Data, key: jax.Array) -> Data:
    for entity, kw in self._attachments:
      if entity.init_hook is not None:
        key, sub = jax.random.split(key)
        prefix = kw.get('prefix') or entity.name
        d = entity.init_hook(m, d, sub, prefix)
    for fn in self._init_fns:
      key, sub = jax.random.split(key)
      d = fn(m, d, sub)
    return d

  def get_reward(self, m: Model, d: Data) -> jax.Array:
    if self._reward_fn is None:
      return jnp.zeros((), d.qpos.dtype)
    return self._reward_fn(m, d)

  def get_termination(self, m: Model, d: Data):
    if self._termination_fn is None:
      return None
    return self._termination_fn(m, d)
