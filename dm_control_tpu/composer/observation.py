"""In-graph observable pipeline: update intervals, delays, buffers.

Re-expresses the reference's Observable/Buffer/Updater semantics
(dm_control/composer/observation/observable/base.py:60-160,
obs_buffer.py:29-186, updater.py:125-323) without host callbacks:

  * every observable has `update_interval` (in physics substeps),
    `buffer_size`, `delay` (substeps until a sample becomes visible),
    an optional `aggregator` over the buffer, and an optional `corruptor`
    applied at sampling time;
  * buffers are fixed-size ring buffers carried as a pytree, advanced by
    a pure `update` on every substep and read by a pure `read`.

Out-of-order delayed arrivals (reference obs_buffer.py:118-186) reduce,
for deterministic integer delays, to a delay-line: a sample taken at
substep t becomes visible at t + delay; the ring stores (value, visible_at)
and `read` masks out entries still in flight.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src.types import Data, Model

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ObservableSpec:
  """One observable: a pure read of (Model, Data) plus sampling config."""
  fn: Callable[[Model, Data], Array]
  update_interval: int = 1
  buffer_size: int = 1
  delay: int = 0
  aggregator: Optional[Callable[[Array], Array]] = None  # over axis 0
  corruptor: Optional[Callable[[Array, Array], Array]] = None  # (val, key)
  enabled: bool = True


def camera_observable(camera=0, height: int = 48, width: int = 64,
                      depth: bool = False, segmentation: bool = False,
                      pose=None, **sampling) -> ObservableSpec:
  """First-class camera observable — the reference `MJCFCamera`
  equivalent (composer/observation/observable/mjcf.py:110, 207-222),
  rendered by the in-graph analytic raytracer so it jits/vmaps with the
  rest of the pipeline.

  Args:
    camera: model camera id (int) or name (str), ignored when `pose`
      is given.
    height, width: image size.
    depth: render (H, W) float distances instead of RGB.
    segmentation: render (H, W, 2) int32 (geom id, objtype) pairs,
      background (-1, -1) — the reference's segmentation convention
      (mjcf.py:207-222); the raytracer labels geoms, so objtype is
      always mjOBJ_GEOM (5) on hits.
    pose: optional explicit (position, rotation, fovy_radians) camera
      override (e.g. from `render.free_camera_pose`).
    **sampling: update_interval / buffer_size / delay / aggregator /
      corruptor, as for any ObservableSpec.

  RGB returns float32 in [0, 1] (the jit-native convention) rather than
  the reference's uint8; multiply by 255 at the consumer if byte images
  are required.
  """
  if depth and segmentation:
    raise ValueError('cannot enable both segmentation and depth')
  from dm_control_tpu._src import render as _render

  def fn(m: Model, d: Data):
    cam = pose
    cam_id = 0
    if cam is None and isinstance(camera, str):
      cam_id = m.name2id('camera', camera)
    elif cam is None:
      cam_id = int(camera)
    if cam is not None:
      cam = (jnp.asarray(cam[0], d.qpos.dtype),
             jnp.asarray(cam[1], d.qpos.dtype), cam[2])
    out = _render.render(m, d, height, width, camera_id=cam_id,
                         depth=depth, segmentation=segmentation,
                         camera=cam)
    if segmentation:
      gid = out.astype(jnp.int32)
      objtype = jnp.where(gid >= 0, jnp.int32(5), jnp.int32(-1))
      return jnp.stack([gid, objtype], axis=-1)
    if depth:
      return out
    return out.astype(jnp.float32)

  return ObservableSpec(fn=fn, **sampling)


@dataclasses.dataclass(frozen=True)
class _Entry:
  name: str
  spec: ObservableSpec
  shape: tuple
  dtype: Any


class ObservationPipeline:
  """Compiled pipeline over a dict of ObservableSpec."""

  def __init__(self, model: Model, specs: Dict[str, ObservableSpec],
               example_data: Data):
    self.model = model
    self._entries = []
    for name, spec in specs.items():
      if not spec.enabled:
        continue
      val = spec.fn(model, example_data)
      self._entries.append(_Entry(
          name=name, spec=spec, shape=tuple(np.shape(val)),
          dtype=jnp.asarray(val).dtype))

  def _capacity(self, spec: ObservableSpec) -> int:
    """Ring capacity: requested history + room for in-flight (delayed)
    samples so pending writes never evict arrived values (the reference
    Buffer keeps arriving items separate, obs_buffer.py:53-118)."""
    in_flight = 0
    if spec.delay > 0:
      in_flight = spec.delay // max(spec.update_interval, 1) + 1
    return spec.buffer_size + in_flight

  def init_state(self):
    """Ring buffers: per observable (capacity, *shape) + visible_at."""
    state = {}
    for e in self._entries:
      cap = self._capacity(e.spec)
      state[e.name] = dict(
          values=jnp.zeros((cap,) + e.shape, e.dtype),
          visible_at=jnp.full((cap,), jnp.iinfo(jnp.int32).max, jnp.int32),
          write_idx=jnp.zeros((), jnp.int32),
      )
    return state

  def update(self, state, d: Data, substep: Array, key: Array):
    """Advance buffers at physics substep index `substep` (0-based)."""
    new_state = {}
    for i, e in enumerate(self._entries):
      st = state[e.name]
      due = (substep % e.spec.update_interval) == 0
      val = e.spec.fn(self.model, d)
      if e.spec.corruptor is not None:
        val = e.spec.corruptor(val, jax.random.fold_in(key, i))
      idx = st['write_idx'] % self._capacity(e.spec)
      values = jnp.where(
          due,
          st['values'].at[idx].set(val),
          st['values'])
      visible = jnp.where(
          due,
          st['visible_at'].at[idx].set(
              substep.astype(jnp.int32) + e.spec.delay),
          st['visible_at'])
      widx = jnp.where(due, st['write_idx'] + 1, st['write_idx'])
      new_state[e.name] = dict(values=values, visible_at=visible,
                               write_idx=widx)
    return new_state

  def read(self, state, substep: Array):
    """Observation dict at substep: the newest `buffer_size` samples whose
    delay has elapsed, chronological (oldest first), zero-padded."""
    out = {}
    for e in self._entries:
      st = state[e.name]
      cap = self._capacity(e.spec)
      bs = e.spec.buffer_size
      # chronological ring order (oldest write first)
      order = (st['write_idx'] + jnp.arange(cap)) % cap
      vals = jnp.take(st['values'], order, axis=0)
      vis = jnp.take(st['visible_at'], order) <= substep.astype(jnp.int32)
      # rank from the end among ARRIVED entries: 0 = newest arrived
      arrived = vis.astype(jnp.int32)
      rank_from_end = (jnp.cumsum(arrived[::-1])[::-1] - 1)
      slot = bs - 1 - rank_from_end
      ok = vis & (rank_from_end >= 0) & (rank_from_end < bs)
      slot = jnp.where(ok, slot, bs)  # bs = dump row
      buf = jnp.zeros((bs + 1,) + e.shape, e.dtype)
      buf = buf.at[slot].set(jnp.where(
          ok.reshape((-1,) + (1,) * len(e.shape)), vals, 0.0))
      buf = buf[:bs]
      if e.spec.aggregator is not None:
        out[e.name] = e.spec.aggregator(buf)
      elif bs == 1:
        out[e.name] = buf[0]
      else:
        out[e.name] = buf
    return out
