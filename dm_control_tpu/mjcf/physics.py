"""bind(): live coupling between MJCF elements and physics arrays.

Functional analog of the reference's ``physics.bind(mjcf_element)``
(dm_control/mjcf/physics.py:556-780), which returns a Binding object
whose attributes read and WRITE the live mjModel/mjData rows that the
element compiled into.  Here models are immutable compiled pytrees, so
the tpu-native contract is:

  * reads are host-side numpy views resolved by element name, exactly
    like the reference's ``physics.bind(geom).xpos``;
  * data writes are functional: ``binding.update_data(d, qpos=...)``
    returns a new ``Data`` (usable inside jit — indices are static);
  * model writes ride the ``Data.model_var`` per-episode overlay:
    ``binding.update_model(d, rgba=...)`` returns a Data whose overlay
    shadows the static Model rows inside the engine (the same mechanism
    the suite uses for per-episode target positions), which is the
    jit/vmap-compatible replacement for mutating mjModel in place.

Attribute naming follows the reference: the namespace prefix is
stripped, so ``bind(m, geom).pos`` reads ``m.geom_pos`` and
``bind(m, geom, d).xpos`` reads ``d.geom_xpos``; joints expose the
ragged ``qpos``/``qvel``/``qacc`` address ranges.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np

from dm_control_tpu._src import math as _math
from dm_control_tpu._src import named as _named
from dm_control_tpu._src.types import Model

# tags that resolve to a name table namespace
_TAG_TO_NS = {
    'body': 'body', 'geom': 'geom', 'site': 'site', 'joint': 'joint',
    'freejoint': 'joint', 'general': 'actuator', 'motor': 'actuator',
    'position': 'actuator', 'velocity': 'actuator', 'muscle': 'actuator',
    'cylinder': 'actuator', 'actuator': 'actuator', 'sensor': 'sensor',
    'tendon': 'tendon', 'fixed': 'tendon', 'spatial': 'tendon',
    'camera': 'camera', 'light': 'light', 'mesh': 'mesh',
    'hfield': 'hfield',
}

# Model arrays use MuJoCo's abbreviated field prefixes
_NS_TO_MODEL_PREFIX = {'joint': 'jnt', 'camera': 'cam'}

# data fields addressed per-body WITHOUT a namespace prefix (MuJoCo's
# own naming: mjData.xpos etc. are body-indexed)
_BODY_DATA_FIELDS = ('xpos', 'xquat', 'xmat', 'xipos', 'ximat', 'cvel',
                     'subtree_com', 'xfrc_applied')
_JOINT_RAGGED_Q = ('qpos',)
_JOINT_RAGGED_V = ('qvel', 'qacc', 'qfrc_applied')
_ACTUATOR_DATA = {'ctrl': 'ctrl', 'force': 'actuator_force'}


def _names_of(elements) -> Sequence[str]:
  if not isinstance(elements, (list, tuple)):
    elements = [elements]
  out = []
  for el in elements:
    if isinstance(el, str):
      out.append(el)
    else:  # dom.Element or raw ET.Element
      get = getattr(el, 'get', None)
      name = get('name') if get else None
      if name is None:
        raise ValueError(f'element {el!r} has no name attribute; only '
                         'named elements can be bound')
      out.append(name)
  return out


def _tag_of(elements) -> str:
  el = elements[0] if isinstance(elements, (list, tuple)) else elements
  return getattr(el, 'tag', None)


class Binding:
  """Name-resolved view over Model/Data rows for one or more elements."""

  def __init__(self, m: Model, elements, d=None, namespace: str = None):
    ns = namespace or _TAG_TO_NS.get(_tag_of(elements))
    if ns is None:
      raise ValueError(
          f'cannot infer namespace for tag {_tag_of(elements)!r}; pass '
          'namespace= explicitly')
    names = _names_of(elements)
    table = m.names.get(ns, {})
    missing = [n for n in names if n not in table]
    if missing:
      raise KeyError(f'no {ns} named {missing} in model '
                     f'(have {sorted(table)[:8]}...)')
    object.__setattr__(self, '_m', m)
    object.__setattr__(self, '_d', d)
    object.__setattr__(self, '_ns', ns)
    object.__setattr__(self, '_names', names)
    object.__setattr__(self, '_ids', np.array([table[n] for n in names]))
    object.__setattr__(self, '_single',
                       not isinstance(elements, (list, tuple)))

  @property
  def element_id(self):
    return int(self._ids[0]) if self._single else self._ids.copy()

  def _rows(self, attr):
    """Row indices into the array backing `attr` (ragged for joints)."""
    m = self._m
    if self._ns == 'joint' and attr in _JOINT_RAGGED_Q + _JOINT_RAGGED_V:
      qpos_axis, qvel_axis = _named._joint_axes(m)
      axis = qpos_axis if attr in _JOINT_RAGGED_Q else qvel_axis
      return np.concatenate([axis.rows(n) for n in self._names])
    if self._ns == 'sensor' and attr == 'sensordata':
      adr = np.asarray(m.sensor_adr, int)
      dim = np.asarray(m.sensor_dim, int)
      return np.concatenate(
          [np.arange(adr[i], adr[i] + dim[i]) for i in self._ids])
    return self._ids

  def _array_for(self, attr):
    """(array, rows, is_model_field) backing `attr`, or None."""
    m, d, ns = self._m, self._d, self._ns
    if d is not None:
      if ns == 'joint' and attr in _JOINT_RAGGED_Q + _JOINT_RAGGED_V:
        return getattr(d, attr), self._rows(attr), False
      if ns == 'actuator' and attr in _ACTUATOR_DATA:
        return getattr(d, _ACTUATOR_DATA[attr]), self._ids, False
      if ns == 'sensor' and attr == 'sensordata':
        return d.sensordata, self._rows(attr), False
      if ns == 'body' and attr in _BODY_DATA_FIELDS:
        return getattr(d, attr), self._ids, False
      if hasattr(d, f'{ns}_{attr}'):
        return getattr(d, f'{ns}_{attr}'), self._ids, False
    field = f'{_NS_TO_MODEL_PREFIX.get(ns, ns)}_{attr}'
    if hasattr(m, field):
      arr = getattr(m, field)
      if d is not None and d.model_var and field in d.model_var:
        arr = d.model_var[field]
      return arr, self._ids, True
    return None

  def __getattr__(self, attr):
    if attr.startswith('_'):
      raise AttributeError(attr)
    hit = self._array_for(attr)
    if hit is None:
      raise AttributeError(
          f'no model or data field for {self._ns}.{attr}')
    arr, rows, _ = hit
    out = np.asarray(arr)[rows]
    if self._single and self._ns == 'joint' and out.shape[:1] == (1,) \
        and attr in _JOINT_RAGGED_Q + _JOINT_RAGGED_V:
      return out[0]
    return out[0] if (self._single and out.shape[0] == 1) else out

  def __setattr__(self, attr, value):
    raise TypeError(
        'bindings over compiled pytrees are immutable; use '
        'binding.update_data(d, {attr}=...) for state or '
        'binding.update_model(d, {attr}=...) for model overrides '
        '(both return a new Data and work inside jit)'.format(attr=attr))

  # -- functional writes ----------------------------------------------------

  def update_data(self, d, **fields):
    """Return a new Data with this binding's rows replaced.

    The jit-compatible analog of ``physics.bind(joints).qpos = v``:
    indices are resolved from names at trace time (static), the write is
    a gather-free scatter via math.safe_set.
    """
    b = Binding(self._m, self._names, d, namespace=self._ns)
    updates = {}
    for attr, value in fields.items():
      hit = b._array_for(attr)
      if hit is None or hit[2]:
        raise AttributeError(f'{self._ns}.{attr} is not a data field; '
                             'use update_model for model fields')
      arr, rows, _ = hit
      # map bound attr back to the Data field name it lives in
      if self._ns == 'joint' and attr in _JOINT_RAGGED_Q:
        fname = 'qpos'
      elif self._ns == 'actuator' and attr in _ACTUATOR_DATA:
        fname = _ACTUATOR_DATA[attr]
      elif self._ns == 'body' and attr in _BODY_DATA_FIELDS:
        fname = attr
      elif self._ns == 'sensor' and attr == 'sensordata':
        fname = 'sensordata'
      elif hasattr(d, f'{self._ns}_{attr}'):
        fname = f'{self._ns}_{attr}'
      else:
        fname = attr
      import jax.numpy as jnp
      base = updates.get(fname, getattr(d, fname))
      target_shape = (len(rows),) + np.shape(base)[1:] if np.ndim(base) > 1 \
          else (len(rows),)
      val = jnp.broadcast_to(jnp.asarray(value, dtype=base.dtype),
                             target_shape)
      updates[fname] = _math.safe_set(base, rows, val)
    return d.replace(**updates)

  def update_model(self, d, **fields):
    """Return a Data whose model_var overlay shadows this binding's
    Model rows — the in-graph replacement for mutating mjModel
    (reference mjcf/physics.py writes model fields in place)."""
    mv = dict(d.model_var or {})
    for attr, value in fields.items():
      field = f'{_NS_TO_MODEL_PREFIX.get(self._ns, self._ns)}_{attr}'
      if not hasattr(self._m, field):
        raise AttributeError(f'no model field {field}')
      base = mv.get(field, getattr(self._m, field))
      import jax.numpy as jnp
      base = jnp.asarray(base)
      val = np.broadcast_to(np.asarray(value), base[self._ids].shape)
      mv[field] = _math.safe_set(base, self._ids, val)
    return d.replace(model_var=mv)

  def __repr__(self):
    return (f'Binding({self._ns}: {self._names}'
            f'{", +data" if self._d is not None else ""})')


def bind(m: Model, elements, d=None, namespace: Optional[str] = None
         ) -> Binding:
  """Bind MJCF element(s) (dom.Element, ET.Element, or name strings) to
  their compiled Model/Data rows.  See module docstring for semantics."""
  return Binding(m, elements, d, namespace=namespace)
