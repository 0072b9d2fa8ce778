"""Named indexing: string-addressed views over Data/Model arrays.

The runtime analog of the reference's `physics.named.data.qpos['hinge']`
(dm_control/mujoco/index.py:269-590): per-field axis indexers built from
the compiled Model's name tables, including the ragged axes (qpos/qvel
address ranges per joint, sensordata address ranges per sensor).  Reads
return host numpy arrays; this is an ergonomics layer for task authoring
and debugging — jitted task code uses precomputed index constants.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Union

import numpy as np

from dm_control_tpu._src.types import (JOINT_NQ, JOINT_NV, JointType,
                                       Model)

_XYZ = ['x', 'y', 'z']
_QUAT = ['qw', 'qx', 'qy', 'qz']
_MAT = ['xx', 'xy', 'xz', 'yx', 'yy', 'yz', 'zx', 'zy', 'zz']
_RGBA = ['r', 'g', 'b', 'a']


class Axis:
  """Regular named axis: one row per named object."""

  def __init__(self, names: Dict[str, int]):
    self._names = dict(names)

  def rows(self, key) -> np.ndarray:
    if isinstance(key, str):
      return np.array([self._names[key]])
    if isinstance(key, (list, tuple)) and key and isinstance(key[0], str):
      return np.array([self._names[k] for k in key])
    return np.atleast_1d(np.arange(len(self._names))[key])

  @property
  def names(self) -> List[str]:
    inv = {v: k for k, v in self._names.items()}
    return [inv.get(i, str(i)) for i in range(len(self._names))]


class RaggedAxis(Axis):
  """Axis whose named objects span address RANGES (qpos/qvel/sensordata:
  reference index.py:100-105, 382-440)."""

  def __init__(self, names: Dict[str, int], adr: np.ndarray,
               length: np.ndarray, size: int):
    super().__init__(names)
    self._adr = adr
    self._len = length
    self._size = size

  def rows(self, key) -> np.ndarray:
    if isinstance(key, str):
      i = self._names[key]
      return np.arange(self._adr[i], self._adr[i] + self._len[i])
    if isinstance(key, (list, tuple)) and key and isinstance(key[0], str):
      return np.concatenate([self.rows(k) for k in key])
    return np.atleast_1d(np.arange(self._size)[key])


class FieldIndexer:
  """numpy-like view: fi['name'], fi[['a','b']], fi['name','x'],
  read/write (reference index.py:442-517)."""

  def __init__(self, array, axis: Axis, columns: Sequence[str] = None):
    self._array = array
    self._axis = axis
    self._cols = list(columns) if columns else None

  def _col_idx(self, key):
    if isinstance(key, str):
      return self._cols.index(key)
    if isinstance(key, (list, tuple)) and key and isinstance(key[0], str):
      return [self._cols.index(k) for k in key]
    return key

  def _resolve(self, key):
    if isinstance(key, tuple) and len(key) == 2:
      rows = self._axis.rows(key[0])
      return np.ix_(rows, np.atleast_1d(self._col_idx(key[1]))) \
          if np.ndim(self._array) > 1 else (rows,)
    rows = self._axis.rows(key)
    return (rows,)

  def __getitem__(self, key):
    out = np.asarray(self._array)[self._resolve(key)]
    if isinstance(key, str) and out.shape[0] == 1:
      return out[0]
    if isinstance(key, tuple):
      return np.squeeze(out)
    return out

  def __setitem__(self, key, value):
    arr = np.asarray(self._array)
    if arr is not self._array and not isinstance(self._array, np.ndarray):
      raise TypeError(
          'named views over jax arrays are read-only; use Data.replace '
          'with index constants inside jit')
    self._array[self._resolve(key)] = value

  def __repr__(self):
    return f'FieldIndexer(rows={self._axis.names[:8]}...)'


class _StructView:
  def __init__(self, fields: Dict[str, FieldIndexer]):
    self._fields = fields

  def __getattr__(self, name):
    try:
      return self._fields[name]
    except KeyError:
      raise AttributeError(name)


def _joint_axes(m: Model):
  jnames = m.names.get('joint', {})
  q_adr = np.array([int(m.jnt_qposadr[j]) for j in range(m.njnt)])
  q_len = np.array([JOINT_NQ[JointType(int(m.jnt_type[j]))]
                    for j in range(m.njnt)])
  v_adr = np.array([int(m.jnt_dofadr[j]) for j in range(m.njnt)])
  v_len = np.array([JOINT_NV[JointType(int(m.jnt_type[j]))]
                    for j in range(m.njnt)])
  qpos_axis = RaggedAxis(jnames, q_adr, q_len, m.nq)
  qvel_axis = RaggedAxis(jnames, v_adr, v_len, m.nv)
  return qpos_axis, qvel_axis


def named_data(m: Model, d) -> _StructView:
  """String-indexed views over a Data pytree (host-side reads)."""
  qpos_axis, qvel_axis = _joint_axes(m)
  body = Axis(m.names.get('body', {}))
  geom = Axis(m.names.get('geom', {}))
  site = Axis(m.names.get('site', {}))
  act = Axis(m.names.get('actuator', {}))
  snames = m.names.get('sensor', {})
  sens_axis = RaggedAxis(
      snames, np.asarray(m.sensor_adr, int),
      np.asarray(m.sensor_dim, int), m.nsensordata)
  fields = {
      'qpos': FieldIndexer(d.qpos, qpos_axis),
      'qvel': FieldIndexer(d.qvel, qvel_axis),
      'qacc': FieldIndexer(d.qacc, qvel_axis),
      'qfrc_applied': FieldIndexer(d.qfrc_applied, qvel_axis),
      'xpos': FieldIndexer(d.xpos, body, _XYZ),
      'xquat': FieldIndexer(d.xquat, body, _QUAT),
      'xmat': FieldIndexer(np.asarray(d.xmat).reshape(m.nbody, 9),
                           body, _MAT),
      'xipos': FieldIndexer(d.xipos, body, _XYZ),
      'geom_xpos': FieldIndexer(d.geom_xpos, geom, _XYZ),
      'site_xpos': FieldIndexer(d.site_xpos, site, _XYZ),
      'sensordata': FieldIndexer(d.sensordata, sens_axis),
      'ctrl': FieldIndexer(d.ctrl, act),
      'actuator_force': FieldIndexer(d.actuator_force, act),
  }
  return _StructView(fields)


def named_model(m: Model) -> _StructView:
  """String-indexed views over (mutable numpy) Model arrays."""
  body = Axis(m.names.get('body', {}))
  geom = Axis(m.names.get('geom', {}))
  site = Axis(m.names.get('site', {}))
  jnt = Axis(m.names.get('joint', {}))
  act = Axis(m.names.get('actuator', {}))
  fields = {
      'body_pos': FieldIndexer(m.body_pos, body, _XYZ),
      'body_quat': FieldIndexer(m.body_quat, body, _QUAT),
      'body_mass': FieldIndexer(m.body_mass, body),
      'geom_pos': FieldIndexer(m.geom_pos, geom, _XYZ),
      'geom_size': FieldIndexer(m.geom_size, geom, _XYZ),
      'geom_rgba': FieldIndexer(m.geom_rgba, geom, _RGBA),
      'site_pos': FieldIndexer(m.site_pos, site, _XYZ),
      'site_size': FieldIndexer(m.site_size, site, _XYZ),
      'jnt_range': FieldIndexer(m.jnt_range, jnt, ['min', 'max']),
      'jnt_stiffness': FieldIndexer(m.jnt_stiffness, jnt),
      'actuator_ctrlrange': FieldIndexer(m.actuator_ctrlrange, act,
                                         ['min', 'max']),
      'actuator_gear': FieldIndexer(m.actuator_gear, act),
  }
  return _StructView(fields)


class Named:
  """`named.data` / `named.model` accessor bundle."""

  def __init__(self, m: Model, d=None):
    self.model = named_model(m)
    if d is not None:
      self.data = named_data(m, d)
