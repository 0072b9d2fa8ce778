"""HDF5 mocap trajectory ingestion with the reference loader's surface.

Reads the reference's HDF5 trajectory format — the exact layout of
`dm_control/locomotion/mocap/test_trajectories.h5` — directly into
numpy, skipping the reference's HDF5 -> protobuf -> numpy round-trip
(loader.py:86-170 rebuilds a `FittedTrajectory` proto field-by-field
only for `Trajectory.as_dict` to convert it straight back to arrays,
trajectory.py:90-148).  Semantics are lockstep-tested against the pip
`dm_control` reference loader on that fixture
(tests/test_mocap_hdf5.py).

Layout per clip group (loader.py:118-170):

  <key>/                     attrs: dt, num_steps, (date fields)
    walkers/walker_<i>/      attrs: name, model, mass, ...
      <field> (D, T) float64 for each WalkerPose field
      scaling/subtree_<j>/   attrs only
      markers/marker_<j>/    attrs only
    props/prop_<i>/          attrs: name, shape, size, mass
      <field> (D, T) float64 for each PropPose field

Field arrays are stored feature-major (D, T); the reference (and this
module) exposes them time-major (T, D), with the grouped position /
quaternion tracks reshaped to (T, n, 3) / (T, n, 4)
(trajectory.py:35-36, 105-111).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

# WalkerPose / PropPose field names (mocap.proto); order irrelevant,
# membership drives which datasets are read.
WALKER_FIELDS = (
    'position', 'quaternion', 'joints', 'center_of_mass', 'end_effectors',
    'velocity', 'angular_velocity', 'joints_velocity', 'appendages',
    'body_positions', 'body_quaternions')
PROP_FIELDS = ('position', 'quaternion', 'velocity', 'angular_velocity')

_REPEATED_POSITION_FIELDS = ('end_effectors', 'appendages', 'body_positions')
_REPEATED_QUATERNION_FIELDS = ('body_quaternions',)
_WALKER_VELOCITY_FIELDS = ('velocity', 'angular_velocity', 'joints_velocity')
_PROP_VELOCITY_FIELDS = ('velocity', 'angular_velocity')

STEP_TIME_TOLERANCE = 1e-4


@dataclasses.dataclass(frozen=True)
class MocapTrajectory:
  """A loaded clip subset: time-major field arrays + metadata.

  `walkers[i]` / `props[i]` map field name -> (T, ...) array over the
  FULL underlying clip; the public accessors apply the
  [start_step:end_step] window the way the reference `Trajectory` does
  (trajectory.py:131-132)."""
  identifier: str
  dt: float
  walkers: Tuple[Dict[str, np.ndarray], ...]
  props: Tuple[Dict[str, np.ndarray], ...]
  walker_meta: Tuple[Dict[str, object], ...]
  prop_meta: Tuple[Dict[str, object], ...]
  start_step: int
  end_step: int
  zero_out_velocities: bool = True

  @property
  def num_steps(self) -> int:
    return self.end_step - self.start_step

  @property
  def start_time(self) -> float:
    return self.start_step * self.dt

  @property
  def end_time(self) -> float:
    return (self.end_step - 1) * self.dt

  @property
  def duration(self) -> float:
    return self.end_time - self.start_time

  def as_dict(self) -> Dict[str, np.ndarray]:
    """Reference `Trajectory.as_dict` (trajectory.py:90-132): keys
    'walker/<field>' ('walker_<i>/...' when multiple), grouped tracks
    reshaped, all arrays windowed to [start_step:end_step].  Like the
    reference, this does NOT zero the final step's velocities (only
    `get_timestep_data` sees the zeroed last step)."""
    out = {}
    for i, fields in enumerate(self.walkers):
      prefix = f'walker_{i}/' if len(self.walkers) > 1 else 'walker/'
      for name, arr in fields.items():
        out[prefix + name] = arr[self.start_step:self.end_step]
    # the reference keys props by the WALKER count (trajectory.py:115, a
    # quirk); keyed here on the prop count — identical for the shipped
    # fixtures (1 walker, 1 prop) and correct for multi-prop clips
    for i, fields in enumerate(self.props):
      prefix = f'prop_{i}/' if len(self.props) > 1 else 'prop/'
      for name, arr in fields.items():
        out[prefix + name] = arr[self.start_step:self.end_step]
    return out

  def _quantized(self, time: float) -> int:
    if time == float('inf'):
      return self._full_len - 1
    divided = time / self.dt
    q = int(np.round(divided))
    if abs(q - divided) > STEP_TIME_TOLERANCE:
      raise ValueError(f'`time` should be a multiple of dt={self.dt}: '
                       f'got {time}')
    return q

  @property
  def _full_len(self) -> int:
    return self.walkers[0]['position'].shape[0] if self.walkers else (
        self.props[0]['position'].shape[0])

  def get_step_id(self, time: float) -> int:
    """Reference `_get_step_id` (trajectory.py:161-164)."""
    return int(np.clip(self._quantized(time) + self.start_step,
                       self.start_step, self.end_step - 1))

  def get_timestep_data(self, time: float) -> Dict[str, np.ndarray]:
    """Per-entity field dict at the quantized time; the final step of
    the window has its velocity fields zeroed when zero_out_velocities
    (trajectory.py:39-48, 218-226, 261-266)."""
    sid = self.get_step_id(time)
    zero = self.zero_out_velocities and sid == self.end_step - 1
    out = {}
    for i, fields in enumerate(self.walkers):
      prefix = f'walker_{i}/' if len(self.walkers) > 1 else 'walker/'
      for name, arr in fields.items():
        v = arr[sid]
        if zero and name in _WALKER_VELOCITY_FIELDS:
          v = np.zeros_like(v)
        out[prefix + name] = v
    for i, fields in enumerate(self.props):
      prefix = f'prop_{i}/' if len(self.props) > 1 else 'prop/'
      for name, arr in fields.items():
        v = arr[sid]
        if zero and name in _PROP_VELOCITY_FIELDS:
          v = np.zeros_like(v)
        out[prefix + name] = v
    return out

  def to_qpos_trajectory(self, walker: int = 0):
    """-> mocap.Trajectory (qpos/qvel per frame) for the tracking stack.

    Free-root mapping: qpos = [position(3), quaternion(4), joints],
    qvel = [velocity(3), angular_velocity(3), joints_velocity] — the
    composer walker's set_pose/set_velocity convention the reference
    uses to replay these clips (trajectory.py:268-274,
    composer/entity.py free-joint qpos/qvel layout)."""
    from dm_control_tpu.locomotion import mocap as _mocap
    w = self.walkers[walker]
    s, e = self.start_step, self.end_step
    qpos = np.concatenate(
        [w['position'][s:e], w['quaternion'][s:e], w['joints'][s:e]],
        axis=1)
    qvel = np.concatenate(
        [w['velocity'][s:e], w['angular_velocity'][s:e],
         w['joints_velocity'][s:e]], axis=1)
    if self.zero_out_velocities and e - s > 0:
      qvel = qvel.copy()
      qvel[-1] = 0.0
    return _mocap.Trajectory(dt=self.dt, qpos=qpos, qvel=qvel)


def _read_entity(group, fields) -> Tuple[Dict[str, np.ndarray],
                                         Dict[str, object]]:
  data = {}
  for name in fields:
    if name in group:
      data[name] = np.asarray(group[name]).T  # (D, T) -> (T, D)
  meta = {}
  for k, v in group.attrs.items():
    meta[k] = v.decode() if isinstance(v, bytes) else v
  return data, meta


def _reshape_grouped(fields: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
  out = {}
  for name, arr in fields.items():
    if name in _REPEATED_POSITION_FIELDS:
      arr = arr.reshape(arr.shape[0], -1, 3)
    elif name in _REPEATED_QUATERNION_FIELDS:
      arr = arr.reshape(arr.shape[0], -1, 4)
    out[name] = arr
  return out


class HDF5TrajectoryLoader:
  """Loads clips from a reference-format HDF5 file
  (loader.py:86-170 semantics; direct numpy, no proto round-trip)."""

  def __init__(self, path: str, proto_modifier=()):
    import h5py
    self._file = h5py.File(path, mode='r')
    self._keys = tuple(sorted(self._file.keys()))
    if callable(proto_modifier):
      proto_modifier = (proto_modifier,)
    for mod in proto_modifier:
      if not callable(mod):
        raise ValueError(f'{mod} is not callable')
    self._modifiers = tuple(proto_modifier)

  def keys(self) -> Tuple[str, ...]:
    return self._keys

  def get_trajectory(self, key: str, start_time: Optional[float] = None,
                     end_time: Optional[float] = None,
                     start_step: Optional[int] = None,
                     end_step: Optional[int] = None,
                     zero_out_velocities: bool = True) -> MocapTrajectory:
    """Reference `TrajectoryLoader.get_trajectory` + `Trajectory`
    windowing semantics (loader.py:74-83, trajectory.py:77-85,
    183-226): steps and times are mutually exclusive; the window is
    clipped to the clip length; end is inclusive-of-quantized-time
    (end_step = 1 + clip(quantized))."""
    if isinstance(key, bytes):
      key = key.decode()
    if (start_time and start_step) or (end_time and end_step):
      raise ValueError('specify either times or steps, not both')
    g = self._file[key]
    dt = float(g.attrs['dt'])
    num_steps = int(g.attrs['num_steps'])

    walkers, wmeta, props, pmeta = [], [], [], []
    wg = g['walkers'] if 'walkers' in g else {}
    for i in range(len(wg)):
      data, meta = _read_entity(wg[f'walker_{i}'], WALKER_FIELDS)
      walkers.append(_reshape_grouped(data))
      wmeta.append(meta)
    pg = g['props'] if 'props' in g else {}
    for i in range(len(pg)):
      data, meta = _read_entity(pg[f'prop_{i}'], PROP_FIELDS)
      props.append(data)
      pmeta.append(meta)

    for mod in self._modifiers:
      mod(walkers, props, pmeta)

    if start_step:
      start_time = start_step * dt
    if end_step:
      end_time = end_step * dt

    def quantize(time):
      if time == float('inf'):
        return num_steps - 1
      divided = time / dt
      q = int(np.round(divided))
      if abs(q - divided) > STEP_TIME_TOLERANCE:
        raise ValueError(f'`time` should be a multiple of dt={dt}')
      return q

    # truthiness (not `is None`) matches the reference exactly
    # (trajectory.py:84-85): start_time/end_time of 0 fall back to the
    # clip bounds there too
    s = int(np.clip(quantize(start_time or 0.0), 0, num_steps - 1))
    e = 1 + int(np.clip(quantize(end_time or (num_steps * dt)),
                        0, num_steps - 1))
    return MocapTrajectory(
        identifier=key, dt=dt, walkers=tuple(walkers), props=tuple(props),
        walker_meta=tuple(wmeta), prop_meta=tuple(pmeta),
        start_step=s, end_step=e, zero_out_velocities=zero_out_velocities)


def load_collection(path: str, m, keys: Optional[Sequence[str]] = None,
                    walker: int = 0):
  """All (or selected) clips of an HDF5 file -> padded
  `mocap.ClipCollection` with engine-FK features, ready for
  `tracking.MultiClipMocapTracking` (the role of the reference's
  loader + reference_pose/utils feature extraction)."""
  from dm_control_tpu.locomotion import mocap as _mocap
  loader = HDF5TrajectoryLoader(path)
  clips = [loader.get_trajectory(k).to_qpos_trajectory(walker)
           for k in (keys or loader.keys())]
  return _mocap.build_features(m, clips)
