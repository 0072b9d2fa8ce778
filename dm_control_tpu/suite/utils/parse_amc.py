"""Parse and convert CMU .amc motion-capture data to qpos trajectories
(reference: dm_control/suite/utils/parse_amc.py:51-208).

Converts each frame's joint angles through the CMU joint-order map into
the humanoid_CMU qpos layout, spline-resamples to the physics timestep,
and differentiates for qvel (slerp-consistent finite differences on the
root quaternion)."""

from __future__ import annotations

import collections

import numpy as np
from scipy import interpolate

from dm_control_tpu._src import named as named_lib

MOCAP_DT = 1.0 / 120.0
CONVERSION_LENGTH = 0.056444

_CMU_MOCAP_JOINT_ORDER = (
    'root0', 'root1', 'root2', 'root3', 'root4', 'root5', 'lowerbackrx',
    'lowerbackry', 'lowerbackrz', 'upperbackrx', 'upperbackry',
    'upperbackrz', 'thoraxrx', 'thoraxry', 'thoraxrz', 'lowerneckrx',
    'lowerneckry', 'lowerneckrz', 'upperneckrx', 'upperneckry',
    'upperneckrz', 'headrx', 'headry', 'headrz', 'rclaviclery',
    'rclaviclerz', 'rhumerusrx', 'rhumerusry', 'rhumerusrz', 'rradiusrx',
    'rwristry', 'rhandrx', 'rhandrz', 'rfingersrx', 'rthumbrx', 'rthumbrz',
    'lclaviclery', 'lclaviclerz', 'lhumerusrx', 'lhumerusry', 'lhumerusrz',
    'lradiusrx', 'lwristry', 'lhandrx', 'lhandrz', 'lfingersrx', 'lthumbrx',
    'lthumbrz', 'rfemurrx', 'rfemurry', 'rfemurrz', 'rtibiarx', 'rfootrx',
    'rfootrz', 'rtoesrx', 'lfemurrx', 'lfemurry', 'lfemurrz', 'ltibiarx',
    'lfootrx', 'lfootrz', 'ltoesrx')

Converted = collections.namedtuple('Converted', ['qpos', 'qvel', 'time'])


def _euler2quat(ax, ay, az):
  """Degrees, intrinsic z-y-x composition (matches the reference's
  mjmath.euler2quat)."""
  r1, r2, r3 = np.deg2rad([az, ay, ax])
  c1, s1 = np.cos(r1 / 2), np.sin(r1 / 2)
  c2, s2 = np.cos(r2 / 2), np.sin(r2 / 2)
  c3, s3 = np.cos(r3 / 2), np.sin(r3 / 2)
  return np.array([
      c1 * c2 * c3 + s1 * s2 * s3,
      c1 * c2 * s3 - s1 * s2 * c3,
      c1 * s2 * c3 + s1 * c2 * s3,
      s1 * c2 * c3 - c1 * s2 * s3])


def _quatprod(q, p):
  w1, x1, y1, z1 = q
  w2, x2, y2, z2 = p
  return np.array([
      w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
      w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
      w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
      w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])


def _quat2vel(q, dt):
  axis = q[1:]
  sin_a_2 = np.linalg.norm(axis)
  if sin_a_2 < 1e-12:
    return np.zeros(3)
  speed = 2 * np.arctan2(sin_a_2, q[0]) / dt
  return speed * axis / sin_a_2


def _quatdiff(q, p):
  qneg = q * np.array([1.0, -1, -1, -1])
  return _quatprod(qneg / np.sum(q * q), p)


def parse(file_name):
  """Parse the .amc text format into per-frame value arrays."""
  values = []
  with open(file_name) as fid:
    lines = [ln.strip() for ln in fid]
  i = 0
  frame_ind = 1
  while i < len(lines):
    if lines[i] == str(frame_ind):
      frame_ind += 1
      i += 1
      vals = []
      while i < len(lines) and lines[i] != str(frame_ind):
        toks = lines[i].split()
        if not toks:
          break
        vals.extend(float(x) for x in toks[1:])
        i += 1
      values.append(np.asarray(vals, np.float64))
    else:
      i += 1
  return values


class Amcvals2qpos:
  """Converts one .amc frame to the humanoid_CMU qpos layout."""

  def __init__(self, index2joint, joint_order):
    self.root_xyz_transform = np.array(
        [[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float64) * CONVERSION_LENGTH
    n = len(index2joint)
    t = np.zeros((n, len(joint_order)))
    for i in range(n):
      for j, joint in enumerate(joint_order):
        if index2joint[i] == joint and joint[-2:] in ('rx', 'ry', 'rz'):
          t[i][j] = 1
    self.amc2qpos_transform = t

  def __call__(self, amc_val):
    qpos = self.amc2qpos_transform @ np.deg2rad(amc_val)
    qpos[:3] = self.root_xyz_transform @ amc_val[:3]
    quat = _quatprod(_euler2quat(90, 0, 0),
                     _euler2quat(amc_val[3], amc_val[4], amc_val[5]))
    qpos[3:7] = quat
    return qpos


def _index2joint(m):
  qpos_axis, _ = named_lib._joint_axes(m)
  out = {}
  for name in qpos_axis.names:
    for idx in qpos_axis.rows(name):
      out[int(idx)] = name
  return out


def convert(file_name, m, timestep):
  """(.amc path, compiled humanoid_CMU Model, output dt) -> Converted."""
  frame_values = parse(file_name)
  transformer = Amcvals2qpos(_index2joint(m), _CMU_MOCAP_JOINT_ORDER)
  qpos_values = np.stack([transformer(f) for f in frame_values])

  time_vals = np.arange(0, len(frame_values) * MOCAP_DT - 1e-8, MOCAP_DT)
  time_new = np.arange(0, len(frame_values) * MOCAP_DT, timestep)
  while time_new[-1] > time_vals[-1]:
    time_new = time_new[:-1]
  resampled = np.stack([
      interpolate.splev(time_new, interpolate.splrep(time_vals,
                                                     qpos_values[:, i]))
      for i in range(qpos_values.shape[1])])

  qvel_list = []
  for t in range(resampled.shape[1] - 1):
    p_t, p_tp1 = resampled[:, t], resampled[:, t + 1]
    qvel_list.append(np.concatenate([
        (p_tp1[:3] - p_t[:3]) / timestep,
        _quat2vel(_quatdiff(p_t[3:7], p_tp1[3:7]), timestep),
        (p_tp1[7:] - p_t[7:]) / timestep]))
  return Converted(resampled, np.vstack(qvel_list).T, time_new)
