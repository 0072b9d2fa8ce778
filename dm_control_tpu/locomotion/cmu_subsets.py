"""Named CMU mocap clip subsets + an offline clip catalog.

Reference: locomotion/tasks/reference_pose/cmu_subsets.py:1-1289, which
names subsets of the public CMU motion-capture database by clip id
('CMU_016_22', ...).  The id tuples here (GET_UP, WALK_TINY,
RUN_JUMP_TINY) are the reference's — they are database keys, not code.

The reference resolves ids against downloaded HDF5 clip files
(mocap/loader.py:38-231).  This environment has no network access and
no CMU download, so the catalog resolves each id as:

  1. `<clip_dir>/<id>.amc` — a real CMU export dropped next to the
     catalog (the production path; exercised in tests via the vendored
     `zeros.amc` reshaped under a CMU id).
  2. Otherwise a SYNTHESIZED stand-in clip: a deterministic passive
     physics rollout of the CMU walker itself, seeded by the clip id.
     Any engine rollout is a perfectly trackable reference trajectory,
     so the tracking task, multi-clip batching, and reward channels are
     exercised end-to-end with realistic (contact-rich, 56-DoF)
     motion — but the MOTIONS are not the CMU database's.  Swap in
     real .amc files to track the actual dataset.
"""

from __future__ import annotations

import functools
import hashlib
import os
from typing import Optional, Sequence

import jax
import numpy as np

from dm_control_tpu.locomotion import mocap

GET_UP = ('CMU_139_16', 'CMU_139_17', 'CMU_139_18', 'CMU_140_01',
          'CMU_140_02', 'CMU_140_08', 'CMU_140_09')

# ~5 minutes of walking behaviors (reference cmu_subsets.py:352-388)
WALK_TINY = (
    'CMU_016_22', 'CMU_016_23', 'CMU_016_24', 'CMU_016_25', 'CMU_016_26',
    'CMU_016_27', 'CMU_016_28', 'CMU_016_29', 'CMU_016_30', 'CMU_016_31',
    'CMU_016_32', 'CMU_016_33', 'CMU_016_34', 'CMU_016_47', 'CMU_016_58',
    'CMU_047_01', 'CMU_056_01', 'CMU_069_01', 'CMU_069_02', 'CMU_069_03',
    'CMU_069_04', 'CMU_069_05', 'CMU_069_20', 'CMU_069_21', 'CMU_069_22',
    'CMU_069_23', 'CMU_069_24', 'CMU_069_25', 'CMU_069_26', 'CMU_069_27',
    'CMU_069_28', 'CMU_069_29', 'CMU_069_30', 'CMU_069_31', 'CMU_069_32',
    'CMU_069_33')

# ~2 minutes of walking/running/jumping (reference cmu_subsets.py:391-441)
RUN_JUMP_TINY = (
    'CMU_009_01', 'CMU_009_02', 'CMU_009_03', 'CMU_009_04', 'CMU_009_05',
    'CMU_009_06', 'CMU_009_07', 'CMU_009_08', 'CMU_009_09', 'CMU_009_10',
    'CMU_009_11', 'CMU_016_22', 'CMU_016_23', 'CMU_016_24', 'CMU_016_25',
    'CMU_016_26', 'CMU_016_27', 'CMU_016_28', 'CMU_016_29', 'CMU_016_30',
    'CMU_016_31', 'CMU_016_32', 'CMU_016_47', 'CMU_016_48', 'CMU_016_49',
    'CMU_016_50', 'CMU_016_55', 'CMU_016_58', 'CMU_049_04', 'CMU_049_05',
    'CMU_069_01', 'CMU_069_02', 'CMU_069_03', 'CMU_069_04', 'CMU_069_05',
    'CMU_075_01', 'CMU_075_02', 'CMU_075_03', 'CMU_075_10', 'CMU_075_11',
    'CMU_127_03', 'CMU_127_06', 'CMU_127_07', 'CMU_127_08', 'CMU_127_09',
    'CMU_127_10', 'CMU_127_11', 'CMU_127_12', 'CMU_128_02', 'CMU_128_03')

# the id namespace available offline (the reference's ALL lists the full
# database; here it is the union of the vendored subsets)
ALL = tuple(sorted(set(GET_UP) | set(WALK_TINY) | set(RUN_JUMP_TINY)))

SUBSETS = {
    'get_up': GET_UP,
    'walk_tiny': WALK_TINY,
    'run_jump_tiny': RUN_JUMP_TINY,
    'all': ALL,
}


@functools.lru_cache(maxsize=1)
def _cmu_model():
  from dm_control_tpu._src import engine
  from dm_control_tpu.suite import common
  return engine.load_model(common.model_path('humanoid_CMU.xml'))


def v2019_walker_root():
  """The V2019 CMU walker (the exact skeleton the reference's mocap
  HDF5 clips are fitted to — locomotion/walkers/assets/
  humanoid_CMU_V2019.xml) as a standalone model: attach-time freejoint
  on the root body plus a floor plane, the composer walker's compiled
  form.  The suite's humanoid_CMU.xml is a ROUNDED variant whose FK
  drifts ~2.6 cm from the fitted tracks; this one reproduces them to
  ~2e-7 (tests/test_mocap_hdf5.py)."""
  import xml.etree.ElementTree as ET
  from dm_control_tpu.mjcf.compiler import _load_xml
  from dm_control_tpu.suite import common
  root = _load_xml(common.model_path('humanoid_CMU_V2019.xml'))
  wb = root.find('worldbody')
  body = wb.find("body[@name='root']")
  body.insert(0, ET.Element('freejoint', dict(name='root')))
  wb.insert(0, ET.Element('geom', dict(
      name='floor', type='plane', size='100 100 .2', conaffinity='1')))
  return root


@functools.lru_cache(maxsize=1)
def _cmu_v2019_model():
  from dm_control_tpu._src import setconst
  from dm_control_tpu.mjcf.compiler import MJCFCompiler
  return setconst.set_const(MJCFCompiler(v2019_walker_root()).build())


def _synthesize_clip(m, clip_id: str, n_frames: int, dt: float
                     ) -> mocap.Trajectory:
  """Deterministic passive rollout seeded by the clip id (stand-in for
  the CMU download; see module docstring)."""
  from dm_control_tpu._src import forward as fwd
  seed = int(hashlib.sha256(clip_id.encode()).hexdigest()[:8], 16)
  key = jax.random.PRNGKey(seed)
  k1, k2 = jax.random.split(key)
  d = fwd.make_data(m)
  qpos = d.qpos
  # stand the walker up and jitter the joints so each id is a distinct
  # contact-rich falling/settling motion
  qpos = qpos.at[2].set(1.3)
  qpos = qpos.at[7:].add(
      0.12 * jax.random.normal(k1, (m.nq - 7,), qpos.dtype))
  qvel = d.qvel.at[:].add(
      0.2 * jax.random.normal(k2, (m.nv,), d.qvel.dtype))
  d = fwd.forward(m, d.replace(qpos=qpos, qvel=qvel))
  every = max(1, int(round(dt / float(m.opt.timestep))))
  return mocap.from_rollout(m, d, n_frames, every=every)


def load_catalog(ids: Sequence[str], clip_dir: Optional[str] = None,
                 dt: float = 0.02, n_frames: int = 40,
                 m=None) -> mocap.ClipCollection:
  """Resolve clip ids to a padded ClipCollection (the role of the
  reference's mocap loader, loader.py:38-231)."""
  m = m or _cmu_model()
  clips = []
  for clip_id in ids:
    traj = None
    if clip_dir:
      for ext in ('.amc', '.npz'):
        path = os.path.join(clip_dir, clip_id + ext)
        if os.path.exists(path):
          if ext == '.amc':
            traj = mocap.from_amc(path, m, dt)
          else:
            z = np.load(path)
            traj = mocap.Trajectory(dt=dt, qpos=z['qpos'], qvel=z['qvel'])
          break
    if traj is None:
      traj = _synthesize_clip(m, clip_id, n_frames, dt)
    clips.append(traj)
  return mocap.build_features(m, clips)


def load_tracking(subset: str = 'walk_tiny', clip_dir: Optional[str] = None,
                  max_clips: Optional[int] = None, dt: float = 0.02,
                  n_frames: int = 40, time_limit: float = 30.0,
                  random=None, batch_size=None, **task_kwargs):
  """Batched MultiClipMocapTracking over a named CMU subset with the
  CMU humanoid walker (the reference's flagship tracking setup)."""
  from dm_control_tpu.locomotion import tracking
  from dm_control_tpu.mjcf.compiler import _load_xml
  from dm_control_tpu.suite import common
  ids = SUBSETS[subset]
  if max_clips:
    ids = ids[:max_clips]
  coll = load_catalog(ids, clip_dir=clip_dir, dt=dt, n_frames=n_frames)
  walker_root = _load_xml(common.model_path('humanoid_CMU.xml'))
  return tracking.load(walker_root, coll, time_limit=time_limit,
                       random=random, batch_size=batch_size, **task_kwargs)
