"""HDF5 mocap ingestion vs the reference loader (VERDICT r4 item 4).

Lockstep battery: `mocap_hdf5.HDF5TrajectoryLoader` is compared
field-for-field against the pip `dm_control` reference loader
(`locomotion/mocap/loader.py:86-170` + `trajectory.py:90-148`) on the
reference tree's own fixture `test_trajectories.h5`, then the decoded
clips are validated against the engine's forward kinematics and fed
through MultiClipMocapTracking with the CMU walker.
"""

import numpy as np
import pytest

from dm_control_tpu.locomotion import mocap, mocap_hdf5

H5 = '/root/reference/dm_control/locomotion/mocap/test_trajectories.h5'


@pytest.fixture(scope='module')
def loaders():
  from dm_control.locomotion.mocap import loader as ref_loader
  return (ref_loader.HDF5TrajectoryLoader(H5),
          mocap_hdf5.HDF5TrajectoryLoader(H5))


def test_keys_match_reference(loaders):
  ref, ours = loaders
  ref_keys = tuple(k.decode() if isinstance(k, bytes) else k
                   for k in ref.keys())
  assert ours.keys() == ref_keys == ('cmuv2019_001', 'cmuv2019_002')


def test_full_clip_as_dict_lockstep(loaders):
  ref, ours = loaders
  for key in ours.keys():
    rt, ot = ref.get_trajectory(key), ours.get_trajectory(key)
    assert rt.dt == ot.dt
    assert rt.num_steps == ot.num_steps
    rd, od = rt.as_dict(), ot.as_dict()
    assert set(rd) == set(od)
    for k in rd:
      np.testing.assert_array_equal(rd[k], od[k], err_msg=k)


@pytest.mark.parametrize('window', [
    dict(start_step=2, end_step=8),
    dict(start_step=5),
    dict(end_step=4),
    dict(start_time=0.1, end_time=0.35),
    dict(start_time=0.2),
])
def test_windowed_as_dict_lockstep(loaders, window):
  ref, ours = loaders
  rt = ref.get_trajectory('cmuv2019_001', **window)
  ot = ours.get_trajectory('cmuv2019_001', **window)
  assert rt.num_steps == ot.num_steps
  assert rt.start_time == ot.start_time
  assert rt.end_time == ot.end_time
  rd, od = rt.as_dict(), ot.as_dict()
  for k in rd:
    np.testing.assert_array_equal(rd[k], od[k], err_msg=k)


def test_non_multiple_time_raises(loaders):
  _, ours = loaders
  with pytest.raises(ValueError, match='multiple of dt'):
    ours.get_trajectory('cmuv2019_001', start_time=0.033)


def test_timestep_data_zeroes_final_velocities(loaders):
  ref, ours = loaders
  ot = ours.get_trajectory('cmuv2019_001')
  last = ot.get_timestep_data(float('inf'))
  assert np.all(last['walker/velocity'] == 0)
  assert np.all(last['walker/joints_velocity'] == 0)
  assert np.all(last['prop/velocity'] == 0)
  # non-final steps keep their velocities, same values as the reference
  mid = ot.get_timestep_data(0.1)
  rt = ref.get_trajectory('cmuv2019_001')
  ref_mid = rt.get_timestep_data(0.1).walkers[0]
  np.testing.assert_array_equal(mid['walker/velocity'],
                                np.asarray(ref_mid.velocity))
  assert np.any(mid['walker/joints_velocity'] != 0)
  # the reference's zeroed last step agrees too
  ref_last = rt.get_timestep_data(float('inf')).walkers[0]
  np.testing.assert_array_equal(np.asarray(ref_last.velocity),
                                last['walker/velocity'])


@pytest.fixture(scope='module')
def cmu_model():
  """The V2019 walker — the exact skeleton the fixture clips were
  fitted to (the suite humanoid_CMU is a rounded variant that drifts
  ~2.6 cm)."""
  from dm_control_tpu.locomotion.cmu_subsets import _cmu_v2019_model
  return _cmu_v2019_model()


def test_fk_consistency_with_stored_body_positions(loaders, cmu_model):
  """The decoded qpos, pushed through OUR forward kinematics on the
  vendored V2019 skeleton, must reproduce the body-position tracks
  stored in the file (produced by the reference's fitting pipeline on
  that same skeleton): the end-to-end check that loader, joint
  ordering, model vendoring, and FK all agree.  Measured: 2.0e-7."""
  _, ours = loaders
  m = cmu_model
  t = ours.get_trajectory('cmuv2019_001')
  d = t.as_dict()
  cc = mocap.build_features(m, [t.to_qpos_trajectory()])
  T = t.num_steps
  stored = d['walker/body_positions']        # (T, 30, 3)
  fk = np.asarray(cc.body_pos[0, :T])        # (T, nbody, 3)
  # map each stored track to our body index by frame-0 proximity
  # (the stored set is the walker's mocap_tracking_bodies, a subset of
  # our nbody that excludes worldbody and duplicated frames)
  d0 = np.linalg.norm(stored[0][:, None] - fk[0][None, :], axis=-1)
  match = d0.argmin(axis=1)
  assert (d0.min(axis=1) < 1e-5).all(), d0.min(axis=1)
  err = np.abs(stored - fk[:, match]).max()
  assert err < 1e-5, err
  # body quaternions too, where the position match is unambiguous
  # (several CMU bodies share a frame origin, so nearest-position can
  # pick the partner body whose orientation differs)
  second = np.partition(d0, 1, axis=1)[:, 1]
  unique = second > 1e-4
  bq = d['walker/body_quaternions'][:, unique]
  fkq = np.asarray(cc.body_quat[0, :T])[:, match[unique]]
  qerr = np.minimum(np.abs(bq - fkq).max(axis=-1),
                    np.abs(bq + fkq).max(axis=-1)).max()
  assert qerr < 1e-5, qerr


def test_tracking_with_reference_clips(loaders, cmu_model):
  """Feed the reference's own fixture clips through
  MultiClipMocapTracking with the CMU walker (VERDICT r4 item 4 'done'
  criterion): init lands on the reference pose with near-zero
  termination error and the env steps finite."""
  from dm_control_tpu.locomotion import tracking
  from dm_control_tpu.locomotion.cmu_subsets import v2019_walker_root

  m = cmu_model
  cc = mocap_hdf5.load_collection(H5, m)
  assert cc.n_clips == 2 and cc.dt == 0.05
  env = tracking.load(v2019_walker_root(), cc, random=0, min_steps=2,
                      ref_steps=(1, 2), always_init_at_clip_start=True)
  ts = env.reset()
  # initialized exactly on the mocap pose -> tracking error ~ 0
  err = env.task.termination_error(env.task.model, env.physics)
  assert float(err) < 1e-3, float(err)
  for _ in range(3):
    ts = env.step(np.zeros(env.action_spec().shape))
    assert np.isfinite(ts.reward)
    assert all(np.isfinite(v).all() for v in ts.observation.values())
