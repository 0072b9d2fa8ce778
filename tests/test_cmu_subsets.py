"""CMU clip catalog + multi-clip tracking at scale (VERDICT r2 item 9:
a cmu_subsets-style named catalog feeding batched
MultiClipMocapTracking on >= 8 clips with the CMU walker)."""

import numpy as np
import pytest

from dm_control_tpu.locomotion import cmu_subsets, mocap


def test_subset_ids_match_reference_shape():
  assert len(cmu_subsets.GET_UP) == 7
  assert len(cmu_subsets.WALK_TINY) == 36
  assert len(cmu_subsets.RUN_JUMP_TINY) == 50
  assert set(cmu_subsets.WALK_TINY) <= set(cmu_subsets.ALL)
  assert all(i.startswith('CMU_') for i in cmu_subsets.ALL)


@pytest.fixture(scope='module')
def catalog8():
  # 8 distinct clips from walk_tiny, synthesized deterministically
  return cmu_subsets.load_catalog(
      cmu_subsets.WALK_TINY[:8], n_frames=12)


def test_catalog_builds_eight_distinct_clips(catalog8):
  assert catalog8.n_clips == 8
  assert catalog8.max_length >= 12
  # each id seeds a different motion
  flat = catalog8.qpos.reshape(8, -1)
  d = np.linalg.norm(flat[:, None] - flat[None, :], axis=-1)
  assert (d + np.eye(8) * 1e9).min() > 1e-3


def test_catalog_determinism():
  a = cmu_subsets.load_catalog(['CMU_016_22'], n_frames=6)
  b = cmu_subsets.load_catalog(['CMU_016_22'], n_frames=6)
  np.testing.assert_array_equal(a.qpos, b.qpos)


def test_catalog_reads_amc_files(tmp_path):
  """A real .amc dropped under a CMU id takes precedence over the
  synthesizer (the production data path)."""
  import shutil
  from dm_control_tpu.suite import common
  import os
  src = os.path.join(os.path.dirname(common.model_path(
      'humanoid_CMU.xml')), 'zeros.amc')
  if not os.path.exists(src):
    pytest.skip('zeros.amc not vendored')
  shutil.copy(src, tmp_path / 'CMU_016_22.amc')
  coll = cmu_subsets.load_catalog(
      ['CMU_016_22'], clip_dir=str(tmp_path), n_frames=6)
  assert coll.n_clips == 1


def test_batched_tracking_over_eight_clips(catalog8):
  """Batched MultiClipMocapTracking: 4 lanes, 8 clips, CMU walker.
  Every lane tracks some clip; zero action keeps errors finite and the
  per-lane clip indices stay in range."""
  from dm_control_tpu.locomotion import tracking
  from dm_control_tpu.mjcf.compiler import _load_xml
  from dm_control_tpu.suite import common

  import jax
  env = tracking.load(
      _load_xml(common.model_path('humanoid_CMU.xml')), catalog8,
      batch_size=4, time_limit=1.0)
  carry = env.reset(jax.random.PRNGKey(0))
  spec = env.action_spec()
  actions = np.zeros((4,) + tuple(spec.shape))
  for _ in range(2):
    carry, (obs, reward, done) = env.step(carry, actions)
    for v in obs.values():
      assert np.all(np.isfinite(v))
  assert np.asarray(reward).shape[0] == 4
  # lanes were initialized on distinct clips (8 clips, 4 lanes, random)
  clip_idx = np.asarray(carry[0].model_var['_mocap_clip'])
  assert clip_idx.shape[0] == 4
  assert (clip_idx >= 0).all() and (clip_idx < 8).all()
