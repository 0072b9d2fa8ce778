"""Golden-frame regression battery for the analytic raytracer
(reference: mujoco/render_test.py + testing/image_utils.py:76-230).

Goldens live in dm_control_tpu/testing/frames/ and are regenerated with
tools/generate_frames.py.
"""

import os

import numpy as np
import pytest

from dm_control_tpu.testing import image_utils


@pytest.mark.parametrize('name', sorted(image_utils.SEQUENCES))
def test_sequence_matches_golden(name, tmp_path):
  golden = image_utils.load_golden(name)
  actual = image_utils.render_sequence(name)
  assert actual.shape == golden.shape
  for i, (exp, act) in enumerate(zip(golden, actual)):
    image_utils.assert_images_close(
        exp, act, tolerance=8.0, failure_dir=str(tmp_path),
        name=f'{name}_{i}')


def test_frames_are_nontrivial():
  golden = image_utils.load_golden('cartpole')
  # scene must animate and contain structure (not a flat background)
  assert golden.std(axis=(1, 2, 3)).min() > 1.0
  assert np.abs(golden[0].astype(int) - golden[-1].astype(int)).max() > 10


def test_rms_detects_corruption():
  golden = image_utils.load_golden('cartpole')
  corrupted = golden[0].copy()
  corrupted[10:30, 10:30] = 255
  with pytest.raises(AssertionError):
    image_utils.assert_images_close(golden[0], corrupted, tolerance=8.0)
