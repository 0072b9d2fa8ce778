"""AMC mocap conversion parity vs the pip dm_control oracle."""

import numpy as np

import dm_control.suite as ref_suite
from dm_control.suite.utils import parse_amc as ref_amc

from dm_control_tpu import suite
from dm_control_tpu.suite import common
from dm_control_tpu.suite.utils import parse_amc


def test_convert_matches_oracle():
  amc = common.model_path('zeros.amc')
  env = ref_suite.load('humanoid_CMU', 'stand')
  ref_conv = ref_amc.convert(amc, env.physics, 0.01)
  m = suite.load('humanoid_CMU', 'stand').task.model
  conv = parse_amc.convert(amc, m, 0.01)
  np.testing.assert_allclose(conv.qpos, ref_conv.qpos, atol=1e-12)
  np.testing.assert_allclose(conv.qvel, ref_conv.qvel, atol=1e-12)
  np.testing.assert_allclose(conv.time, ref_conv.time, atol=1e-12)
