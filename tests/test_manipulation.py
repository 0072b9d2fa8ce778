"""Manipulation tier: every registered task loads and steps
(reference manipulation_test.py:99 pattern)."""

import numpy as np
import pytest

import dm_control_tpu.manipulation as manipulation


def test_registry():
  assert len(manipulation.ALL) >= 5
  assert 'features' in manipulation.TAGS
  assert 'reach_site_features' in manipulation.get_environments_by_tag(
      'features')


@pytest.mark.parametrize('name', manipulation.ALL)
def test_task_runs(name):
  env = manipulation.load(name, seed=1)
  ts = env.reset()
  spec = env.action_spec()
  rng = np.random.RandomState(0)
  for _ in range(3):
    ts = env.step(rng.uniform(spec.minimum, spec.maximum, spec.shape))
    assert np.isfinite(ts.reward)
    for v in ts.observation.values():
      assert np.all(np.isfinite(v))


def test_vision_variant_has_pixels():
  env = manipulation.load('reach_site_vision', seed=0)
  ts = env.reset()
  px = ts.observation['pixels']
  assert px.shape == (48, 64, 3)
  assert float(px.std()) > 0.01
  assert 'arm_pos' in ts.observation
  ts = env.step(np.zeros(env.action_spec().shape))
  assert np.isfinite(ts.reward)


def test_vision_registry_tags():
  vis = manipulation.get_environments_by_tag('vision')
  assert len(vis) == 5
  assert all(v.endswith('_vision') for v in vis)
