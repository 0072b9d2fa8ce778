"""Suite-wide conformance tests, modeled on the reference's
dm_control/suite/suite_test.py invariants (SURVEY.md section 4.6):
spec conformance, fixed-seed determinism, finite observations.
"""

import numpy as np
import pytest

from dm_control_tpu import suite

TASKS = suite.ALL_TASKS


def _uniform_policy(spec, rng):
  lo = np.where(np.isfinite(spec.minimum), spec.minimum, -1.0)
  hi = np.where(np.isfinite(spec.maximum), spec.maximum, 1.0)
  return lambda: rng.uniform(lo, hi)


@pytest.mark.parametrize('domain,task', TASKS)
def test_task_runs_and_conforms_to_spec(domain, task):
  if domain == 'humanoid_CMU':
    pytest.skip('62-DoF float64 XLA:CPU compile takes ~45 min; '
                'exercised by the TPU bench path instead')
  env = suite.load(domain, task, task_kwargs={'random': 7})
  action_spec = env.action_spec()
  obs_spec = env.observation_spec()
  rng = np.random.RandomState(0)
  policy = _uniform_policy(action_spec, rng)
  ts = env.reset()
  for k, v in ts.observation.items():
    assert k in obs_spec
    assert np.all(np.isfinite(v)), f'{domain}/{task} obs {k} not finite'
  for _ in range(10):
    ts = env.step(policy())
    assert ts.reward is None or np.isfinite(ts.reward)
    for k, v in ts.observation.items():
      assert tuple(obs_spec[k].shape) == np.shape(v), (
          f'{domain}/{task} obs {k} shape')
      assert np.all(np.isfinite(v))
