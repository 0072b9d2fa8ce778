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


@pytest.mark.parametrize('domain,task', [
    ('pendulum', 'swingup'), ('cartpole', 'swingup'),
    ('cheetah', 'run'), ('walker', 'walk'), ('hopper', 'hop'),
    ('finger', 'spin'), ('reacher', 'easy'), ('humanoid', 'stand'),
])
def test_environment_is_deterministic(domain, task):
  """Same seed -> identical trajectories (reference suite_test.py:176)."""
  def trajectory(seed):
    env = suite.load(domain, task, task_kwargs={'random': seed})
    spec = env.action_spec()
    rng = np.random.RandomState(1)
    policy = _uniform_policy(spec, rng)
    ts = env.reset()
    rewards, obs = [], []
    for _ in range(5):
      ts = env.step(policy())
      rewards.append(ts.reward)
      obs.append(np.concatenate([np.ravel(v)
                                 for v in ts.observation.values()]))
    return np.array(rewards), np.stack(obs)

  r1, o1 = trajectory(42)
  r2, o2 = trajectory(42)
  np.testing.assert_array_equal(r1, r2)
  np.testing.assert_array_equal(o1, o2)


@pytest.mark.parametrize('domain,task', [
    ('pendulum', 'swingup'), ('cartpole', 'swingup'), ('walker', 'walk'),
])
def test_initial_state_is_randomized(domain, task):
  env = suite.load(domain, task, task_kwargs={'random': 3})
  ts1 = env.reset()
  ts2 = env.reset()
  flat1 = np.concatenate([np.ravel(v) for v in ts1.observation.values()])
  flat2 = np.concatenate([np.ravel(v) for v in ts2.observation.values()])
  assert not np.allclose(flat1, flat2), 'episodes start identically'
