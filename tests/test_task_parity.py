"""Task-level return parity vs the installed dm_control oracle.

The BASELINE.json correctness mandate: identical initial state + identical
action sequence -> matching rewards/observations within float tolerance.
The oracle env resets (its own RNG), we copy its physics state (and any
episode-randomized model params) into our env, then lockstep both.
"""

import collections

import numpy as np
import pytest

# oracle
import dm_control.suite as ref_suite

from dm_control_tpu import suite

# (domain, task, steps, reward atol)
CASES = [
    ('pendulum', 'swingup', 100, 1e-6),
    ('cartpole', 'swingup', 100, 1e-6),
    ('cartpole', 'balance', 100, 1e-6),
    ('acrobot', 'swingup', 100, 1e-6),
    ('reacher', 'easy', 100, 1e-6),
    ('reacher', 'hard', 100, 1e-6),
    ('point_mass', 'easy', 100, 1e-6),
    ('swimmer', 'swimmer6', 100, 1e-5),
    ('fish', 'upright', 100, 1e-5),
    ('fish', 'swim', 100, 1e-5),
    ('ball_in_cup', 'catch', 100, 1e-5),
    ('hopper', 'stand', 50, 2e-2),
    ('hopper', 'hop', 50, 2e-2),
    ('walker', 'walk', 50, 2e-2),
    ('walker', 'run', 50, 2e-2),
    ('cheetah', 'run', 50, 2e-2),
    ('finger', 'spin', 50, 2e-2),
    ('humanoid', 'stand', 30, 5e-2),
]

# model params that reference tasks mutate per episode -> copied as overrides
_MODEL_VAR_FIELDS = ['geom_pos', 'site_pos', 'wrap_prm']


@pytest.mark.parametrize('domain,task,n_steps,atol', CASES)
def test_reward_parity(domain, task, n_steps, atol):
  ref_env = ref_suite.load(domain, task, task_kwargs={'random': 11})
  ref_ts = ref_env.reset()
  env = suite.load(domain, task, task_kwargs={'random': 11})
  env.reset()

  # copy oracle state + episode-randomized model params
  rp = ref_env.physics
  model_var = {f: getattr(rp.model, f).copy() for f in _MODEL_VAR_FIELDS
               if getattr(rp.model, f).size}
  env.set_state(rp.data.qpos.copy(), rp.data.qvel.copy(),
                rp.data.act.copy(), model_var=model_var)

  spec = ref_env.action_spec()
  rng = np.random.RandomState(5)
  max_err = 0.0
  for t in range(n_steps):
    action = rng.uniform(spec.minimum, spec.maximum)
    ref_ts = ref_env.step(action)
    ts = env.step(action)
    err = abs(float(ref_ts.reward) - float(ts.reward))
    max_err = max(max_err, err)
    assert err < atol, (
        f'{domain}/{task} step {t}: reward {ts.reward} vs oracle '
        f'{ref_ts.reward} (err {err:.2e})')
    if ref_ts.last():
      break
