"""Locomotion tier: walker + arenas + tasks, single-env and batched."""

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.locomotion import tasks


def test_go_to_target_single():
  env = tasks.go_to_target(random=0)
  ts = env.reset()
  spec = env.action_spec()
  rng = np.random.RandomState(0)
  for _ in range(5):
    ts = env.step(rng.uniform(spec.minimum, spec.maximum, spec.shape))
    assert all(np.isfinite(np.asarray(v)).all()
               for v in ts.observation.values())
  assert 'target' in ts.observation
  assert ts.observation['walker/joints_pos'].shape == (8,)


def test_run_through_corridor_batched():
  env = tasks.run_through_corridor('gaps', batch_size=3, time_limit=2.0)
  carry = env.reset(jax.random.PRNGKey(0))
  nu = env._model.nu
  for _ in range(4):
    carry, (obs, reward, done) = env.step(carry, jnp.zeros((3, nu)))
  assert reward.shape == (3,)
  assert bool(jnp.isfinite(obs['walker/sensors_torso_vel']).all())


def test_walls_corridor_builds():
  env = tasks.run_through_corridor('walls', random=0)
  ts = env.reset()
  assert ts.step_type.first()
