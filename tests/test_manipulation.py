"""Manipulation tier: registry parity with the reference and every
registered task loads and steps (reference manipulation_test.py:99
pattern), plus Duplo stacking-reward semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dm_control_tpu.manipulation as manipulation

# the reference's full registry (manipulation/{reach,lift,place,bricks}.py
# @registry.add entries)
REFERENCE_NAMES = {
    'reach_duplo_features', 'reach_duplo_vision',
    'reach_site_features', 'reach_site_vision',
    'lift_brick_features', 'lift_brick_vision',
    'lift_large_box_features', 'lift_large_box_vision',
    'place_brick_features', 'place_brick_vision',
    'place_cradle_features', 'place_cradle_vision',
    'stack_2_bricks_features', 'stack_2_bricks_vision',
    'stack_2_bricks_moveable_base_features',
    'stack_2_bricks_moveable_base_vision',
    'stack_3_bricks_features', 'stack_3_bricks_vision',
    'stack_3_bricks_random_order_features',
    'stack_2_of_3_bricks_random_order_features',
    'stack_2_of_3_bricks_random_order_vision',
    'reassemble_3_bricks_fixed_order_features',
    'reassemble_3_bricks_fixed_order_vision',
    'reassemble_5_bricks_random_order_features',
    'reassemble_5_bricks_random_order_vision',
}


def test_registry_matches_reference():
  assert set(manipulation.ALL) == REFERENCE_NAMES
  assert 'features' in manipulation.TAGS
  assert 'reach_site_features' in manipulation.get_environments_by_tag(
      'features')


@pytest.mark.parametrize('name', sorted(REFERENCE_NAMES))
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
  assert len(vis) == 12
  assert all(v.endswith('_vision') for v in vis)


def test_stacking_reward_semantics():
  """A clicked pair scores ~1; scattered bricks score ~0; the 180-degree
  flip symmetry holds (reference bricks.py:420-463)."""
  from dm_control_tpu._src import forward as fwd
  from dm_control_tpu._src import smooth
  from dm_control_tpu.manipulation import bricks as B
  from dm_control_tpu.manipulation import tasks as T

  task, m, bs = B._make_brick_task(T.build_arena_jaco, 2)
  d = fwd.make_data(m)

  def reward_for(poses):
    dd = d
    for i, pose in enumerate(poses):
      dd = bs.set_brick_qpos(dd, i, jnp.asarray(pose, d.qpos.dtype))
    dd = smooth.kinematics(m, dd)
    return float(bs.stacking_reward(
        dd, jnp.arange(2), target_height=2))

  clicked = reward_for([
      np.r_[0.0, 0.0, 0.0, 1.0, 0, 0, 0],
      np.r_[0.0, 0.0, B.duplo.STACK_DZ, 1.0, 0, 0, 0]])
  assert clicked > 0.95, clicked

  # flipped 180 degrees about z: same stack by brick symmetry
  flipped = reward_for([
      np.r_[0.0, 0.0, 0.0, 1.0, 0, 0, 0],
      np.r_[0.0, 0.0, B.duplo.STACK_DZ, 0.0, 0, 0, 1.0]])
  assert flipped > 0.95, flipped

  apart = reward_for([
      np.r_[-0.2, -0.2, 0.0, 1.0, 0, 0, 0],
      np.r_[0.2, 0.2, 0.0, 1.0, 0, 0, 0]])
  assert apart < 0.05, apart


def test_stack_poses_click_alignment():
  """stack_poses yields poses whose stud->hole corner distances are
  zero at every level, for both flip branches."""
  from dm_control_tpu._src import forward as fwd
  from dm_control_tpu._src import smooth
  from dm_control_tpu.manipulation import bricks as B
  from dm_control_tpu.manipulation import tasks as T

  task, m, bs = B._make_brick_task(T.build_arena_jaco, 3)
  d = fwd.make_data(m)
  poses = bs.stack_poses(
      jax.random.PRNGKey(3),
      jnp.asarray([0.05, -0.02, 0.0], d.qpos.dtype),
      jnp.asarray([1.0, 0, 0, 0], d.qpos.dtype), 3)
  for i in range(3):
    d = bs.set_brick_qpos(d, i, poses[i])
  d = smooth.kinematics(m, d)
  for k in range(2):
    dist = float(bs.pair_distance(d, k, k + 1))
    assert dist < 1e-6, (k, dist)


def test_lift_reward_increases_with_height():
  env = manipulation.load('lift_brick_features', seed=2)
  env.reset()
  task = env.task
  m = task.model
  from dm_control_tpu._src import forward as fwd
  from dm_control_tpu._src import smooth
  d = fwd.make_data(m)
  d = task.init_episode(m, d, jax.random.PRNGKey(0))
  adr = int(m.jnt_qposadr[m.name2id('joint', 'brick0/brick0_root')])
  low = float(task.get_reward(m, smooth.kinematics(m, d)))
  d2 = d.replace(qpos=d.qpos.at[adr + 2].add(0.35))
  high = float(task.get_reward(m, smooth.kinematics(m, d2)))
  assert low < 0.05
  assert high > 0.95
