"""Multi-agent soccer: specs, goal logic, episode loop, batching."""

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import forward
from dm_control_tpu.locomotion import soccer


def test_load_specs_and_players():
  env = soccer.load(team_size=1, time_limit=2.0, random=0)
  ts = env.reset()
  assert env.action_spec().shape == (6,)
  players = env.task.players
  assert [p.team for p in players] == [soccer.Team.HOME, soccer.Team.AWAY]
  assert players[0].act_slice == slice(0, 3)
  for p in players:
    for suffix in ('proprio', 'ball_ego', 'goals_ego', 'others_ego'):
      assert f'{p.name}/{suffix}' in ts.observation


def test_goal_scoring_reward_and_termination():
  task = soccer.Task(team_size=1)
  m = task.compile()
  d = forward.make_data(m)
  # ball inside the +x goal: home scores, away concedes
  d = d.replace(qpos=d.qpos.at[task._ball_q].set(task._goal_x + 0.1))
  r = np.asarray(task.get_reward(m, d))
  np.testing.assert_allclose(r, [1.0, -1.0])
  assert bool(task.get_termination(m, d))
  # -x goal: away scores
  d = d.replace(qpos=d.qpos.at[task._ball_q].set(-task._goal_x - 0.1))
  np.testing.assert_allclose(np.asarray(task.get_reward(m, d)), [-1.0, 1.0])
  # midfield: no goal
  d = d.replace(qpos=d.qpos.at[task._ball_q].set(0.0))
  np.testing.assert_allclose(np.asarray(task.get_reward(m, d)), [0.0, 0.0])
  assert not bool(task.get_termination(m, d))


def test_episode_steps_with_vector_reward():
  env = soccer.load(team_size=1, time_limit=1.0, random=3)
  ts = env.reset()
  spec = env.action_spec()
  rng = np.random.RandomState(1)
  for _ in range(4):
    ts = env.step(rng.uniform(spec.minimum, spec.maximum, spec.shape))
    assert np.asarray(ts.reward).shape == (2,)
    assert all(np.isfinite(np.asarray(v)).all()
               for v in ts.observation.values())


def test_batched():
  env = soccer.load(team_size=1, batch_size=2, time_limit=1.0)
  carry = env.reset(jax.random.PRNGKey(0))
  nu = env._model.nu
  for _ in range(2):
    carry, (obs, reward, done) = env.step(carry, jnp.zeros((2, nu)))
  assert reward.shape == (2, 2)   # (batch, players)
  assert all(bool(jnp.isfinite(v).all()) for v in obs.values())
