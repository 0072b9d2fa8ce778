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


def test_ball_stats_hit_and_repossession():
  """In-graph ball-touch stats (reference soccer_ball.py:39-150): a
  contact between a player geom and the ball flips hit/last_hit; a touch
  by the other team raises intercepted."""
  task = soccer.Task(team_size=1)
  m = task.compile()
  d = forward.make_data(m)
  n = len(task.players)

  def stats(d):
    return np.asarray(d.model_var['_ball_stats'])

  # episode init zeroes the stats
  d = task.init_episode(m, d, jax.random.PRNGKey(0))
  assert stats(d).shape == (n + 5,)

  # drop the ball onto home0's head: contact => hit
  hq = task._slides['home0'][0]
  bq = task._ball_q
  qpos = d.qpos.at[bq:bq + 2].set(d.qpos[hq:hq + 2])
  qpos = qpos.at[bq + 2].set(1.3)  # resting on the head box
  d2 = forward.forward(m, d.replace(qpos=qpos))
  hook = task.step_hooks('after_step')[0][0]
  d2 = hook(m, d2, jax.random.PRNGKey(1), 'ball')
  s = stats(d2)
  assert s[n + 1] == 1.0, s          # hit this step
  assert s[0] == 1.0 and s[1] == 0.0  # last hit: home0
  assert s[n + 3] == 0.0             # no interception yet (first touch)

  # now the away player touches it: repossessed + intercepted
  aq = task._slides['away0'][0]
  qpos = d2.qpos.at[bq:bq + 2].set(d2.qpos[aq:aq + 2])
  qpos = qpos.at[bq + 2].set(1.3)
  # move home0 far away so only away0 contacts
  qpos = qpos.at[hq:hq + 2].set(jnp.asarray([8.0, 8.0]))
  d3 = forward.forward(m, d2.replace(qpos=qpos))
  d3 = hook(m, d3, jax.random.PRNGKey(2), 'ball')
  s = stats(d3)
  assert s[1] == 1.0 and s[0] == 0.0   # last hit: away0
  assert s[n + 2] == 1.0               # repossessed
  assert s[n + 3] == 1.0               # intercepted

  # stats observables exist
  obs = task.observables
  for k in ('ball/hit', 'ball/intercepted', 'home0/stats_vel_to_ball',
            'home0/stats_veloc_forward', 'home0/stats_last_hit',
            'away0/stats_hit', 'away0/stats_vel_ball_to_goal'):
    assert k in obs, k


def test_randomized_pitch_scales_walls_and_goals():
  """RandomizedPitch parity (reference pitch.py:605): per-episode x/y
  scales move the walls/goals inward via the geom_pos overlay and shrink
  the goal line used for scoring."""
  task = soccer.Task(team_size=1, randomize_pitch=(0.5, 0.7))
  m = task.compile()
  d = forward.make_data(m)
  d = task.init_episode(m, d, jax.random.PRNGKey(7))
  scale = np.asarray(d.model_var['_pitch_scale'])
  assert (0.5 <= scale).all() and (scale <= 0.7).all()
  gp = np.asarray(d.model_var['geom_pos'])
  right_a = m.name2id('geom', 'wall_right_a')  # arena geoms: no prefix
  base = np.asarray(m.geom_pos)
  np.testing.assert_allclose(gp[right_a, 0], base[right_a, 0] * scale[0],
                             rtol=1e-6)
  np.testing.assert_allclose(gp[right_a, 2], base[right_a, 2], rtol=1e-6)

  # ball just past the SCALED goal line scores, even though it is far
  # inside the unscaled line
  length = task.pitch_size[0]
  gx = scale[0] * length + soccer._BALL_RADIUS
  d2 = d.replace(qpos=d.qpos.at[task._ball_q].set(gx + 0.05))
  np.testing.assert_allclose(
      np.asarray(task.get_reward(m, d2)), [1.0, -1.0])
  assert gx + 0.05 < task._goal_x

  # two episodes draw different sizes
  d3 = task.init_episode(m, forward.make_data(m), jax.random.PRNGKey(8))
  assert not np.allclose(np.asarray(d3.model_var['_pitch_scale']), scale)
