"""Locomotion tier: walker + arenas + tasks, single-env and batched."""

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.locomotion import tasks


def test_rat_walker_entity():
  """Rodent walker: vendored model compiles, observables resolve and are
  finite after forward + steps (reference rodent.py:244-330 set)."""
  from dm_control_tpu._src import engine
  from dm_control_tpu.composer.task import ComposerTask
  from dm_control_tpu.locomotion import arenas, walkers
  walker = walkers.Rat()
  task = ComposerTask(arena=arenas.floor(size=(8.0, 8.0)),
                      control_timestep=0.025)
  task.attach(walker)
  m = task.compile()
  assert m.nv == 73  # 67 skeleton DoF + free root
  obs, torso = walker.observables_for(m, 'walker')
  for key in ('joints_pos', 'tendons_pos', 'tendons_vel', 'head_height',
              'appendages_pos', 'sensors_touch', 'actuator_activation'):
    assert key in obs
  d = engine.build_forward(m)(engine.make_data(m))
  for name, spec in obs.items():
    assert np.isfinite(np.asarray(spec.fn(m, d))).all(), name
  assert np.asarray(obs['appendages_pos'].fn(m, d)).shape == (15,)
  step = engine.build_step(m)
  for _ in range(3):
    d = step(d.replace(ctrl=jnp.zeros(m.nu, d.qpos.dtype)))
  assert bool(jnp.isfinite(d.qpos).all())


def test_jumping_ball_walker_entity():
  """Jumping-ball walker: planar slide root triplet (reference
  jumping_ball.py:89-97), roll/steer/kick actuators step stably."""
  from dm_control_tpu._src import engine
  from dm_control_tpu.composer.task import ComposerTask
  from dm_control_tpu.locomotion import arenas, walkers
  walker = walkers.JumpingBallWithHead(marker_rgba=(0.1, 0.2, 0.9, 1.0))
  task = ComposerTask(arena=arenas.floor(size=(4.0, 4.0)),
                      control_timestep=0.025)
  task.attach(walker)
  m = task.compile()
  for jn in ('walker/root_x', 'walker/root_y', 'walker/root_z'):
    assert jn in m.names['joint']
  obs, _ = walker.observables_for(m, 'walker')
  d = engine.build_forward(m)(engine.make_data(m))
  for name, spec in obs.items():
    assert np.isfinite(np.asarray(spec.fn(m, d))).all(), name
  step = engine.build_step(m)
  for _ in range(5):
    d = step(d.replace(ctrl=jnp.zeros(m.nu, d.qpos.dtype)))
  assert bool(jnp.isfinite(d.qpos).all())


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


def test_maze_generation_properties():
  from dm_control_tpu.locomotion import arenas
  walls = arenas.generate_maze(n_cells=6, seed=3)
  # all cells open and mutually reachable (backtracker spans the grid)
  assert not walls[1::2, 1::2].any()
  # border fully walled
  assert walls[0].all() and walls[-1].all()
  assert walls[:, 0].all() and walls[:, -1].all()
  # different seeds give different mazes
  assert (walls != arenas.generate_maze(n_cells=6, seed=4)).any()


def test_random_goal_maze_runs():
  import numpy as np
  from dm_control_tpu.locomotion import tasks
  env = tasks.random_goal_maze(n_cells=3, random=0, time_limit=2.0)
  ts = env.reset()
  assert 'target' in ts.observation
  spec = env.action_spec()
  rng = np.random.RandomState(0)
  while not ts.last():
    ts = env.step(rng.uniform(spec.minimum, spec.maximum, spec.shape))
    assert np.isfinite(ts.reward)
  # goal/spawn differ across episodes
  env.reset()
  g1 = np.asarray(env.physics.model_var['geom_pos']).copy()
  env.reset()
  g2 = np.asarray(env.physics.model_var['geom_pos'])
  assert (g1 != g2).any()


def test_escape_bowl_runs():
  import numpy as np
  from dm_control_tpu.locomotion import tasks
  env = tasks.escape(radius=4.0, random=0, time_limit=1.0)
  ts = env.reset()
  assert 'origin_distance' in ts.observation
  d = env.physics
  assert 'hfield_data' in d.model_var
  spec = env.action_spec()
  rng = np.random.RandomState(1)
  while not ts.last():
    ts = env.step(rng.uniform(spec.minimum, spec.maximum, spec.shape))
    assert np.isfinite(ts.reward)
    assert 0.0 <= ts.reward <= 1.0


def test_cmu_walker_entity():
  import numpy as np
  from dm_control_tpu.composer.environment import Environment
  from dm_control_tpu.composer.task import ComposerTask
  from dm_control_tpu.locomotion import arenas, walkers
  w = walkers.CMUHumanoid()
  task = ComposerTask(arena=arenas.floor(size=(6., 6.), timestep=0.005),
                      control_timestep=0.02)
  task.attach(w)
  m = task.compile()
  obs, root_b = w.observables_for(m, 'walker')
  for k, v in obs.items():
    task.add_observable(f'walker/{k}', v)
  env = Environment(task, time_limit=0.3, random=0)
  ts = env.reset()
  assert ts.observation['walker/joints_pos'].shape == (56,)
  assert ts.observation['walker/end_effectors_pos'].shape == (12,)
  assert ts.observation['walker/appendages_pos'].shape == (15,)
  ts = env.step(np.zeros(env.action_spec().shape))
  assert all(np.isfinite(v).all() for v in ts.observation.values())
