"""Tests for LQR oracle, wrappers, transformations, batched runner,
and mesh sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dm_control_tpu import suite
from dm_control_tpu.parallel.runner import BatchedEnv
from dm_control_tpu.parallel.sharding import ShardedBatchedEnv, make_mesh
from dm_control_tpu.suite import wrappers
from dm_control_tpu.utils import lqr_solver
from dm_control_tpu.utils import transformations as tr


def test_lqr_optimal_policy_regulates():
  """The Riccati policy must drive the LQR state to ~zero - the analytic
  correctness oracle mirroring reference suite/lqr_test.py."""
  env = suite.load('lqr', 'lqr_2_1',
                   task_kwargs={'random': 0, 'time_limit': 100.0})
  k = lqr_solver.solve(env.task)
  ts = env.reset()
  norm = None
  for _ in range(2500):
    d = env.physics
    if d is None:
      break
    state = np.concatenate([np.asarray(d.qpos), np.asarray(d.qvel)])
    norm = np.linalg.norm(state)
    ts = env.step(-k @ state)
  assert norm < 1e-2, f'LQR policy failed to regulate: |x|={norm}'
  # reward should approach 1 (zero state & control cost)
  assert ts.reward > 0.999


def test_action_noise_wrapper():
  env = suite.load('pendulum', 'swingup', task_kwargs={'random': 0})
  wrapped = wrappers.ActionNoiseWrapper(env, scale=0.01, random=1)
  wrapped.reset()
  ts = wrapped.step(np.zeros(1))
  assert np.isfinite(ts.reward)
  assert wrapped.action_spec() == env.action_spec()


def test_action_scale_wrapper():
  env = suite.load('pendulum', 'swingup', task_kwargs={'random': 0})
  wrapped = wrappers.ActionScaleWrapper(env, minimum=-1, maximum=1)
  wrapped.reset()
  ts = wrapped.step(np.ones(1))
  assert np.isfinite(ts.reward)


def test_transformations_roundtrip():
  rng = np.random.RandomState(0)
  for _ in range(10):
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
      q = -q
    m = tr.quat_to_mat3(jnp.asarray(q))
    q2 = np.asarray(tr.mat3_to_quat(m))
    np.testing.assert_allclose(q, q2, atol=1e-9)
    # euler roundtrip
    e = rng.uniform(-1.2, 1.2, 3)
    r = tr.euler_to_rmat(jnp.asarray(e), 'ZYX')
    e2 = np.asarray(tr.rmat_to_euler(r, 'ZYX'))
    np.testing.assert_allclose(e, e2, atol=1e-9)
  # quat_dist of identical quats is 0
  q = jnp.asarray([1.0, 0, 0, 0])
  assert float(tr.quat_dist(q, q)) < 1e-9


def test_transformations_all_orderings_vs_oracle():
  """All 7 Euler orderings match the reference implementation away from
  the gimbal poles (reference transformations.py:66-312)."""
  ref = pytest.importorskip('dm_control.utils.transformations')
  rng = np.random.RandomState(1)
  for ordering in ('XYZ', 'XYX', 'XZY', 'ZYX', 'YZX', 'ZXY', 'YXZ'):
    for _ in range(20):
      e = rng.uniform(-1.2, 1.2, 3)
      if ordering == 'XYX':
        e[1] = rng.uniform(0.1, 2.9)  # proper-Euler mid angle in (0, pi)
      r_ref = ref.euler_to_rmat(e, ordering=ordering)
      r_ours = np.asarray(tr.euler_to_rmat(jnp.asarray(e), ordering))
      np.testing.assert_allclose(r_ours, r_ref, atol=1e-9,
                                 err_msg=f'euler_to_rmat {ordering}')
      e_ref = ref.rmat_to_euler(r_ref, ordering=ordering)
      e_ours = np.asarray(tr.rmat_to_euler(jnp.asarray(r_ref), ordering))
      np.testing.assert_allclose(e_ours, e_ref, atol=1e-9,
                                 err_msg=f'rmat_to_euler {ordering}')
  # quat_log against the reference on random unit quaternions
  for _ in range(10):
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    np.testing.assert_allclose(np.asarray(tr.quat_log(jnp.asarray(q))),
                               ref.quat_log(q), atol=1e-7)
  # rotation axis helpers, 3x3 and embedded 4x4
  th = 0.7
  np.testing.assert_allclose(np.asarray(tr.rotation_z_axis(th, True)),
                             ref.rotation_z_axis(th, full=True), atol=1e-9)
  np.testing.assert_allclose(np.asarray(tr.rotation_x_axis(th)),
                             ref.rotation_x_axis(th), atol=1e-9)
  np.testing.assert_allclose(np.asarray(tr.rotation_y_axis(th)),
                             ref.rotation_y_axis(th), atol=1e-9)
  np.testing.assert_allclose(np.asarray(tr.rotation_matrix_2d(th)),
                             ref.rotation_matrix_2d(th), atol=1e-12)


def test_batched_runner_matches_single_env_physics():
  """Lane semantics: batched step == single-env step for identical states."""
  task = suite.build_task('pendulum', 'swingup')
  env = BatchedEnv(task, 4, time_limit=float('inf'), auto_reset=False)
  state = env.reset(jax.random.PRNGKey(0))
  actions = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (4, 1)))
  new_state, (obs, reward, done, discount) = env.step(state, actions)

  # single-env comparison on lane 2
  from dm_control_tpu._src import engine
  lane = jax.tree_util.tree_map(lambda x: x[2], state.data)
  step = engine.build_step(task.model)
  d = step(lane.replace(ctrl=actions[2]))
  np.testing.assert_allclose(
      np.asarray(new_state.data.qpos[2]), np.asarray(d.qpos), atol=1e-12)
  r = task.get_reward(task.model, d)
  np.testing.assert_allclose(np.asarray(reward[2]), np.asarray(r),
                             atol=1e-12)


def test_batched_auto_reset_on_time_limit():
  task = suite.build_task('pendulum', 'swingup')
  env = BatchedEnv(task, 3, time_limit=3 * task.model.opt.timestep,
                   auto_reset=True)
  state = env.reset(jax.random.PRNGKey(0))
  for t in range(3):
    state, (obs, reward, done, discount) = env.step(
        state, jnp.zeros((3, 1)))
  assert bool(jnp.all(done)), 'expected time-limit termination'
  assert bool(jnp.all(discount == 1.0)), 'truncation keeps discount 1'
  assert bool(jnp.all(state.step_count == 0)), 'lanes should have reset'
  assert bool(jnp.all(state.episode_id == 1))


def test_sharded_batched_env_matches_unsharded():
  mesh = make_mesh()  # 8 virtual CPU devices (conftest XLA_FLAGS)
  assert mesh.devices.size == 8
  task = suite.build_task('cartpole', 'swingup')
  batch = 16
  sharded = ShardedBatchedEnv(task, batch, mesh)
  state_s = sharded.reset(jax.random.PRNGKey(0))
  plain = sharded.env
  state_p = plain.reset(jax.random.PRNGKey(0))
  actions = jnp.asarray(
      np.random.RandomState(1).uniform(-1, 1, (batch, 1)))
  out_s, (obs_s, rew_s, *_rest) = sharded.step(state_s, actions)
  out_p, (obs_p, rew_p, *_) = plain.step(state_p, actions)
  np.testing.assert_allclose(np.asarray(rew_s), np.asarray(rew_p),
                             atol=1e-10)
  np.testing.assert_allclose(np.asarray(out_s.data.qpos),
                             np.asarray(out_p.data.qpos), atol=1e-10)


def test_rewards_tolerance_matches_reference():
  """Kernel-by-kernel check vs the reference implementation's published
  semantics (dm_control/utils/rewards.py)."""
  from dm_control_tpu.utils import rewards as our
  from dm_control.utils import rewards as ref
  rng = np.random.RandomState(0)
  xs = rng.uniform(-3, 3, 50)
  for sigmoid in ['gaussian', 'hyperbolic', 'long_tail', 'reciprocal',
                  'cosine', 'linear', 'quadratic', 'tanh_squared']:
    ours = np.asarray(our.tolerance(
        jnp.asarray(xs), bounds=(-0.1, 0.3), margin=0.5, sigmoid=sigmoid,
        value_at_margin=0.2))
    theirs = ref.tolerance(xs, bounds=(-0.1, 0.3), margin=0.5,
                           sigmoid=sigmoid, value_at_margin=0.2)
    np.testing.assert_allclose(ours, theirs, atol=1e-12,
                               err_msg=f'sigmoid {sigmoid}')


def test_render_and_pixels_wrapper():
  """In-graph raytracer: shapes, geom hits, depth and segmentation."""
  import jax.numpy as jnp
  from dm_control_tpu._src import render as render_lib
  env = suite.load('pendulum', 'swingup', task_kwargs={'random': 0})
  env.reset()
  m, d = env.task.model, env.physics
  rgb = np.asarray(render_lib.render(m, d, 48, 64, camera_id=0))
  assert rgb.shape == (48, 64, 3)
  assert rgb.std() > 0.01, 'image is blank'
  seg = np.asarray(render_lib.render(m, d, 48, 64, 0, segmentation=True))
  assert seg.max() >= 0, 'no geoms visible'
  depth = np.asarray(render_lib.render(m, d, 48, 64, 0, depth=True))
  assert np.isfinite(depth[seg >= 0]).all()

  wrapped = wrappers.PixelsWrapper(env, render_kwargs=dict(
      height=32, width=32, camera_id=0))
  ts = wrapped.reset()
  assert ts.observation['pixels'].shape == (32, 32, 3)
  assert ts.observation['pixels'].dtype == np.uint8
  ts = wrapped.step(np.zeros(1))
  assert ts.observation['pixels'].std() > 0


def test_inverse_kinematics_reaches_target():
  from dm_control_tpu.utils import inverse_kinematics as ik
  from dm_control_tpu._src import engine
  env = suite.load('acrobot', 'swingup', task_kwargs={'random': 0})
  m = env.task.model
  d = engine.make_data(m)
  d = engine.build_forward(m)(d)
  # reachable target for the 2-link arm's tip site
  target = np.array([0.8, 0.0, 1.2])
  res = ik.qpos_from_site_pose(m, d, 'tip', target_pos=target,
                               max_steps=150)
  assert float(res.err_norm) < 1e-3, f'IK err {res.err_norm}'


def test_profiling_wrapper_and_metrics():
  from dm_control_tpu.parallel.metrics import Meter
  env = suite.load('pendulum', 'swingup', task_kwargs={'random': 0})
  wrapped = wrappers.ProfilingWrapper(env)
  ts = wrapped.reset()
  ts = wrapped.step(np.zeros(1))
  assert ts.observation['step_timing'][1] == 1.0
  assert ts.observation['step_timing'][0] > 0.0

  meter = Meter(batch_size=4)
  meter.update(done=np.array([1, 0, 0, 1]), reward=np.ones(4))
  snap = meter.snapshot()
  assert snap['episodes'] == 2
  assert snap['env_steps'] == 4


def test_divergence_flag_and_auto_reset():
  """NaN control must set `diverged`; batched runner then resets the lane
  with discount 0 (reference PhysicsError semantics, engine.py:312-335)."""
  import jax.numpy as jnp
  task = suite.build_task('pendulum', 'swingup')
  env = BatchedEnv(task, 2, auto_reset=True)
  state = env.reset(jax.random.PRNGKey(0))
  actions = jnp.array([[np.nan], [0.0]])
  state, (obs, reward, done, discount) = env.step(state, actions)
  assert bool(done[0]) and not bool(done[1])
  assert float(discount[0]) == 0.0 and float(discount[1]) == 1.0
  # lane 0 was re-initialized to a finite state
  assert np.isfinite(np.asarray(state.data.qpos[0])).all()


def test_visualize_reward_recolors_geoms():
  """suite.load(visualize_reward=True) blends self/effector/target geom
  colors by reward^4 (reference suite/base.py:100-112,
  suite_test.py:206)."""
  import numpy as np
  from dm_control_tpu import suite
  from dm_control_tpu._src import smooth

  env = suite.load('cartpole', 'balance', task_kwargs={'random': 0},
                   visualize_reward=True)
  m = env.task.model
  self_geoms = [g for g, n in enumerate(m.geom_material) if n == 'self']
  assert self_geoms, 'cartpole must have self-material geoms'
  ts = env.reset()
  d0 = env.physics
  assert 'geom_rgba' in (d0.model_var or {})
  rgba0 = np.asarray(smooth.mparam(m, d0, 'geom_rgba'))[self_geoms]
  # balance starts near upright -> reward ~1 -> colors near highlight
  env.step(np.zeros(env.action_spec().shape))
  d1 = env.physics
  rgba1 = np.asarray(smooth.mparam(m, d1, 'geom_rgba'))[self_geoms]
  hl = m.mat_rgba_by_name['self_highlight']
  assert np.abs(rgba1 - hl).max() < 0.2, rgba1
  # reset color (reward 0 at episode start) differs from highlight
  assert np.abs(rgba0 - rgba1).max() > 0.1
  # plain load leaves colors static
  env2 = suite.load('cartpole', 'balance', task_kwargs={'random': 0})
  env2.reset()
  assert 'geom_rgba' not in (env2.physics.model_var or {})
