"""SAC learner: shapes, one fused train step, checkpoint roundtrip."""

import numpy as np

import jax
import jax.numpy as jnp

from dm_control_tpu import suite
from dm_control_tpu.parallel.runner import BatchedEnv
from dm_control_tpu.rl import sac as sac_lib
from dm_control_tpu.utils import checkpoint


def test_sac_train_step_runs():
  task = suite.build_task('pendulum', 'swingup')
  env = BatchedEnv(task, 8, time_limit=2.0, auto_reset=True)
  cfg = sac_lib.SACConfig(hidden=(32, 32), replay_capacity=1024,
                          learn_batch=32)
  sac = sac_lib.SAC(task, cfg)
  state = sac.init(jax.random.PRNGKey(0))
  run_state = env.reset(jax.random.PRNGKey(1))
  replay = sac_lib.replay_init(cfg.replay_capacity, sac.obs_dim,
                               sac.act_dim, dtype=run_state.data.qpos.dtype)
  train = jax.jit(sac_lib.make_train_step(sac, env))
  carry = (state, run_state, replay, jax.random.PRNGKey(2))
  for _ in range(3):
    carry, metrics = train(carry)
  state2 = carry[0]
  assert int(state2.step) == 3
  for k, v in metrics.items():
    assert np.isfinite(float(v)), f'{k} not finite'
  # params actually changed
  delta = jax.tree_util.tree_reduce(
      lambda acc, x: acc + float(jnp.sum(jnp.abs(x))),
      jax.tree_util.tree_map(lambda a, b: a - b, state.actor, state2.actor),
      0.0)
  assert delta > 0


def test_checkpoint_roundtrip(tmp_path):
  task = suite.build_task('pendulum', 'swingup')
  env = BatchedEnv(task, 4, auto_reset=True)
  state = env.reset(jax.random.PRNGKey(0))
  path = str(tmp_path / 'ck.npz')
  checkpoint.save(path, state)
  restored = checkpoint.restore(path, state)
  np.testing.assert_array_equal(np.asarray(state.data.qpos),
                                np.asarray(restored.data.qpos))
