"""Composer round 2: variation DSL, initializers, batched composer env."""

import collections

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.composer import variation as var
from dm_control_tpu.composer.entity import Entity
from dm_control_tpu.composer.initializers import PropPlacer
from dm_control_tpu.composer.observation import ObservableSpec
from dm_control_tpu.composer.task import ComposerTask
from dm_control_tpu.composer.environment import BatchedEnvironment

_ARENA = """
<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 .1"/>
  </worldbody>
</mujoco>
"""

_PROP = """
<mujoco>
  <worldbody>
    <body name="prop">
      <freejoint name="prop_root"/>
      <geom name="prop_geom" type="sphere" size="0.05" density="500"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_variation_dsl():
  key = jax.random.PRNGKey(0)
  v = 2.0 * var.Uniform(0.0, 1.0) + 1.0
  x = var.evaluate(v, key)
  assert 1.0 <= float(x) <= 3.0
  n = var.Additive(var.Normal(0.0, 0.1))
  y = var.evaluate(n, key, initial_value=5.0)
  assert 4.0 < float(y) < 6.0
  q = var.UniformQuaternion()(key)
  assert abs(float(jnp.linalg.norm(q)) - 1.0) < 1e-6
  # composition is key-deterministic
  assert float(var.evaluate(v, key)) == float(var.evaluate(v, key))
  # biased random walk is pure over current_value
  w = var.BiasedRandomWalk(stdev=0.5, timescale=5)
  c = 0.0
  for i in range(10):
    c = float(w(jax.random.fold_in(key, i), current_value=c))
  assert np.isfinite(c)


def _build_task():
  task = ComposerTask(arena=Entity.from_xml_string(_ARENA, name='arena'),
                      control_timestep=0.01)
  prop = Entity.from_xml_string(_PROP, name='ball')
  task.attach(prop)
  m_probe = task.compile()
  adr = int(m_probe.jnt_qposadr[m_probe.name2id('joint', 'ball/prop_root')])
  placer = PropPlacer(
      [adr],
      position=(var.Uniform(-1.0, 1.0), var.Uniform(-1.0, 1.0), 0.06),
      max_attempts=8)
  task.add_init_hook(placer)
  task.add_observable('prop_pos', ObservableSpec(
      fn=lambda m, d: d.qpos[adr:adr + 3]))
  task.add_observable('prop_vel_delayed', ObservableSpec(
      fn=lambda m, d: d.qvel[0:3], delay=2, buffer_size=2,
      aggregator=lambda b: jnp.mean(b, axis=0)))
  task.set_reward(lambda m, d: jnp.asarray(1.0, d.qpos.dtype))
  return task, adr


def test_prop_placer_randomizes_and_batched_env_runs():
  task, adr = _build_task()
  env = BatchedEnvironment(task, batch_size=4, time_limit=1.0)
  carry = env.reset(jax.random.PRNGKey(3))
  d = carry[0]
  xy = np.asarray(d.qpos[:, adr:adr + 2])
  # independent per-lane placements
  assert np.unique(np.round(xy, 6), axis=0).shape[0] == 4
  nu = env._model.nu
  for _ in range(3):
    carry, (obs, reward, done) = env.step(
        carry, jnp.zeros((4, max(nu, 1)))[:, :nu])
  assert obs['prop_pos'].shape == (4, 3)
  assert bool(jnp.isfinite(obs['prop_pos']).all())
  assert reward.shape == (4,)
