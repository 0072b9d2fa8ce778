"""Composer layer: entity attach, observation pipeline semantics, env loop.

The buffered-observation tests mirror the reference's deterministic
FakePhysics-based suite (dm_control/composer/observation/obs_buffer_test.py,
updater_test.py - SURVEY section 4.2) using counter observables.
"""

import collections

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dm_control_tpu import composer
from dm_control_tpu.composer.observation import (ObservableSpec,
                                                 ObservationPipeline)

_ARENA_XML = """
<mujoco model="arena">
  <option timestep="0.005"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 .1"/>
  </worldbody>
</mujoco>
"""

_BALL_XML = """
<mujoco model="ball">
  <worldbody>
    <body name="ball" pos="0 0 1">
      <freejoint/>
      <geom name="sphere" type="sphere" size=".1" mass="1"/>
      <site name="center"/>
    </body>
  </worldbody>
  <sensor><velocimeter name="vel" site="center"/></sensor>
</mujoco>
"""


def _build_task():
  arena = composer.Entity.from_xml_string(_ARENA_XML, name='arena')
  ball = composer.Entity.from_xml_string(_BALL_XML, name='ball')
  task = composer.ComposerTask(arena, control_timestep=0.02)
  task.attach(ball)
  m = task.compile()

  bid = m.name2id('body', 'ball/ball')
  task.add_observable('ball_height', ObservableSpec(
      fn=lambda mm, d: d.xpos[bid, 2]))
  task.add_observable('ball_height_buffered', ObservableSpec(
      fn=lambda mm, d: d.xpos[bid, 2], buffer_size=3))
  task.add_observable('ball_height_delayed', ObservableSpec(
      fn=lambda mm, d: d.xpos[bid, 2], delay=2))
  task.set_reward(lambda mm, d: d.xpos[bid, 2])
  return task, m, bid


def test_attach_prefixes_names_and_compiles():
  task, m, bid = _build_task()
  assert 'ball/ball' in m.names['body']
  assert 'ball/sphere' in m.names['geom']
  assert 'ball/vel' in m.names['sensor']
  assert m.nq == 7  # free joint from the attached entity


def test_composer_environment_steps_and_buffers():
  task, m, bid = _build_task()
  env = composer.Environment(task, time_limit=1.0, random=0)
  ts = env.reset()
  assert set(ts.observation) >= {
      'ball_height', 'ball_height_buffered', 'ball_height_delayed'}
  h0 = float(ts.observation['ball_height'])
  assert abs(h0 - 1.0) < 1e-6
  # delayed observable must still be hidden (zero) at reset
  assert float(ts.observation['ball_height_delayed']) == 0.0

  ts = env.step(np.zeros(0))
  h1 = float(ts.observation['ball_height'])
  assert h1 < h0  # ball is falling
  # buffered: (3,) history, newest last, padded with zeros at start
  buf = np.asarray(ts.observation['ball_height_buffered'])
  assert buf.shape == (3,)
  assert abs(buf[-1] - h1) < 1e-9
  # delayed by 2 substeps: now visible (4 substeps elapsed)
  assert float(ts.observation['ball_height_delayed']) > 0.0
  assert np.isfinite(ts.reward)


def test_pipeline_update_interval_semantics():
  """Counter observable sampled every 3rd substep only."""
  task, m, bid = _build_task()
  from dm_control_tpu._src import forward as fwd
  d = fwd.forward(m, fwd.make_data(m))

  counter = {'n': 0}
  pipeline = ObservationPipeline(
      m,
      {'every3': ObservableSpec(fn=lambda mm, dd: dd.time,
                                update_interval=3, buffer_size=4)},
      d)
  state = pipeline.init_state()
  key = jax.random.PRNGKey(0)
  for sub in range(7):
    dd = d.replace(time=jnp.asarray(float(sub), d.time.dtype))
    state = pipeline.update(state, dd, jnp.asarray(sub), key)
  # sampled at substeps 0, 3, 6 -> write_idx advanced 3 times
  assert int(state['every3']['write_idx']) == 3
  out = pipeline.read(state, jnp.asarray(6))
  vals = np.asarray(out['every3'])
  assert set(np.round(vals[vals != 0]).astype(int)) <= {0, 3, 6}
