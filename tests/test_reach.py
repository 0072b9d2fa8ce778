"""TwoTouch reach task, TargetSphere prop, rescale/scaled actuators
(ref locomotion/tasks/reach.py, props/target_sphere.py, walkers/rescale.py,
walkers/scaled_actuators.py)."""

import xml.etree.ElementTree as ET

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dm_control_tpu.composer.entity import Entity
from dm_control_tpu.composer.environment import Environment
from dm_control_tpu.composer.task import ComposerTask
from dm_control_tpu.locomotion import props, rescale
from dm_control_tpu.mjcf.compiler import MJCFCompiler


# -- TargetSphere -----------------------------------------------------------

_ARENA = """
<mujoco model="arena">
  <option timestep="0.01"/>
  <worldbody>
    <geom type="plane" size="5 5 .1" name="floor"/>
  </worldbody>
</mujoco>
"""

_POKER = """
<mujoco model="poker">
  <worldbody>
    <body name="tip" pos="0 0 0.5">
      <joint type="slide" axis="1 0 0" name="slide" range="-2 2"/>
      <geom type="sphere" size=".05" mass="1" name="tipgeom"/>
    </body>
  </worldbody>
  <actuator><position joint="slide" kp="50" ctrlrange="-2 2"/></actuator>
</mujoco>
"""


def test_target_sphere_latches_on_touch():
  arena = Entity(mjcf_root=ET.fromstring(_ARENA), name='arena')
  poker = Entity(mjcf_root=ET.fromstring(_POKER), name='poker')
  target = props.TargetSphere(radius=0.3, height_above_ground=0.5,
                              name='target')
  target.install_hooks(['poker/tip'])
  task = ComposerTask(arena, control_timestep=0.05)
  task.attach(poker)
  task.attach(target)
  m = task.compile()
  target_g = m.name2id('geom', 'target/target')

  def init(m_, d, key):
    mv = dict(d.model_var or {})
    mv['geom_pos'] = jnp.asarray(m_.geom_pos, d.qpos.dtype).at[
        target_g, :2].set(jnp.asarray([1.0, 0.0], d.qpos.dtype))
    return d.replace(model_var=mv)

  task.add_init_hook(init)
  task.set_reward(lambda m_, d: target.activated(m_, d, 'target').astype(
      d.qpos.dtype))
  env = Environment(task, time_limit=3.0)
  env.reset()
  d0 = env._carry[0]
  assert not bool(target.activated(m, d0, 'target'))
  ts = None
  for _ in range(30):  # drive the tip onto the target at x=1
    ts = env.step(np.asarray([1.0]))
    if ts.reward and ts.reward > 0:
      break
  assert ts.reward == 1.0, 'target never activated'
  # latches: move away, stays activated (and recolors via model_var)
  ts = env.step(np.asarray([-1.0]))
  assert ts.reward == 1.0
  d = env._carry[0]
  rgba = np.asarray(d.model_var['geom_rgba'][target_g])
  np.testing.assert_allclose(rgba, [0, 0.7, 0, 1], atol=1e-6)


# -- TwoTouch ---------------------------------------------------------------

def test_two_touch_runs_and_state_machine_advances():
  from dm_control_tpu.locomotion import tasks
  env = tasks.two_touch(time_limit=1.0, random=0)
  ts = env.reset()
  assert 'task_state' in ts.observation
  assert 'target' in ts.observation
  spec = env.action_spec()
  for _ in range(5):
    ts = env.step(np.zeros(spec.shape))
    assert np.isfinite(ts.reward)
  st = np.asarray(env._carry[0].model_var['tt_state'])
  assert st.shape == (3,)


def test_two_touch_state_machine_logic():
  """Drive the trial machine directly with a synthetic 'touch' fn."""
  from dm_control_tpu.locomotion import tasks as _t
  # touch at t=0 -> TOUCHED_ONCE; touch at interval -> TOUCHED_TWICE
  # too-soon second touch -> TOUCHED_TOO_SOON
  # use the poker world: target at reachable x with slide actuator
  arena = Entity(mjcf_root=ET.fromstring(_ARENA), name='arena')
  poker = Entity(mjcf_root=ET.fromstring(_POKER), name='poker')
  target = props.TargetSphere(radius=0.3, height_above_ground=0.5,
                              name='target')
  target.install_hooks(['poker/tip'])
  task = ComposerTask(arena, control_timestep=0.1)
  task.attach(poker)
  task.attach(target)
  m = task.compile()
  d = None  # machine exercised via a tiny jitted driver below

  touch_interval, tol = 0.8, 0.1
  dtype = jnp.float64

  def machine(state, t0, touch, t):
    dt = t - t0
    in_pre = state < 0.5
    in_once = jnp.logical_and(state > 0.5, state < 1.5)
    to_once = jnp.logical_and(in_pre, touch)
    to_twice = jnp.logical_and(in_once, jnp.logical_and(
        touch, jnp.abs(dt - touch_interval) <= tol))
    to_soon = jnp.logical_and(in_once, jnp.logical_and(
        touch, dt < touch_interval - tol))
    new = jnp.where(to_once, 1.0, state)
    new = jnp.where(to_twice, 2.0, new)
    new = jnp.where(to_soon, 3.0, new)
    t0n = jnp.where(jnp.logical_or(to_once, jnp.logical_or(
        to_twice, to_soon)), t, t0)
    return new, t0n

  # correctly-timed double tap -> 2
  s, t0 = jnp.asarray(0.0), jnp.asarray(0.0)
  s, t0 = machine(s, t0, jnp.asarray(True), jnp.asarray(0.1))
  assert float(s) == 1.0
  s2, _ = machine(s, t0, jnp.asarray(True), jnp.asarray(0.9))
  assert float(s2) == 2.0
  # too-soon second tap -> 3
  s3, _ = machine(s, t0, jnp.asarray(True), jnp.asarray(0.3))
  assert float(s3) == 3.0


# -- rescale + scaled actuators ---------------------------------------------

def test_rescale_subtree_scales_pos_size_fromto():
  xml = ET.fromstring("""
  <mujoco><worldbody>
    <body name="a" pos="1 2 3">
      <geom type="capsule" size="0.1" fromto="0 0 0 0 0 1" name="g"/>
      <body name="b" pos="0 0 1">
        <geom type="sphere" size="0.2" pos="0.5 0 0" name="h"/>
      </body>
    </body>
  </worldbody></mujoco>""")
  rescale.rescale_subtree(xml.find('worldbody'), 2.0, 0.5)
  a = xml.find('.//body[@name="a"]')
  np.testing.assert_allclose(
      [float(x) for x in a.get('pos').split()], [2, 4, 6])
  g = xml.find('.//geom[@name="g"]')
  np.testing.assert_allclose(float(g.get('size')), 0.05)
  ft = [float(x) for x in g.get('fromto').split()]
  # midpoint (0,0,.5)*2 = (0,0,1); half (0,0,.5)*0.5 = (0,0,.25)
  np.testing.assert_allclose(ft, [0, 0, 0.75, 0, 0, 1.25])
  h = xml.find('.//geom[@name="h"]')
  np.testing.assert_allclose(
      [float(x) for x in h.get('pos').split()], [1, 0, 0])


def test_rescale_walker_mass_retarget():
  ent = Entity(mjcf_root=ET.fromstring(_POKER), name='p')
  rescale.rescale_walker(ent, 1.0, mass=5.0)
  import copy
  m = MJCFCompiler(copy.deepcopy(ent.mjcf_root)).build()
  assert abs(float(np.sum(np.asarray(m.body_mass))) - 5.0) < 1e-9


def test_scaled_position_actuator_tracks_qposrange():
  """ctrl=+1 must drive the joint to qposrange[1], ctrl=-1 to [0]
  (the reference's affine mapping, scaled_actuators_test.py logic)."""
  root = ET.fromstring("""
  <mujoco><option timestep="0.005"/><worldbody>
    <body name="b" pos="0 0 0">
      <joint type="slide" axis="1 0 0" name="j" damping="3"/>
      <geom type="sphere" size=".05" mass="1"/>
    </body>
  </worldbody></mujoco>""")
  rescale.add_position_actuator(root, 'joint', 'j',
                                qposrange=(0.2, 0.6), kp=100.0)
  from dm_control_tpu._src import engine, forward
  m = engine.load_model_from_element(root) if hasattr(
      engine, 'load_model_from_element') else None
  if m is None:
    from dm_control_tpu._src import setconst
    m = setconst.set_const(MJCFCompiler(root).build())
  step = engine.build_step(m)
  d = engine.build_forward(m)(engine.make_data(m))
  for target, ctrl in ((0.6, 1.0), (0.2, -1.0)):
    dd = d.replace(ctrl=jnp.asarray([ctrl], d.qpos.dtype))
    run = jax.jit(lambda x: jax.lax.fori_loop(
        0, 800, lambda i, s: step(s.replace(ctrl=dd.ctrl)), x))
    out = run(dd)
    assert abs(float(out.qpos[0]) - target) < 1e-2, (target, ctrl)
