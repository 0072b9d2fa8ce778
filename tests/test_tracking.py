"""Mocap reference-pose tracking tier (reference:
locomotion/tasks/reference_pose/tracking.py, mocap/loader.py).

Clips are generated from rollouts of the engine itself (physically
consistent references), so a tracking episode initialized on-clip must
hold near-zero termination error while replaying reference velocities.
"""

import xml.etree.ElementTree as ET

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dm_control_tpu._src import forward as _forward
from dm_control_tpu._src import setconst
from dm_control_tpu.locomotion import mocap, tracking, walkers
from dm_control_tpu.mjcf.compiler import MJCFCompiler


def _walker_root():
  """Ant walker + floor as one standalone model."""
  root = walkers._ant_xml()
  ET.SubElement(root, 'option', dict(timestep='0.01'))
  wb = root.find('worldbody')
  floor = ET.Element('geom', dict(name='floor', type='plane',
                                  size='10 10 0.1', friction='1 .5 .5'))
  wb.insert(0, floor)
  return root


@pytest.fixture(scope='module')
def setup():
  root = _walker_root()
  m = setconst.set_const(MJCFCompiler(root).build())
  d0 = _forward.forward(m, _forward.make_data(m))
  clip_a = mocap.from_rollout(m, d0, n_frames=40, every=2)
  d1 = d0.replace(qvel=d0.qvel.at[0].set(1.0))
  clip_b = mocap.from_rollout(m, d1, n_frames=25, every=2)
  clips = mocap.build_features(m, [clip_a, clip_b])
  return root, m, clips


def test_clip_collection_shapes(setup):
  root, m, clips = setup
  assert clips.n_clips == 2
  assert clips.max_length == 40
  assert list(clips.lengths) == [40, 25]
  assert clips.qpos.shape == (2, 40, m.nq)
  assert clips.body_pos.shape == (2, 40, m.nbody, 3)
  # padding repeats the last real frame
  np.testing.assert_array_equal(clips.qpos[1, 30], clips.qpos[1, 24])


def test_save_load_roundtrip(setup, tmp_path):
  _, _, clips = setup
  p = str(tmp_path / 'clips.npz')
  clips.save(p)
  back = mocap.ClipCollection.load(p)
  np.testing.assert_array_equal(back.qpos, clips.qpos)
  np.testing.assert_array_equal(back.lengths, clips.lengths)
  assert back.dt == clips.dt


def test_tracking_env_runs_and_terminates_on_clip_end(setup):
  root, m, clips = setup
  env = tracking.load(root, clips, random=3, min_steps=5,
                      ref_steps=(1, 2), always_init_at_clip_start=True)
  ts = env.reset()
  assert 'reference_rel_joints' in ts.observation
  assert ts.observation['reference_rel_joints'].shape == (2 * (m.nq - 7),)
  assert ts.observation['reference_rel_bodies_quats'].shape == (
      2 * (m.nbody - 1) * 4,)
  n = 0
  zero = np.zeros(m.nu)
  while True:
    ts = env.step(zero)
    n += 1
    assert np.isfinite(ts.reward)
    if ts.last() or n > 100:
      break
  assert ts.last(), 'episode must end at the clip end'
  assert n <= clips.max_length


def test_on_clip_tracking_low_error(setup):
  """Replaying the clip's own dynamics keeps termination error tiny and
  comic reward near its maximum (the clips ARE engine rollouts)."""
  root, m, clips = setup
  task = tracking.TrackingTask(root, clips, ref_steps=(1,),
                               min_steps=5,
                               always_init_at_clip_start=True)
  env = tracking.load(root, clips, random=0, min_steps=5, ref_steps=(1,),
                      always_init_at_clip_start=True)
  ts = env.reset()
  d = env.physics
  err0 = float(task.termination_error(task.model, d))
  assert err0 < 1e-6, f'on-clip init error {err0}'
  rewards = []
  for _ in range(8):
    ts = env.step(np.zeros(m.nu))
    rewards.append(ts.reward)
    if ts.last():
      break
  # comic reward is in [0, ~1.9]; on-clip replay should stay high
  assert np.mean(rewards) > 1.2, rewards


def test_random_start_and_clip_choice(setup):
  root, m, clips = setup
  env = tracking.load(root, clips, random=11, min_steps=5,
                      ref_steps=(1,))
  seen = set()
  for _ in range(6):
    env.reset()
    mv = env.physics.model_var
    seen.add((int(mv['_mocap_clip']), int(mv['_mocap_start'])))
  assert len(seen) > 1, 'episode inits must randomize clip/start'


def test_cmu_amc_tracking_pipeline():
  """parse_amc -> ClipCollection -> tracking env over the 56-DoF CMU
  humanoid (the reference's mocap flagship path)."""
  from dm_control_tpu.suite import common
  amc = common.model_path('zeros.amc')
  env = tracking.cmu_tracking([amc], dt=0.02, random=0, min_steps=2,
                              ref_steps=(1,),
                              always_init_at_clip_start=True,
                              termination_error_threshold=10.0)
  ts = env.reset()
  assert 'reference_rel_joints' in ts.observation
  nu = env.action_spec().shape[0]
  for _ in range(3):
    ts = env.step(np.zeros(nu))
    assert np.isfinite(ts.reward)
    if ts.last():
      break


def test_batched_tracking(setup):
  root, m, clips = setup
  env = tracking.load(root, clips, batch_size=4, min_steps=5,
                      ref_steps=(1,), time_limit=1.0)
  carry = env.reset(jax.random.PRNGKey(0))
  actions = jnp.zeros((4, m.nu))
  for _ in range(3):
    carry, (obs, reward, done) = env.step(carry, actions)
  assert reward.shape == (4,)
  assert obs['reference_rel_joints'].shape == (4, m.nq - 7)
  assert bool(jnp.all(jnp.isfinite(reward)))
