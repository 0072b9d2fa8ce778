"""Named indexing API (reference mujoco/index.py semantics)."""

import numpy as np

from dm_control_tpu._src import engine, named
from dm_control_tpu.suite import common


def test_named_indexing():
  m = engine.load_model(common.model_path('walker.xml'))
  d = engine.build_forward(m)(engine.make_data(m))
  nd = named.named_data(m, d)
  # ragged qpos by joint name
  rootz = nd.qpos['rootz']
  assert np.shape(rootz) == ()
  legs = nd.qvel[['right_hip', 'left_hip']]
  assert legs.shape == (2,)
  # body columns
  z = nd.xpos['torso', 'z']
  assert float(z) == float(np.asarray(d.xpos)[m.name2id('body', 'torso'), 2])
  # sensordata ragged by sensor name
  m2 = engine.load_model(common.model_path('cheetah.xml'))
  d2 = engine.build_forward(m2)(engine.make_data(m2))
  nd2 = named.named_data(m2, d2)
  sv = nd2.sensordata['torso_subtreelinvel']
  assert sv.shape == (3,)

  nm = named.named_model(m)
  hip_range = nm.jnt_range['right_hip']
  assert hip_range.shape == (2,)
  # model views are writable (host numpy)
  old = nm.geom_pos['torso', 'z']
  nm.geom_pos['torso', 'z'] = old + 1.0
  assert abs(nm.geom_pos['torso', 'z'] - (old + 1.0)) < 1e-12
  nm.geom_pos['torso', 'z'] = old
