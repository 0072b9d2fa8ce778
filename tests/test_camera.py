"""MovableCamera pose control + pixel->object selection (reference:
mujoco/engine.py:824-917 Camera.select / MovableCamera)."""

import numpy as np

from dm_control_tpu._src import engine, forward, render


_XML = """
<mujoco>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 .1"/>
    <body name="ball" pos="0 0 1">
      <freejoint/>
      <geom name="ball_geom" type="sphere" size="0.3" rgba="1 0 0 1"/>
    </body>
    <body name="post" pos="2 0 0.5">
      <geom name="post_geom" type="box" size=".1 .1 .5" rgba="0 1 0 1"/>
    </body>
  </worldbody>
</mujoco>
"""


def _scene():
  m = engine.load_model_from_string(_XML)
  d = forward.forward(m, forward.make_data(m))
  return m, d


def test_movable_camera_pose_roundtrip():
  m, _ = _scene()
  cam = render.MovableCamera(m, 32, 32)
  cam.set_pose((0.0, 0.0, 1.0), 5.0, 45.0, -20.0)
  lookat, dist, az, el = cam.get_pose()
  np.testing.assert_allclose(lookat, [0, 0, 1])
  assert (dist, az, el) == (5.0, 45.0, -20.0)


def test_movable_camera_renders_scene():
  m, d = _scene()
  cam = render.MovableCamera(m, 32, 48, lookat=(0, 0, 1), distance=4.0,
                             azimuth=180.0, elevation=-10.0)
  rgb = np.asarray(cam.render(d))
  assert rgb.shape == (32, 48, 3)
  assert rgb.std() > 0.01, 'scene must not be empty'
  seg = np.asarray(cam.render(d, segmentation=True))
  ball_g = m.name2id('geom', 'ball_geom')
  assert (seg == ball_g).any(), 'ball must be visible from the camera'
  # moving the camera changes the view
  cam.set_pose((0, 0, 1), 8.0, 90.0, -45.0)
  rgb2 = np.asarray(cam.render(d))
  assert np.abs(rgb - rgb2).max() > 0.05


def test_select_hits_the_ball():
  m, d = _scene()
  cam = render.MovableCamera(m, 64, 64, lookat=(0, 0, 1), distance=4.0,
                             azimuth=180.0, elevation=0.0)
  body, geom, pos = cam.select(d, (0.5, 0.5))
  assert int(geom) == m.name2id('geom', 'ball_geom')
  assert int(body) == m.name2id('body', 'ball')
  # hit point is on the sphere surface facing the camera
  np.testing.assert_allclose(np.asarray(pos)[2], 1.0, atol=0.05)
  assert np.linalg.norm(np.asarray(pos) - [0, 0, 1]) < 0.35


def test_select_background_returns_minus_one():
  m, d = _scene()
  cam = render.MovableCamera(m, 64, 64, lookat=(0, 0, 3), distance=2.0,
                             azimuth=0.0, elevation=45.0)  # sky
  body, geom, pos = cam.select(d, (0.5, 0.9))
  assert int(geom) == -1
  assert int(body) == -1


def test_fixed_camera_select_consistent_with_segmentation():
  m, d = _scene()
  # model has no <camera>; use an explicit free pose for both paths
  campose = render.free_camera_pose(
      np.array([0.0, 0.0, 1.0]), 4.0, 180.0, -10.0)
  camera = (campose[0], campose[1], 45.0 * np.pi / 180.0)
  seg = np.asarray(render.render(m, d, 33, 33, segmentation=True,
                                 camera=camera))
  cy, cx = 16, 16
  body, geom, _ = render.select(m, d, (0.5, 0.5), 33, 33, camera=camera)
  assert int(geom) == int(seg[cy, cx])


def test_mesh_geoms_render_and_raycast():
  """Mesh geoms trace their convex hulls (jaco arm is visible)."""
  import jax.numpy as jnp
  from dm_control_tpu.suite import common
  m = engine.load_model(common.model_path('jaco_j2s7s300_position.xml'))
  d = forward.forward(m, forward.make_data(m))
  cam = render.MovableCamera(m, 32, 48, lookat=(0, 0, 0.3), distance=2.0,
                             azimuth=45, elevation=-25)
  seg = np.asarray(cam.render(d, segmentation=True))
  mesh_geoms = [g for g in range(m.ngeom) if int(m.geom_type[g]) == 7]
  assert any((seg == g).any() for g in mesh_geoms)
  # a ray aimed at the arm base from above must hit at finite distance
  t = render.raycast(m, d, jnp.asarray([0.0, 0.0, 2.0]),
                     jnp.asarray([0.0, 0.0, -1.0]))
  assert 0 < float(t) < 2.5


_CAM_XML = """
<mujoco>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 .1"/>
    <body name="ball" pos="0 0 1">
      <joint name="slide" type="slide" axis="0 0 1"/>
      <geom name="ball_geom" type="sphere" size="0.3" rgba="1 0 0 1"/>
    </body>
    <camera name="fixed" pos="0 -3 1" xyaxes="1 0 0 0 0 1"/>
  </worldbody>
  <actuator><motor joint="slide"/></actuator>
</mujoco>
"""


def test_camera_observable_rgb_depth_segmentation():
  """First-class camera observables (reference MJCFCamera,
  composer/observation/observable/mjcf.py:110,207-222): rgb by camera
  name, depth, and (geom id, objtype) segmentation, all through the
  composer observation pipeline."""
  import jax
  from dm_control_tpu.composer.observation import (ObservationPipeline,
                                                   camera_observable)

  m = engine.load_model_from_string(_CAM_XML)
  d = forward.forward(m, forward.make_data(m))
  specs = {
      'pixels': camera_observable('fixed', height=24, width=32),
      'depth': camera_observable('fixed', height=24, width=32, depth=True),
      'seg': camera_observable(0, height=24, width=32, segmentation=True),
  }
  pipe = ObservationPipeline(m, specs, d)
  state = pipe.init_state()
  import jax.numpy as jnp
  state = pipe.update(state, d, jnp.zeros((), jnp.int32),
                      jax.random.PRNGKey(0))
  obs = pipe.read(state, jnp.zeros((), jnp.int32))
  assert obs['pixels'].shape == (24, 32, 3)
  assert obs['pixels'].dtype == np.float32
  assert float(obs['pixels'].min()) >= 0.0
  assert float(obs['pixels'].max()) <= 1.0
  assert obs['depth'].shape == (24, 32)
  # the camera looks at the ball 3m away; some finite depths exist
  finite = np.isfinite(np.asarray(obs['depth']))
  assert finite.any()
  assert obs['seg'].shape == (24, 32, 2)
  assert obs['seg'].dtype == np.int32
  seg = np.asarray(obs['seg'])
  ball_id = m.name2id('geom', 'ball_geom')
  assert (seg[..., 0] == ball_id).any()
  # background is (-1, -1); hits carry objtype mjOBJ_GEOM == 5
  assert (seg[seg[..., 0] >= 0][..., 1] == 5).all()
  assert (seg[seg[..., 0] < 0][..., 1] == -1).all()


def test_camera_observable_rejects_depth_and_segmentation():
  import pytest
  from dm_control_tpu.composer.observation import camera_observable
  with pytest.raises(ValueError, match='both'):
    camera_observable(0, depth=True, segmentation=True)
