"""bind(): element -> Model/Data row coupling (ref mjcf/physics.py:556)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dm_control_tpu._src import forward as _forward
from dm_control_tpu.mjcf import bind
from dm_control_tpu.mjcf.dom import RootElement


@pytest.fixture(scope='module')
def world():
  root = RootElement(model='bindtest')
  root.worldbody.add('geom', type='plane', size='5 5 .1', name='floor')
  box = root.worldbody.add('body', name='box', pos='0 0 1')
  box.add('joint', type='free', name='root')
  box.add('geom', type='box', size='.1 .1 .1', name='boxgeom', mass='1')
  box.add('site', name='tip', pos='0 0 .1')
  arm = root.worldbody.add('body', name='arm', pos='1 0 .5')
  arm.add('joint', type='hinge', name='hinge', axis='0 1 0',
          range='-1 1', limited='true')
  arm.add('geom', type='capsule', size='.05', fromto='0 0 0 0 0 .4',
          mass='.5', name='armgeom')
  root.section('actuator').add('motor', joint='hinge', name='act',
                               gear='1')
  m = root.compile()
  d = _forward.forward(m, _forward.make_data(m))
  return root, m, d


def test_model_reads(world):
  root, m, d = world
  geom = root.find('geom', 'boxgeom')
  b = bind(m, geom)
  np.testing.assert_allclose(np.asarray(b.size), [.1, .1, .1])
  assert b.element_id == int(m.names['geom']['boxgeom'])
  jb = bind(m, root.find('joint', 'hinge'))
  # MJCF default angle units are degrees; the compiler stores radians
  np.testing.assert_allclose(np.asarray(jb.range), np.deg2rad([-1, 1]))


def test_data_reads(world):
  root, m, d = world
  body = bind(m, root.find('body', 'box'), d)
  np.testing.assert_allclose(np.asarray(body.xpos), [0, 0, 1], atol=1e-12)
  site = bind(m, root.find('site', 'tip'), d)
  np.testing.assert_allclose(np.asarray(site.xpos), [0, 0, 1.1],
                             atol=1e-12)
  hinge = bind(m, root.find('joint', 'hinge'), d)
  assert np.shape(hinge.qpos) == ()  # single hinge dof, squeezed
  free = bind(m, root.find('joint', 'root'), d)
  assert np.shape(free.qpos) == (7,)
  assert np.shape(free.qvel) == (6,)


def test_multi_element_binding(world):
  root, m, d = world
  geoms = bind(m, [root.find('geom', 'boxgeom'),
                   root.find('geom', 'armgeom')], d)
  assert np.shape(geoms.xpos) == (2, 3)
  assert list(geoms.element_id) == [
      int(m.names['geom']['boxgeom']), int(m.names['geom']['armgeom'])]


def test_functional_data_write(world):
  root, m, d = world
  hinge = bind(m, root.find('joint', 'hinge'))
  d2 = hinge.update_data(d, qpos=0.5, qvel=-0.25)
  assert float(bind(m, 'hinge', d2, namespace='joint').qpos) == 0.5
  assert float(bind(m, 'hinge', d2, namespace='joint').qvel) == -0.25
  # original untouched (functional)
  assert float(bind(m, 'hinge', d, namespace='joint').qpos) == 0.0
  act = bind(m, 'act', namespace='actuator')
  d3 = act.update_data(d, ctrl=0.7)
  np.testing.assert_allclose(np.asarray(d3.ctrl), [0.7])


def test_functional_data_write_inside_jit(world):
  root, m, d = world
  hinge = bind(m, root.find('joint', 'hinge'))

  @jax.jit
  def set_and_step(d, v):
    d = hinge.update_data(d, qpos=v)
    return _forward.forward(m, d)

  d2 = set_and_step(d, jnp.asarray(0.3))
  assert abs(float(bind(m, 'hinge', d2, namespace='joint').qpos)
             - 0.3) < 1e-12


def test_model_override_write(world):
  root, m, d = world
  geom = bind(m, root.find('geom', 'boxgeom'))
  d2 = geom.update_model(d, rgba=[1, 0, 0, 1])
  assert 'geom_rgba' in d2.model_var
  np.testing.assert_allclose(
      np.asarray(bind(m, 'boxgeom', d2, namespace='geom').rgba),
      [1, 0, 0, 1])
  # overlay shadows, static model unchanged
  assert not np.allclose(np.asarray(m.geom_rgba[geom.element_id]),
                         [1, 0, 0, 1])


def test_in_place_assignment_raises(world):
  root, m, d = world
  b = bind(m, root.find('geom', 'boxgeom'), d)
  with pytest.raises(TypeError, match='update_data'):
    b.pos = [0, 0, 2]


def test_unknown_name_and_field(world):
  root, m, d = world
  with pytest.raises(KeyError):
    bind(m, 'nope', namespace='geom')
  with pytest.raises(AttributeError):
    _ = bind(m, 'boxgeom', namespace='geom').nonexistent_field
