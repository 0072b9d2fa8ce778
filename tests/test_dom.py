"""PyMJCF-like DOM: author, attach, compile, simulate."""

import numpy as np

import jax

from dm_control_tpu._src import engine, forward as fwd
from dm_control_tpu.mjcf.dom import RootElement


def test_author_and_simulate():
  root = RootElement(model='scene')
  root.worldbody.add('geom', type='plane', size='5 5 .1', name='floor')
  body = root.worldbody.add('body', name='box', pos='0 0 1')
  body.add('freejoint')
  body.add('geom', type='sphere', size='.1', name='ball', mass='1')
  m = root.compile()
  assert m.nq == 7 and m.ngeom == 2
  d = fwd.forward(m, fwd.make_data(m))
  step = engine.build_step(m)
  for _ in range(300):
    d = step(d)
  # ball fell and rests on the plane (z ~ radius)
  z = float(d.qpos[2])
  assert 0.05 < z < 0.15, f'ball rest height {z}'


def test_attach_with_prefix():
  arena = RootElement(model='arena')
  arena.worldbody.add('geom', type='plane', size='5 5 .1', name='floor')
  prop = RootElement(model='prop')
  b = prop.worldbody.add('body', name='root', pos='0 0 .5')
  b.add('freejoint')
  b.add('geom', type='box', size='.05 .05 .05', name='geom', mass='.1')
  arena.attach(prop, prefix='prop0')
  arena.attach(prop, prefix='prop1', pos='1 0 .5')
  m = arena.compile()
  assert 'prop0/root' in m.names['body']
  assert 'prop1/root' in m.names['body']
  assert m.nq == 14


def test_find_and_edit():
  root = RootElement.from_xml_string("""
  <mujoco><worldbody>
    <body name="b"><joint name="j" type="hinge"/>
      <geom name="g" type="sphere" size=".1" mass="1"/></body>
  </worldbody></mujoco>""")
  g = root.find('geom', 'g')
  assert g.get('size') == '.1'
  g.set('size', '.2')
  m = root.compile()
  assert abs(m.geom_size[m.name2id('geom', 'g'), 0] - 0.2) < 1e-12


def test_schema_validation():
  """Schema-validated DOM edits with source attribution
  (reference mjcf/schema.py + debugging.py roles)."""
  import pytest
  from dm_control_tpu.mjcf import dom
  from dm_control_tpu.mjcf.schema import SchemaError
  root = dom.RootElement(model='m')
  body = root.worldbody.add('body', name='b', pos='0 0 1')
  with pytest.raises(SchemaError) as e:
    body.add('geom', typ='sphere')        # typo'd attribute
  assert 'typ' in str(e.value) and 'test_dom' in str(e.value)
  with pytest.raises(SchemaError):
    body.add('geoom', type='sphere')      # unknown element
  with pytest.raises(SchemaError):
    body.add('geom', type='sphere', size='abc')  # bad float
  body.add('geom', type='sphere', size='0.1', name='ok')


def test_export_with_assets(tmp_path):
  import os
  from dm_control_tpu.mjcf import compiler as c
  from dm_control_tpu.mjcf.export_with_assets import (
      export_with_assets, export_with_assets_as_zip)
  from dm_control_tpu.suite import common
  src = common.model_path('dog.xml')
  root = c._load_xml(src)
  out = export_with_assets(root, str(tmp_path / 'dog'),
                           base_dir=os.path.dirname(src))
  files = os.listdir(tmp_path / 'dog')
  assert 'model.xml' in files
  assert sum(f.endswith('.npz') or f.endswith('.stl') for f in files) > 100
  # exported model compiles
  m = c.compile_path(out)
  assert m.nv == 85
  z = export_with_assets_as_zip(root, str(tmp_path / 'dog.zip'),
                                base_dir=os.path.dirname(src))
  assert os.path.getsize(z) > 10000


def test_attach_with_defaults_scoping():
  """Defaults-aware attach (reference element_test.py attach-with-
  defaults cases): the child's unclassed defaults apply to the child's
  elements after attach, and do NOT leak onto the parent's elements."""
  import numpy as np
  from dm_control_tpu.mjcf.dom import RootElement

  parent = RootElement(model='parent')
  parent.worldbody.add('geom', name='floor', type='plane', size='5 5 .1')

  child = RootElement.from_xml_string("""
  <mujoco model='child'>
    <default>
      <geom friction='1.7 0.1 0.1' density='300'/>
      <default class='heavy'>
        <geom density='5000'/>
      </default>
    </default>
    <worldbody>
      <body name='prop'>
        <freejoint name='root'/>
        <geom name='light_geom' type='sphere' size='.05'/>
        <geom name='heavy_geom' class='heavy' type='sphere' size='.05'
              pos='0 0 .2'/>
      </body>
    </worldbody>
  </mujoco>""")

  parent.attach(child, prefix='kid')
  m = parent.compile()

  # child default applied through the namescoped class
  light = m.name2id('geom', 'kid/light_geom')
  heavy = m.name2id('geom', 'kid/heavy_geom')
  floor = m.name2id('geom', 'floor')
  assert abs(float(m.geom_friction[light, 0]) - 1.7) < 1e-12
  # nested class inherits the scoped parent chain and overrides
  # density: body mass = (300 + 5000) * sphere volume
  del heavy
  vol = 4.0 / 3.0 * np.pi * 0.05 ** 3
  prop_b = m.name2id('body', 'kid/prop')
  np.testing.assert_allclose(float(m.body_mass[prop_b]),
                             (300 + 5000) * vol, rtol=1e-6)
  # parent's floor does NOT see the child's friction default
  assert abs(float(m.geom_friction[floor, 0]) - 1.0) < 1e-12


def test_attach_defaults_no_reverse_leak():
  """The parent's unclassed defaults must not restyle the child
  (each side keeps its own default root)."""
  from dm_control_tpu.mjcf.dom import RootElement

  parent = RootElement.from_xml_string("""
  <mujoco model='parent'>
    <default><geom friction='0.2 0 0'/></default>
    <worldbody><geom name='floor' type='plane' size='5 5 .1'/></worldbody>
  </mujoco>""")
  child = RootElement.from_xml_string("""
  <mujoco model='child'>
    <default><geom friction='1.9 0 0'/></default>
    <worldbody>
      <body name='prop'>
        <geom name='ball' type='sphere' size='.05'/>
      </body>
    </worldbody>
  </mujoco>""")
  parent.attach(child, prefix='kid')
  m = parent.compile()
  assert abs(float(m.geom_friction[m.name2id('geom', 'floor'), 0])
             - 0.2) < 1e-12
  assert abs(float(m.geom_friction[m.name2id('geom', 'kid/ball'), 0])
             - 1.9) < 1e-12


def test_namescoped_find_identifiers():
  """find()/name2id accept the reference's namescope full_identifier
  convention ('prefix/name') after attach."""
  from dm_control_tpu.mjcf.dom import RootElement

  parent = RootElement(model='p')
  child = RootElement(model='c')
  body = child.worldbody.add('body', name='torso')
  body.add('geom', name='g0', type='sphere', size='.05')
  parent.attach(child, prefix='robot')
  assert parent.find('body', 'robot/torso') is not None
  assert parent.find('geom', 'robot/g0') is not None
  assert parent.find('geom', 'g0') is None


def test_widened_schema_accepts_reference_fragments():
  """Elements outside the compiler subset (visual tuning, custom
  numerics, muscle actuators) validate at authoring time."""
  from dm_control_tpu.mjcf import schema

  schema.validate_element('statistic', {'extent': '2'})
  schema.validate_element('numeric', {'name': 'n', 'data': '1 2 3'})
  schema.validate_element('muscle', {'name': 'm', 'joint': 'j',
                                     'timeconst': '0.01 0.04'})
  schema.validate_element('composite', {'type': 'grid', 'count': '5 5 1'})
  import pytest as _pytest
  with _pytest.raises(schema.SchemaError):
    schema.validate_element('muscle', {'name': 'm', 'bogus_attr': '1'})


def test_typed_attribute_access():
  """Typed attribute layer (reference mjcf/attribute.py): reads parse by
  schema kind, writes format+validate python values."""
  import numpy as np
  from dm_control_tpu.mjcf.dom import RootElement
  from dm_control_tpu.mjcf.schema import SchemaError

  root = RootElement(model='typed')
  g = root.worldbody.add('geom', type='box', size=[0.1, 0.2, 0.3],
                         name='g0', mass=1.5)
  # typed reads
  np.testing.assert_allclose(g.size, [0.1, 0.2, 0.3])
  assert g.mass == 1.5 and isinstance(g.mass, float)
  assert g.type == 'box'
  assert g.pos is None                 # valid attribute, unset
  # typed writes (attribute assignment)
  g.pos = np.array([0.0, 0.0, 1.0])
  np.testing.assert_allclose(g.pos, [0, 0, 1])
  b = root.worldbody.add('body', name='b0')
  j = b.add('joint', type='hinge', axis='0 1 0', limited=True)
  assert j.limited is True
  # invalid attribute name raises on read AND write
  import pytest
  with pytest.raises(AttributeError):
    _ = g.bogus_attr
  with pytest.raises(SchemaError):
    g.set('bogus_attr', 1.0)
  # bad value type for a float attr
  with pytest.raises(SchemaError):
    g.set('mass', 'not-a-number')
  # the typed edits compile
  g2 = root.worldbody.add('geom', type='plane', size=[5, 5, 0.1],
                          name='floor')
  del g2
  m = root.compile()
  import numpy as _np
  gi = m.name2id('geom', 'g0')
  _np.testing.assert_allclose(m.geom_pos[gi], [0, 0, 1])
