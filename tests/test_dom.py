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
