"""Full-schema DOM coverage (VERDICT r4 item 5).

Reference model: mjcf/element_test.py + mjcf/schema.py — every element
context of the 148-element MJCF schema must be addable at its schema
position, serialize, and be findable; bad children/attributes/keywords
must fail at the DOM edit site with source attribution, while
unsupported-feature errors appear only at compile().
"""

import numpy as np
import pytest

from dm_control_tpu.mjcf import dom, schema
from dm_control_tpu.mjcf import schema_full


def _contexts():
  """Yield (path_tags, node) for every element context in the tree."""
  out = []

  def walk(node, path):
    out.append((path, node))
    for c in node[6]:
      walk(c, path + (node[0],))

  walk(schema_full.TREE, ())
  return out


_ALL = _contexts()


def test_tree_is_complete():
  assert len(_ALL) == 148
  tags = {n[0] for _, n in _ALL}
  # spot-check the far corners of the schema
  for tag in ('mujoco', 'lengthrange', 'fixed', 'spatial', 'cylinder',
              'muscle', 'framelinacc', 'weld', 'pair', 'key', 'bone'):
    assert tag in tags, tag


def _required_attrs(node):
  """Minimal attribute dict satisfying the context's required attrs."""
  out = {}
  for (name, typ, req, extra) in node[5]:
    if not req:
      continue
    if typ in ('float',):
      out[name] = '0'
    elif typ == 'int':
      out[name] = '0'
    elif typ == 'array':
      n = extra[1] or 1
      out[name] = ' '.join(['0'] * n)
    elif typ == 'keyword':
      out[name] = extra[0]
    else:
      out[name] = 'x'
  return out


@pytest.mark.parametrize(
    'path,node', [(p, n) for p, n in _ALL if p],
    ids=['/'.join(p + (n[0],)) for p, n in _ALL if p])
def test_every_element_context_is_authorable(path, node):
  """Each schema context can be built at its tree position, serializes,
  and is findable — the VERDICT done-criterion for PyMJCF generality."""
  root = dom.RootElement(model='full')
  el = root
  for tag in path[1:]:  # path[0] == 'mujoco' == the root itself
    el = (el.section(tag) if el is root and tag != 'worldbody'
          else el.find(tag) or el.add(tag))
  child = el.add(node[0], **_required_attrs(node))
  assert child.tag == node[0]
  xml = root.to_xml_string()
  assert f'<{node[0]}' in xml
  assert root.find(node[0]) is not None
  # round-trips through the parser
  again = dom.RootElement.from_xml_string(xml)
  assert again.find(node[0]) is not None


def test_unknown_child_rejected_at_edit_site():
  root = dom.RootElement()
  with pytest.raises(schema.SchemaError, match='not a valid child'):
    root.worldbody.add('option')
  with pytest.raises(schema.SchemaError, match='not a valid child'):
    root.section('option').add('geom')


def test_keyword_valid_values_enforced():
  root = dom.RootElement()
  with pytest.raises(schema.SchemaError, match='expected one of'):
    root.section('option').set('integrator', 'Eulerr')
  root.section('option').set('integrator', 'RK4')  # valid


def test_array_size_enforced():
  root = dom.RootElement()
  b = root.worldbody.add('body', name='b')
  with pytest.raises(schema.SchemaError, match='at most'):
    b.add('geom', type='sphere', size='1 2 3 4')  # size is at most 3


def test_bad_literal_rejected():
  root = dom.RootElement()
  with pytest.raises(schema.SchemaError, match='expected float'):
    root.worldbody.add('body', pos='zero zero one')


def test_deep_contexts_author_and_serialize():
  """A model touching many far-apart schema contexts in one document."""
  root = dom.RootElement(model='wide')
  root.section('compiler').add('lengthrange', mode='muscle')
  vis = root.section('visual')
  vis.add('quality', shadowsize='2048')
  vis.add('map', znear='0.01')
  d = root.section('default').add('default', **{'class': 'sub'})
  d.add('geom', rgba='1 0 0 1')
  root.section('custom').add('numeric', name='nine', data='9')
  t = root.section('tendon')
  sp = t.add('spatial', name='ten0')
  sp.add('site', site='s1')
  sp.add('pulley', divisor='2')
  root.section('actuator').add('cylinder', name='cyl0', joint='j')
  root.section('sensor').add('framelinacc', name='acc0',
                             objtype='body', objname='b')
  eq = root.section('equality')
  eq.add('weld', name='w0', body1='b')
  xml = root.to_xml_string()
  for tag in ('lengthrange', 'quality', 'map', 'pulley', 'cylinder',
              'framelinacc', 'weld', 'numeric'):
    assert f'<{tag}' in xml


def test_copier_semantics():
  """RootElement.copy / Element.clone+append: reference mjcf/copier.py."""
  root = dom.RootElement(model='orig')
  body = root.worldbody.add('body', name='b0', pos='0 0 1')
  body.add('geom', type='sphere', size='0.1', name='g0')

  dup = root.copy()
  dup.find('geom', 'g0').set('size', '0.5')
  assert root.find('geom', 'g0').get('size') == '0.1'  # no leak back

  clone = body.clone()
  clone.set('name', 'b1')
  root.worldbody.append(clone)
  assert root.find('body', 'b1') is not None
  assert root.find('body', 'b0') is not None
  # the clone's subtree is independent
  clone.find('geom', 'g0').set('name', 'g1')
  assert root.find('body', 'b0').find('geom', 'g0') is not None


def test_compile_time_errors_only_at_compile():
  """Authoring exotic elements succeeds; the engine's fail-fast happens
  at compile() (the reference compiles everything because it ships the
  native engine; our compiler rejects what it does not simulate)."""
  root = dom.RootElement(model='exotic')
  body = root.worldbody.add('body', name='b')
  body.add('geom', type='sphere', size='0.1')
  root.worldbody.add('composite', type='grid', count='3 3 1')
  with pytest.raises(Exception):
    root.compile()


def test_findable_namespaces_superset():
  ns = schema.findable_namespaces()
  for want in ('body', 'geom', 'joint', 'site', 'camera', 'actuator',
               'sensor', 'attachment_frame'):
    assert want in ns, want
