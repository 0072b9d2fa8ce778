"""PyMJCF-like authoring API: build/edit models in Python, then compile.

A deliberately small functional analog of dm_control.mjcf's element DOM
(reference mjcf/element.py:108-1336): elements support `add`, attribute
get/set, `find`/`find_all`, `attach` with namescope prefixing, and
`to_xml_string`; `compile()` produces the engine's static Model.  Unlike
the reference there is no bind()-style live physics coupling - models are
immutable after compilation (per-episode variation uses Data.model_var).

Example:
  root = RootElement(model='arena')
  root.worldbody.add('geom', type='plane', size='5 5 .1', name='floor')
  body = root.worldbody.add('body', name='box', pos='0 0 1')
  body.add('freejoint')
  body.add('geom', type='box', size='.1 .1 .1', name='geom0', mass='1')
  model = root.compile()
"""

from __future__ import annotations

from typing import List, Optional
import xml.etree.ElementTree as ET

from dm_control_tpu._src import setconst
from dm_control_tpu.mjcf import compiler as _compiler


def _format_value(value) -> str:
  """Python value -> MJCF attribute string (the typed-write half of the
  reference's attribute classes, mjcf/attribute.py:1-546)."""
  import numpy as np
  if isinstance(value, str):
    return value
  if isinstance(value, (bool, np.bool_)):
    return 'true' if value else 'false'
  if isinstance(value, (list, tuple, np.ndarray)):
    return ' '.join(_format_value(v) for v in np.asarray(value).ravel())
  if isinstance(value, (float, np.floating)):
    return repr(float(value))
  if isinstance(value, (int, np.integer)):
    return str(int(value))
  return str(value)


def _parse_value(kind: str, raw: str):
  """MJCF attribute string -> typed Python value by schema kind (the
  typed-read half: 'f' -> float/np.ndarray, 'i' -> int(s), 'b' -> bool,
  's'/keyword -> str)."""
  import numpy as np
  if kind == 'f':
    vals = [float(x) for x in raw.split()]
    return vals[0] if len(vals) == 1 else np.asarray(vals)
  if kind == 'i':
    vals = [int(x) for x in raw.split()]
    return vals[0] if len(vals) == 1 else np.asarray(vals)
  if kind == 'b':
    return raw == 'true'
  if kind == 'k' and raw in ('true', 'false'):  # boolean keywords
    return raw == 'true'
  return raw


class Element:
  """Thin mutable wrapper over an ElementTree node with typed attribute
  access: `geom.pos` parses to float/np.ndarray by schema kind, and
  `geom.pos = [0, 0, 1]` formats + validates (the role of the
  reference's typed attribute classes, mjcf/attribute.py).

  NOTE: every non-underscore Python attribute assignment on an Element
  is intercepted and schema-validated as an MJCF attribute write (so
  typos raise instead of silently creating Python attributes).  To hang
  incidental Python state off an Element, use an underscore-prefixed
  name."""

  def __init__(self, el: ET.Element):
    object.__setattr__(self, '_el', el)

  @property
  def tag(self) -> str:
    return self._el.tag

  def add(self, tag: str, **attrs) -> 'Element':
    """Add a child element, validated against the (parent, child)
    context of the full 148-element MJCF schema (reference semantics:
    mjcf/element.py add + schema.xml child tables)."""
    from dm_control_tpu.mjcf import schema
    attrs = {k.rstrip('_'): _format_value(v) for k, v in attrs.items()}
    schema.validate_element(tag, attrs, schema.caller_line(),
                            parent=self._el.tag)
    child = ET.SubElement(self._el, tag, attrs)
    return Element(child)

  def clone(self) -> 'Element':
    """Detached deep copy of this element (reference mjcf/copier.py)."""
    import copy as _copy
    return Element(_copy.deepcopy(self._el))

  def append(self, child: 'Element') -> 'Element':
    """Graft a (cloned or detached) element under this one, validated
    against the child-context schema."""
    from dm_control_tpu.mjcf import schema
    schema.validate_element(child.tag, dict(child._el.attrib),
                            schema.caller_line(), parent=self._el.tag)
    self._el.append(child._el)
    return child

  def get(self, attr: str, default=None):
    return self._el.attrib.get(attr, default)

  def set(self, attr: str, value) -> 'Element':
    from dm_control_tpu.mjcf import schema
    value = _format_value(value)
    schema.validate_element(self._el.tag, {attr: value},
                            schema.caller_line())
    self._el.set(attr, value)
    return self

  def __getattr__(self, name: str):
    # typed read: only reached when normal attribute lookup fails
    if name.startswith('_'):
      raise AttributeError(name)
    from dm_control_tpu.mjcf import schema
    attr = name.rstrip('_')
    specs = schema.attr_specs(self._el.tag)
    if attr not in specs:
      raise AttributeError(
          f'<{self._el.tag}> has no attribute {attr!r}')
    raw = self._el.attrib.get(attr)
    if raw is None:
      return None
    return _parse_value(specs[attr].kind, raw)

  def __setattr__(self, name: str, value):
    if name.startswith('_'):
      object.__setattr__(self, name, value)
    else:
      self.set(name.rstrip('_'), value)

  def remove(self, child: 'Element'):
    self._el.remove(child._el)

  def find(self, tag: str, name: Optional[str] = None) -> Optional['Element']:
    for el in self._el.iter(tag):
      if name is None or el.attrib.get('name') == name:
        return Element(el)
    return None

  def find_all(self, tag: str) -> List['Element']:
    return [Element(el) for el in self._el.iter(tag)]

  @property
  def children(self) -> List['Element']:
    return [Element(el) for el in list(self._el)]

  def to_xml_string(self) -> str:
    return ET.tostring(self._el, encoding='unicode')


class RootElement(Element):
  """A <mujoco> document root."""

  def __init__(self, model: str = 'unnamed'):
    root = ET.Element('mujoco', dict(model=model))
    ET.SubElement(root, 'worldbody')
    super().__init__(root)

  @classmethod
  def from_xml_string(cls, xml: str) -> 'RootElement':
    obj = cls.__new__(cls)
    Element.__init__(obj, ET.fromstring(xml))
    return obj

  @classmethod
  def from_xml_path(cls, path: str) -> 'RootElement':
    obj = cls.__new__(cls)
    Element.__init__(obj, _compiler._load_xml(path))
    return obj

  def copy(self) -> 'RootElement':
    """Independent deep copy of the whole document (the reference's
    mjcf/copier.py semantics: edits to the copy never leak back)."""
    import copy as _copy
    obj = type(self).__new__(type(self))
    Element.__init__(obj, _copy.deepcopy(self._el))
    return obj

  def __deepcopy__(self, memo):
    return self.copy()

  @property
  def worldbody(self) -> Element:
    wb = self._el.find('worldbody')
    if wb is None:
      wb = ET.SubElement(self._el, 'worldbody')
    return Element(wb)

  def section(self, tag: str) -> Element:
    """Get-or-create a top-level section (actuator, sensor, ...)."""
    sec = self._el.find(tag)
    if sec is None:
      sec = ET.SubElement(self._el, tag)
    return Element(sec)

  def attach(self, other: 'RootElement', prefix: str,
             site_body: Optional[str] = None,
             pos: Optional[str] = None) -> 'RootElement':
    """Graft another document under this one with name prefixing
    (the reference's attachment-frame semantics, mjcf/element.py:903)."""
    from dm_control_tpu.composer.entity import Entity, attach as _attach
    _attach(self._el, Entity(mjcf_root=other._el, name=prefix),
            prefix=prefix, site_body=site_body, pos=pos)
    return self

  def compile(self):
    """Compile to the engine's static Model."""
    m = _compiler.MJCFCompiler(self._el).build()
    return setconst.set_const(m)
