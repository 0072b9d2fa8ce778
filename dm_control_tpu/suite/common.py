"""Model XML resolution for the Control Suite domains.

The MJCF model definitions ship WITH the framework
(dm_control_tpu/suite/assets/, regenerable by tools/vendor_assets.py:
canonically re-serialized XML + meshes re-encoded to the framework's
compressed .npz vertex/face format).  An explicit override directory
($DM_CONTROL_TPU_SUITE_DIR) takes precedence.  Procedural domains
(cartpole k-poles, swimmer n-links) generate their XML in code and need
no files.
"""

from __future__ import annotations

import functools
import os
import xml.etree.ElementTree as ET

_ASSETS_DIR = os.path.join(os.path.dirname(__file__), 'assets')

_CANDIDATE_DIRS = [
    os.environ.get('DM_CONTROL_TPU_SUITE_DIR'),
    _ASSETS_DIR,
]


@functools.lru_cache(maxsize=1)
def suite_dir() -> str:
  for d in _CANDIDATE_DIRS:
    if d and os.path.isdir(d):
      return d
  raise FileNotFoundError(
      'No suite model directory found; set DM_CONTROL_TPU_SUITE_DIR')


def model_path(name: str) -> str:
  return os.path.join(suite_dir(), name)


def load_xml_root(name: str) -> ET.Element:
  """Parse a suite model with includes expanded (for procedural editing)."""
  from dm_control_tpu.mjcf import compiler as _compiler
  path = model_path(name)
  return _compiler._load_xml(path)
