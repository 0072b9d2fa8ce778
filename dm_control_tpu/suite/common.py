"""Model XML resolution for the Control Suite domains.

The MJCF model definitions are data assets.  They are resolved at build
time from, in order: an explicit override directory
($DM_CONTROL_TPU_SUITE_DIR), the reference checkout when present, or the
installed `dm_control` package's suite directory (a normal pip
dependency).  Procedural domains (cartpole k-poles, swimmer n-links)
generate their XML in code and need no files.
"""

from __future__ import annotations

import functools
import os
import xml.etree.ElementTree as ET

_CANDIDATE_DIRS = [
    os.environ.get('DM_CONTROL_TPU_SUITE_DIR'),
    '/root/reference/dm_control/suite',
]


@functools.lru_cache(maxsize=1)
def suite_dir() -> str:
  for d in _CANDIDATE_DIRS:
    if d and os.path.isdir(d):
      return d
  try:
    import dm_control.suite as _ref_suite
    return os.path.dirname(_ref_suite.__file__)
  except ImportError:
    raise FileNotFoundError(
        'No suite model directory found; set DM_CONTROL_TPU_SUITE_DIR')


def model_path(name: str) -> str:
  return os.path.join(suite_dir(), name)


def load_xml_root(name: str) -> ET.Element:
  """Parse a suite model with includes expanded (for procedural editing)."""
  from dm_control_tpu.mjcf import compiler as _compiler
  path = model_path(name)
  return _compiler._load_xml(path)
