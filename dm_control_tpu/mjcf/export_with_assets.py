"""Export a model (XML + referenced assets) to a directory or zip
(reference: mjcf/export_with_assets.py, export_with_assets_as_zip.py)."""

from __future__ import annotations

import os
import shutil
import xml.etree.ElementTree as ET
import zipfile


def _asset_files(root: ET.Element):
  for asset in root.findall('asset'):
    for el in asset:
      if 'file' in el.attrib:
        yield el


def export_with_assets(root: ET.Element, out_dir: str,
                       model_filename: str = 'model.xml',
                       base_dir: str = '.') -> str:
  """Write the model XML plus every referenced asset file into out_dir.

  Asset references are rewritten to local basenames; .npz mesh assets
  resolve transparently (the compiler's load_mesh prefers them)."""
  os.makedirs(out_dir, exist_ok=True)
  root = ET.fromstring(ET.tostring(root))  # deep copy
  comp = root.find('compiler')
  meshdir = comp.attrib.pop('meshdir', '') if comp is not None else ''
  for el in _asset_files(root):
    src = os.path.join(base_dir, meshdir, el.attrib['file'])
    base = os.path.splitext(src)[0]
    if not os.path.isfile(src) and os.path.isfile(base + '.npz'):
      src = base + '.npz'
    name = os.path.basename(src)
    if os.path.isfile(src):
      shutil.copyfile(src, os.path.join(out_dir, name))
    el.set('file', name)
  path = os.path.join(out_dir, model_filename)
  ET.ElementTree(root).write(path)
  return path


def export_with_assets_as_zip(root: ET.Element, out_path: str,
                              model_filename: str = 'model.xml',
                              base_dir: str = '.') -> str:
  """Same, as a single zip archive."""
  import tempfile
  with tempfile.TemporaryDirectory() as tmp:
    export_with_assets(root, tmp, model_filename, base_dir)
    if not out_path.endswith('.zip'):
      out_path += '.zip'
    with zipfile.ZipFile(out_path, 'w') as zf:
      for fn in sorted(os.listdir(tmp)):
        zf.write(os.path.join(tmp, fn), fn)
  return out_path
