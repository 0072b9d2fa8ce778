"""Vendor the suite model assets into dm_control_tpu/suite/assets/.

XMLs are re-serialized through a canonical writer (sorted attributes,
normalized indentation, comments dropped) — the numeric content IS the
behavioral spec and is preserved verbatim.  Meshes are re-encoded from
STL into the framework's own compressed .npz vertex/face format
(deduplicated, float32).

Usage: python tools/vendor_assets.py [src_suite_dir] [dst_assets_dir]
"""

import os
import sys
import xml.etree.ElementTree as ET

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
from dm_control_tpu.mjcf import meshes as mesh_lib  # noqa: E402
from dm_control_tpu.mjcf import compiler as compiler_lib  # noqa: E402

XMLS = [
    'acrobot.xml', 'ball_in_cup.xml', 'cartpole.xml', 'cheetah.xml',
    'dog.xml', 'finger.xml', 'fish.xml', 'hopper.xml', 'humanoid.xml',
    'humanoid_CMU.xml', 'lqr.xml', 'manipulator.xml', 'pendulum.xml',
    'point_mass.xml', 'quadruped.xml', 'reacher.xml', 'stacker.xml',
    'swimmer.xml', 'walker.xml',
    'jaco_j2s7s300_position.xml', 'jaco_j2s6s300_position.xml',
    'common/materials.xml', 'common/skybox.xml', 'common/visual.xml',
    'common/texture_config.xml',
]
MESH_DIRS = ['dog_assets', 'common/kinova_meshes']

# locomotion walker models vendored from outside the suite tree:
# (absolute source path, destination name, tags to strip).  Skins and
# textures are render-only decoration the analytic raytracer does not
# consume; stripping them keeps the vendored models self-contained.
EXTRA_XMLS = [
    ('/root/reference/dm_control/locomotion/walkers/assets/rodent.xml',
     'rodent.xml', ('skin',)),
    # the V2019 CMU walker: the skeleton the reference's mocap HDF5
    # fixtures were fitted to (suite humanoid_CMU.xml is a rounded
    # variant whose FK drifts ~2.6 cm from the fitted tracks)
    ('/root/reference/dm_control/locomotion/walkers/assets/'
     'humanoid_CMU_V2019.xml',
     'humanoid_CMU_V2019.xml', ()),
    ('/root/reference/dm_control/locomotion/walkers/assets/jumping_ball/'
     'jumping_ball_with_head.xml',
     'jumping_ball_with_head.xml', ('texture', 'material')),
]


def strip_tags(root, tags):
  for parent in root.iter():
    for child in list(parent):
      if child.tag in tags:
        parent.remove(child)


def write_canonical(elem, f, depth=0):
  pad = '  ' * depth
  attrs = ''.join(f' {k}="{v}"' for k, v in sorted(elem.attrib.items()))
  kids = list(elem)
  if not kids and elem.text is None:
    f.write(f'{pad}<{elem.tag}{attrs}/>\n')
    return
  f.write(f'{pad}<{elem.tag}{attrs}>\n')
  for child in kids:
    if callable(getattr(child, 'tag', None)):  # comments / PIs
      continue
    write_canonical(child, f, depth + 1)
  f.write(f'{pad}</{elem.tag}>\n')


def main():
  src = sys.argv[1] if len(sys.argv) > 1 else (
      '/root/reference/dm_control/suite')
  dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
      os.path.dirname(__file__), '..', 'dm_control_tpu', 'suite', 'assets')
  os.makedirs(dst, exist_ok=True)

  for rel in XMLS:
    path = os.path.join(src, rel)
    if not os.path.isfile(path):
      print('skip (missing):', rel)
      continue
    root = compiler_lib._parse_xml_file(path)
    out = os.path.join(dst, rel)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, 'w') as f:
      write_canonical(root, f)
    print('xml:', rel)

  for path, name, tags in EXTRA_XMLS:
    if not os.path.isfile(path):
      print('skip (missing):', name)
      continue
    root = compiler_lib._parse_xml_file(path)
    strip_tags(root, tags)
    with open(os.path.join(dst, name), 'w') as f:
      write_canonical(root, f)
    print('xml:', name)

  for mdir in MESH_DIRS:
    sdir = os.path.join(src, mdir)
    if not os.path.isdir(sdir):
      continue
    ddir = os.path.join(dst, mdir)
    os.makedirs(ddir, exist_ok=True)
    n = 0
    for fn in sorted(os.listdir(sdir)):
      if not fn.lower().endswith('.stl'):
        continue
      verts, faces = mesh_lib.load_stl(os.path.join(sdir, fn))
      out = os.path.join(ddir, os.path.splitext(fn)[0] + '.npz')
      np.savez_compressed(out, verts=verts.astype(np.float32),
                          faces=faces.astype(np.int32))
      n += 1
    print(f'meshes: {mdir}: {n} converted')


if __name__ == '__main__':
  main()
