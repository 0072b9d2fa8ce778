"""Duplo measurement utilities (reference: entities/props/duplo/utils.py).

`separation_displacements` is the in-graph analog of the reference's
`measure_separation_force` harness (utils.py:39-95): a welded bottom
brick with a clicked free top brick, pulled upward with a constant
force; the bricks count as separated when the top brick rises more
than `SEP_DISPLACEMENT` above its clicked height within the simulated
window.  Force levels run as vmapped lanes so one compile measures the
whole sweep.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.composer import entity as entity_lib
from dm_control_tpu.entities import duplo
from dm_control_tpu._src import engine

TIMESTEP = 0.0005
SEP_DISPLACEMENT = 0.01


def build_pair_scene(stud_radius: float = duplo.STUD_RADIUS,
                     weld_bottom: bool = True):
  """Floor + bottom brick (welded by default) + free top brick."""
  root = ET.Element('mujoco')
  ET.SubElement(root, 'option', dict(timestep=str(TIMESTEP)))
  wb = ET.SubElement(root, 'worldbody')
  ET.SubElement(wb, 'geom', dict(name='floor', type='plane', size='1 1 0.1'))
  entity_lib.attach(root, duplo.duplo_entity(
      'bottom', stud_radius=stud_radius, free=not weld_bottom),
      prefix='bottom')
  entity_lib.attach(root, duplo.duplo_entity(
      'top', stud_radius=stud_radius), prefix='top')
  return engine.load_model_from_string(ET.tostring(root, encoding='unicode'))


def clicked_data(m, top_prefix='top', bottom_z=0.0):
  """Data with the top brick clicked onto the bottom one."""
  d = engine.make_data(m)
  top_q = int(m.jnt_qposadr[m.name2id('joint', f'{top_prefix}/{top_prefix}_root')])
  qpos = d.qpos.at[top_q + 2].set(bottom_z + duplo.STACK_DZ)
  qpos = qpos.at[top_q + 3].set(1.0)
  return engine.build_forward(m)(d.replace(qpos=qpos)), top_q


def separation_displacements(stud_radius, forces, sim_seconds=1.0):
  """Final rise of the top brick above its clicked height per force."""
  m = build_pair_scene(stud_radius)
  d0, top_q = clicked_data(m)
  top_b = m.name2id('body', 'top/top')
  step = engine.build_step(m)
  n = int(round(sim_seconds / TIMESTEP))

  def run(force):
    d = d0.replace(xfrc_applied=d0.xfrc_applied.at[top_b, 2].set(force))
    d, _ = jax.lax.scan(lambda d, _: (step(d), None), d, None, length=n)
    return d.qpos[top_q + 2]

  z = jax.jit(jax.vmap(run))(jnp.asarray(forces, d0.qpos.dtype))
  return np.asarray(z) - duplo.STACK_DZ
