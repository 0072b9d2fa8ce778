"""Duplo brick: interference-fit click physics (reference
entities/props/duplo/__init__.py + duplo_test.py semantics).

The defining property of the prop is that clicked bricks behave as one
rigid assembly until pulled apart with a force inside the reference's
empirical band (6..18 N, autotune.py DESIRED_FORCES), and that the fit
is an interference (solver) effect, not a weld.
"""

import jax
import numpy as np
import pytest

from dm_control_tpu.entities import duplo, duplo_utils
from dm_control_tpu._src import engine


@pytest.fixture(scope='module')
def sweep():
  # One compile, three lanes: hold at 1 N and 8 N, separate at 16 N.
  forces = [1.0, 8.0, 16.0]
  disp = duplo_utils.separation_displacements(
      duplo.STUD_RADIUS, forces, sim_seconds=1.0)
  return dict(zip(forces, disp))


def test_light_pull_stays_clicked(sweep):
  # 1 N is ~8x the brick's weight; a non-interlocking brick would fly.
  assert sweep[1.0] < 2e-3


def test_band_pull_stays_clicked(sweep):
  # 8 N is below the tuned ~10 N separation force.
  assert sweep[8.0] < duplo_utils.SEP_DISPLACEMENT


def test_strong_pull_separates(sweep):
  assert sweep[16.0] > duplo_utils.SEP_DISPLACEMENT


def test_free_stack_settles_clicked():
  # Both bricks free on the floor, top clicked onto bottom: after a
  # settle the stack keeps the clicked z-offset and stays aligned.
  m = duplo_utils.build_pair_scene(weld_bottom=False)
  d, top_q = duplo_utils.clicked_data(m)
  bot_q = int(m.jnt_qposadr[m.name2id('joint', 'bottom/bottom_root')])
  step = engine.build_step(m)

  def settle(d):
    d, _ = jax.lax.scan(lambda d, _: (step(d), None), d, None, length=400)
    return d

  d = jax.jit(settle)(d)
  top = np.asarray(d.qpos[top_q:top_q + 3])
  bot = np.asarray(d.qpos[bot_q:bot_q + 3])
  assert abs((top[2] - bot[2]) - duplo.STACK_DZ) < 1e-3
  assert np.linalg.norm(top[:2] - bot[:2]) < 1e-3


def test_site_layout():
  m = duplo_utils.build_pair_scene()
  studs, holes = duplo.corner_site_ids(m, 'top')
  d = engine.make_data(m)
  d = engine.build_forward(m)(d)
  sp = np.asarray(d.site_xpos[studs])
  hp = np.asarray(d.site_xpos[holes])
  np.testing.assert_allclose(sp[:, 2], duplo.STUD_Z, atol=1e-9)
  np.testing.assert_allclose(hp[:, 2], duplo.HOLE_Z, atol=1e-9)
  # corner separation: diagonal of the 2x4 grid
  assert np.linalg.norm(sp[0, :2] - sp[1, :2]) > 0.04
