"""Contact/constraint parity vs the MuJoCo CPU oracle.

Drops contact-rich models under gravity, then compares: detected contact
sets (matched by geom pair), constraint-row parameters (efc_D, efc_aref),
and the solved qacc / qfrc_constraint.
"""

import functools

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dm_control_tpu._src import engine
from dm_control_tpu._src import forward as fwd

from conftest import SUITE_DIR

XMLS = ['hopper.xml', 'walker.xml', 'cheetah.xml', 'humanoid.xml']


@functools.lru_cache(maxsize=None)
def _models(xml):
  path = f'{SUITE_DIR}/{xml}'
  ref = mujoco.MjModel.from_xml_path(path)
  m = engine.load_model(path)
  fwd_fn = engine.build_forward(m)
  return ref, m, fwd_fn


def _settled_state(ref, n_steps=100, seed=0):
  """Drop from qpos0 with random ctrl until a contact-rich state is found."""
  rd = mujoco.MjData(ref)
  rng = np.random.RandomState(seed)
  for _ in range(n_steps):
    rd.ctrl[:] = rng.uniform(-1, 1, ref.nu)
    mujoco.mj_step(ref, rd)
  for _ in range(500):
    # rd.ncon reflects the pre-integration state; re-forward to check the
    # captured (post-step) coordinates actually have contacts.
    mujoco.mj_forward(ref, rd)
    if rd.ncon > 0:
      break
    rd.ctrl[:] = rng.uniform(-1, 1, ref.nu)
    mujoco.mj_step(ref, rd)
  return rd.qpos.copy(), rd.qvel.copy(), rng.uniform(-1, 1, ref.nu)


@pytest.mark.parametrize('xml', XMLS)
def test_contact_set(xml):
  ref, m, fwd_fn = _models(xml)
  qpos, qvel, ctrl = _settled_state(ref)
  rd = mujoco.MjData(ref)
  rd.qpos[:], rd.qvel[:], rd.ctrl[:] = qpos, qvel, ctrl
  mujoco.mj_forward(ref, rd)

  d = engine.make_data(m)
  d = fwd_fn(d.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
                       ctrl=jnp.asarray(ctrl)))

  # every oracle contact must appear in our active set with matching dist
  ours_active = {}
  con = d.contact
  for i in range(con.dist.shape[0]):
    if float(con.dist[i]) < float(con.includemargin[i]):
      key = (min(int(con.geom1[i]), int(con.geom2[i])),
             max(int(con.geom1[i]), int(con.geom2[i])))
      ours_active.setdefault(key, []).append(i)

  assert rd.ncon > 0, 'oracle found no contacts; test state is useless'
  for i in range(rd.ncon):
    g1, g2 = int(rd.contact.geom1[i]), int(rd.contact.geom2[i])
    key = (min(g1, g2), max(g1, g2))
    assert key in ours_active, f'{xml}: oracle contact {key} missing'
    dists = [float(con.dist[j]) for j in ours_active[key]]
    ref_dist = float(rd.contact.dist[i])
    assert min(abs(dv - ref_dist) for dv in dists) < 1e-6, (
        f'{xml}: contact {key} dist {dists} vs oracle {ref_dist}')


@pytest.mark.parametrize('xml', XMLS)
def test_qacc_with_contacts(xml):
  ref, m, fwd_fn = _models(xml)
  qpos, qvel, ctrl = _settled_state(ref)
  rd = mujoco.MjData(ref)
  rd.qpos[:], rd.qvel[:], rd.ctrl[:] = qpos, qvel, ctrl
  mujoco.mj_forward(ref, rd)

  d = engine.make_data(m)
  d = fwd_fn(d.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
                       ctrl=jnp.asarray(ctrl)))

  np.testing.assert_allclose(d.qacc_smooth, rd.qacc_smooth, atol=1e-6)
  err = np.abs(np.asarray(d.qacc) - rd.qacc)
  scale = np.maximum(1.0, np.abs(rd.qacc))
  assert (err / scale).max() < 5e-3, (
      f'{xml}: qacc rel err {(err / scale).max():.2e}\n'
      f'ours {np.asarray(d.qacc)}\nref  {rd.qacc}')


@pytest.mark.parametrize('xml', ['hopper.xml', 'walker.xml', 'cheetah.xml'])
def test_trajectory_with_contacts(xml):
  """Short-horizon trajectory parity through contact events."""
  ref, m, _ = _models(xml)
  step = engine.build_step(m)
  rd = mujoco.MjData(ref)
  rng = np.random.RandomState(1)
  d = engine.make_data(m)
  max_err = 0.0
  for t in range(100):
    ctrl = rng.uniform(-1, 1, ref.nu)
    rd.ctrl[:] = ctrl
    mujoco.mj_step(ref, rd)
    d = step(d.replace(ctrl=jnp.asarray(ctrl)))
    err = np.abs(np.asarray(d.qpos) - rd.qpos).max()
    max_err = max(max_err, err)
  assert max_err < 1e-3, f'{xml}: trajectory err {max_err:.2e}'
