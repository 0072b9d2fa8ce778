"""Narrowphase collision detection over static candidate pairs.

Replaces the reference's native collision stage (part of mj_step's pipeline,
driven from dm_control/mujoco/engine.py:153-171).  TPU design: the
candidate pair list is enumerated at build time (Model.collision_pairs,
grouped by geom-type pair); each narrowphase function is branch-free and
batched over its pair group; results are written into a fixed-size padded
Contact buffer (active rows flagged by dist < includemargin).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import math
from dm_control_tpu._src.types import (ConeType, Contact, Data, DisableBit,
                                       GeomType, Model)

# max contact points each type-pair collider can emit
_PAIR_NCON = {
    (GeomType.PLANE, GeomType.SPHERE): 1,
    (GeomType.PLANE, GeomType.CAPSULE): 2,
    (GeomType.PLANE, GeomType.CYLINDER): 4,
    (GeomType.PLANE, GeomType.ELLIPSOID): 1,
    (GeomType.PLANE, GeomType.BOX): 4,
    (GeomType.SPHERE, GeomType.SPHERE): 1,
    (GeomType.SPHERE, GeomType.CAPSULE): 1,
    (GeomType.SPHERE, GeomType.CYLINDER): 1,
    (GeomType.SPHERE, GeomType.ELLIPSOID): 1,
    (GeomType.SPHERE, GeomType.BOX): 1,
    (GeomType.CAPSULE, GeomType.CAPSULE): 2,
    (GeomType.CAPSULE, GeomType.CYLINDER): 2,
    (GeomType.CAPSULE, GeomType.ELLIPSOID): 1,
    (GeomType.CAPSULE, GeomType.BOX): 2,
    (GeomType.ELLIPSOID, GeomType.ELLIPSOID): 1,
    (GeomType.ELLIPSOID, GeomType.BOX): 1,
    (GeomType.CYLINDER, GeomType.CYLINDER): 2,
    (GeomType.CYLINDER, GeomType.BOX): 4,
    (GeomType.BOX, GeomType.BOX): 8,
}


def _pair_entries(m: Model):
  """Flat list of (g1, g2, pairinfo, ncon_for_pair)."""
  out = []
  if m.collision_pairs is None:
    return out
  for (t1, t2), lst in m.collision_pairs.items():
    key = (GeomType(t1), GeomType(t2))
    if key not in _PAIR_NCON:
      raise NotImplementedError(f'collider for {key}')
    n = _PAIR_NCON[key]
    for g1, g2, p in lst:
      out.append((g1, g2, p, n))
  return out


def count_max_contacts(m: Model) -> int:
  # Contacts are also moot when the whole constraint solver is disabled
  # (e.g. fish/acrobot set constraint=disable): no forces can result.
  if m.opt.disableflags & (DisableBit.CONTACT | DisableBit.CONSTRAINT):
    return 0
  return sum(e[3] for e in _pair_entries(m))


def count_contact_rows(m: Model) -> int:
  """Total efc rows contributed by contacts (from the static layout)."""
  from dm_control_tpu._src import efc
  lay = efc.layout(m)
  return lay.nefc - lay.n_noncontact


def _pair_condim(m: Model, g1: int, g2: int) -> int:
  p1, p2 = m.geom_priority[g1], m.geom_priority[g2]
  if p1 != p2:
    return int(m.geom_condim[g1 if p1 > p2 else g2])
  return int(max(m.geom_condim[g1], m.geom_condim[g2]))


def collide(m: Model, d: Data) -> Data:
  """Run all narrowphase colliders; fill the padded Contact buffer."""
  ncon = count_max_contacts(m)
  if ncon == 0:
    return d
  from dm_control_tpu._src import colliders
  return colliders.collide_all(m, d)
