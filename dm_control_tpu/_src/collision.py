"""Collision candidate management: static groups + top-K broadphase.

Replaces the reference's native broadphase/narrowphase stage (inside
mj_step's pipeline, dm_control/mujoco/engine.py:153-171).  TPU design:

  * Candidate pairs are enumerated at build time and grouped by
    (geom-type pair, condim, friction) so every group is one batched,
    branch-free narrowphase computation with static shapes.
  * Groups larger than `Option.broadphase_threshold` get a dynamic
    top-K broadphase: each step, the K most-overlapping candidate pairs
    (bounding-sphere / plane-halfspace test) are selected with lax.top_k
    and only those K run narrowphase.  This keeps dog-scale models
    (6k+ candidate pairs, <= ~12 simultaneously active) at a fixed small
    contact capacity instead of thousands of padded rows.
  * Selected-pair parameters (solref/solimp/margin/bodies) are gathers
    of static per-pair tables; condim and friction are uniform within a
    group by construction, so the efc row layout stays fully static.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

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
    (GeomType.SPHERE, GeomType.MESH): 1,
    (GeomType.PLANE, GeomType.MESH): 3,
    (GeomType.CAPSULE, GeomType.CAPSULE): 2,
    (GeomType.CAPSULE, GeomType.CYLINDER): 2,
    (GeomType.CAPSULE, GeomType.ELLIPSOID): 1,
    (GeomType.CAPSULE, GeomType.BOX): 2,
    (GeomType.CAPSULE, GeomType.MESH): 2,
    (GeomType.ELLIPSOID, GeomType.ELLIPSOID): 1,
    (GeomType.ELLIPSOID, GeomType.BOX): 1,
    (GeomType.ELLIPSOID, GeomType.CYLINDER): 1,
    (GeomType.CYLINDER, GeomType.CYLINDER): 2,
    (GeomType.CYLINDER, GeomType.BOX): 4,
    (GeomType.BOX, GeomType.BOX): 8,
    (GeomType.BOX, GeomType.MESH): 1,
    (GeomType.MESH, GeomType.MESH): 1,
    (GeomType.HFIELD, GeomType.SPHERE): 1,
    (GeomType.HFIELD, GeomType.CAPSULE): 2,
    (GeomType.HFIELD, GeomType.ELLIPSOID): 1,
    (GeomType.HFIELD, GeomType.CYLINDER): 4,
}


class PairGroup:
  """One batched narrowphase group (uniform type pair/condim/friction)."""

  def __init__(self, t1, t2, condim, friction, pairs, params, K):
    self.t1, self.t2 = t1, t2
    self.condim = condim
    self.friction = friction               # (5,) shared by the group
    self.g1 = np.asarray([p[0] for p in pairs], np.int32)
    self.g2 = np.asarray([p[1] for p in pairs], np.int32)
    self.npairs = len(pairs)
    self.K = K                             # selected pairs (== npairs static)
    self.dynamic = K < self.npairs
    self.ncon_per_pair = _PAIR_NCON[(t1, t2)]
    self.ncon = self.K * self.ncon_per_pair
    # per-pair static parameter tables (gathered when dynamic)
    self.solref = np.asarray([p['solref'] for p in params])
    self.solimp = np.asarray([p['solimp'] for p in params])
    self.margin = np.asarray([p['margin'] for p in params])
    self.gap = np.asarray([p['gap'] for p in params])


def groups(m: Model) -> List[PairGroup]:
  cached = m.__dict__.get('_pair_groups')
  if cached is not None:
    return cached
  out = _build_groups(m)
  m.__dict__['_pair_groups'] = out
  return out


def _build_groups(m: Model) -> List[PairGroup]:
  from dm_control_tpu._src import colliders
  if m.collision_pairs is None:
    return []
  if m.opt.disableflags & (DisableBit.CONTACT | DisableBit.CONSTRAINT):
    return []
  import os
  threshold = int(getattr(m.opt, 'broadphase_threshold', 40))
  cap = int(getattr(m.opt, 'broadphase_cap', 20))
  # env overrides so reference-exact (all-static) layouts are
  # recoverable without editing suite code: 0 disables the top-K tier
  cap_env = os.environ.get('DMC_TPU_BROADPHASE_CAP')
  if cap_env is not None:
    cap = int(cap_env)
    if cap <= 0:
      threshold = 1 << 30

  keyed = {}
  for (t1, t2), lst in sorted(m.collision_pairs.items()):
    tp = (GeomType(t1), GeomType(t2))
    if tp not in _PAIR_NCON:
      raise NotImplementedError(f'collider for {tp}')
    for g1, g2, pairinfo in lst:
      condim, friction, solref, solimp, margin, gap = (
          colliders._combine_params(m, g1, g2, pairinfo))
      key = (tp, condim, tuple(np.asarray(friction, np.float64)))
      keyed.setdefault(key, []).append(
          ((g1, g2), dict(solref=solref, solimp=solimp,
                          margin=margin, gap=gap)))

  plane_cap = int(getattr(m.opt, 'broadphase_plane_cap', 0))
  plane_env = os.environ.get('DMC_TPU_PLANE_CAP')
  if plane_env is not None:
    plane_cap = int(plane_env)
  out = []
  for (tp, condim, friction), entries in sorted(
      keyed.items(), key=lambda kv: (kv[0][0][0], kv[0][0][1], kv[0][1])):
    pairs = [e[0] for e in entries]
    params = [e[1] for e in entries]
    if (tp[0] == GeomType.PLANE and plane_cap > 0
        and len(pairs) > plane_cap):
      # opt-in plane top-K: exact selection (plane broadphase scores are
      # the exact narrowphase distances) unless more than plane_cap
      # pairs are simultaneously within margin
      K = plane_cap
    else:
      K = len(pairs) if len(pairs) <= threshold else min(len(pairs), cap)
    out.append(PairGroup(tp[0], tp[1], condim,
                         np.asarray(friction), pairs, params, K))
  return out


def count_max_contacts(m: Model) -> int:
  return sum(g.ncon for g in groups(m))


def contact_slots(m: Model, ga: int, gb: int) -> np.ndarray:
  """Static Contact-buffer slot indices for geom pair (ga, gb).

  Valid only for pairs in non-top-K groups (their slot assignment is
  static).  Lets task code read contact state for a specific pair, e.g.
  ball-touch detection (reference soccer_ball.py:96-117 does this with
  host-side named contact queries).  Returns an empty array if the pair
  never collides; raises if the pair sits in a dynamic top-K group."""
  out = []
  base = 0
  want = {int(ga), int(gb)}
  for grp in groups(m):
    k, K = grp.ncon_per_pair, grp.K
    if grp.dynamic:
      if any({int(g1), int(g2)} == want
             for g1, g2 in zip(grp.g1, grp.g2)):
        raise ValueError(
            f'pair {want} is broadphase-selected dynamically; its contact '
            f'slots are not static')
      base += K * k
      continue
    for i, (g1, g2) in enumerate(zip(grp.g1, grp.g2)):
      if {int(g1), int(g2)} == want:
        out.extend(range(base + i * k, base + (i + 1) * k))
    base += K * k
  return np.asarray(out, np.int32)


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
  if count_max_contacts(m) == 0:
    return d
  from dm_control_tpu._src import colliders
  return colliders.collide_all(m, d)
