"""Core typed containers: enums, Option, Model (static), Data (state pytree).

Design (SURVEY.md section 7 "Architecture stance"):

  * `Model` replaces the reference's native mjModel (compiled by
    dm_control/mujoco/wrapper/core.py:300-364 via mj_loadXML): a frozen host
    object of numpy arrays + Python ints, produced once at build time by
    `dm_control_tpu.mjcf.compile_*`.  It is deliberately NOT a JAX pytree:
    engine functions close over it, so every field is baked into the XLA
    graph as a constant and all shapes/trees are static.  Domain
    randomization over selected physics parameters is exposed separately
    (runtime override pytrees) so topology stays static.

  * `Data` replaces mjData (reference dm_control/mujoco/wrapper/core.py:617):
    a pure JAX pytree of arrays, batchable with `vmap`, carrying the
    minimal integration state (qpos, qvel, act, time) plus all derived
    quantities filled in by `forward` so task code can read them the way
    reference task code reads `physics.named.data.*`.

Field names intentionally follow the well-known MuJoCo nomenclature (qpos,
xpos, cdof, ...) — this is an API-surface compatibility choice for users
coming from the reference, not a code translation.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


# ---------------------------------------------------------------------------
# Enums (integer-valued, stored in numpy arrays inside Model).
# ---------------------------------------------------------------------------


class JointType(enum.IntEnum):
  FREE = 0
  BALL = 1
  SLIDE = 2
  HINGE = 3


# dofs / qpos entries contributed by each joint type
JOINT_NV = {JointType.FREE: 6, JointType.BALL: 3, JointType.SLIDE: 1,
            JointType.HINGE: 1}
JOINT_NQ = {JointType.FREE: 7, JointType.BALL: 4, JointType.SLIDE: 1,
            JointType.HINGE: 1}


class GeomType(enum.IntEnum):
  PLANE = 0
  HFIELD = 1
  SPHERE = 2
  CAPSULE = 3
  ELLIPSOID = 4
  CYLINDER = 5
  BOX = 6
  MESH = 7


class Integrator(enum.IntEnum):
  EULER = 0
  RK4 = 1
  IMPLICIT = 2


class ConeType(enum.IntEnum):
  PYRAMIDAL = 0
  ELLIPTIC = 1


class SolverType(enum.IntEnum):
  PGS = 0
  CG = 1
  NEWTON = 2


class DynType(enum.IntEnum):
  NONE = 0
  INTEGRATOR = 1
  FILTER = 2
  FILTEREXACT = 3
  MUSCLE = 4


class GainType(enum.IntEnum):
  FIXED = 0
  AFFINE = 1
  MUSCLE = 2


class BiasType(enum.IntEnum):
  NONE = 0
  AFFINE = 1
  MUSCLE = 2


class TrnType(enum.IntEnum):
  JOINT = 0
  JOINTINPARENT = 1
  SLIDERCRANK = 2
  TENDON = 3
  SITE = 4
  BODY = 5


class WrapType(enum.IntEnum):
  JOINT = 0      # fixed tendon: joint entry
  SITE = 1       # spatial tendon: site via-point
  SPHERE = 2     # spatial tendon: wrapping sphere geom
  CYLINDER = 3   # spatial tendon: wrapping cylinder geom
  PULLEY = 4


class SensorType(enum.IntEnum):
  TOUCH = 0
  ACCELEROMETER = 1
  VELOCIMETER = 2
  GYRO = 3
  FORCE = 4
  TORQUE = 5
  MAGNETOMETER = 6
  RANGEFINDER = 7
  JOINTPOS = 8
  JOINTVEL = 9
  TENDONPOS = 10
  TENDONVEL = 11
  ACTUATORPOS = 12
  ACTUATORVEL = 13
  ACTUATORFRC = 14
  BALLQUAT = 15
  BALLANGVEL = 16
  FRAMEPOS = 17
  FRAMEQUAT = 18
  FRAMEXAXIS = 19
  FRAMEYAXIS = 20
  FRAMEZAXIS = 21
  FRAMELINVEL = 22
  FRAMEANGVEL = 23
  FRAMELINACC = 24
  FRAMEANGACC = 25
  SUBTREECOM = 26
  SUBTREELINVEL = 27
  SUBTREEANGMOM = 28
  CLOCK = 29


class ObjType(enum.IntEnum):
  """Object type for sensors attached via objtype/objid."""
  BODY = 0
  XBODY = 1
  JOINT = 2
  GEOM = 3
  SITE = 4
  CAMERA = 5
  TENDON = 6
  ACTUATOR = 7


class EqType(enum.IntEnum):
  CONNECT = 0
  WELD = 1
  JOINT = 2
  TENDON = 3


class DisableBit(enum.IntFlag):
  """Option disable bits (numbering matches the oracle's mjtDisableBit)."""
  CONSTRAINT = 1 << 0
  EQUALITY = 1 << 1
  FRICTIONLOSS = 1 << 2
  LIMIT = 1 << 3
  CONTACT = 1 << 4
  SPRING = 1 << 5
  DAMPER = 1 << 6
  GRAVITY = 1 << 7
  CLAMPCTRL = 1 << 8
  WARMSTART = 1 << 9
  FILTERPARENT = 1 << 10
  ACTUATION = 1 << 11
  REFSAFE = 1 << 12
  SENSOR = 1 << 13
  EULERDAMP = 1 << 15
  PASSIVE = SPRING | DAMPER


# ---------------------------------------------------------------------------
# Pytree dataclass helper.
# ---------------------------------------------------------------------------


def pytree_dataclass(cls):
  """Register a dataclass as a JAX pytree (all fields are leaves)."""
  cls = dataclasses.dataclass(frozen=True)(cls)
  fields = [f.name for f in dataclasses.fields(cls)]
  jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
  cls.replace = dataclasses.replace
  return cls


# ---------------------------------------------------------------------------
# Option: simulation options (host-static).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True, eq=False)
class Option:
  """Simulation options (reference: mjOption / MJCF <option>)."""
  timestep: float = 0.002
  gravity: Tuple[float, float, float] = (0.0, 0.0, -9.81)
  wind: Tuple[float, float, float] = (0.0, 0.0, 0.0)
  magnetic: Tuple[float, float, float] = (0.0, -0.5, 0.0)
  density: float = 0.0
  viscosity: float = 0.0
  integrator: Integrator = Integrator.EULER
  cone: ConeType = ConeType.PYRAMIDAL
  solver: SolverType = SolverType.NEWTON
  iterations: int = 100
  ls_iterations: int = 50
  tolerance: float = 1e-8
  ls_tolerance: float = 0.01
  impratio: float = 1.0
  disableflags: int = 0
  noslip_iterations: int = 0
  noslip_tolerance: float = 1e-6
  # top-K broadphase (TPU static-shape analog of the reference's dynamic
  # broadphase): candidate-pair groups larger than the threshold only
  # narrowphase their `cap` most-overlapping pairs each step.
  broadphase_threshold: int = 40
  broadphase_cap: int = 20
  # opt-in top-K for PLANE contact groups (0 = off: plane groups stay
  # static).  Body-vs-floor candidate sets dominate humanoid-class efc
  # layouts (16 plane-capsule pairs -> 128 of humanoid's 200 rows) while
  # only a few touch the floor at once; capping them is exact whenever
  # <= cap pairs are simultaneously within margin (the plane broadphase
  # score is the exact narrowphase distance)
  broadphase_plane_cap: int = 0
  # o_margin / o_solref / o_solimp defaults for pair overrides
  o_margin: float = 0.0
  o_solref: Tuple[float, float] = (0.02, 1.0)
  o_solimp: Tuple[float, float, float, float, float] = (
      0.9, 0.95, 0.001, 0.5, 2.0)


# ---------------------------------------------------------------------------
# Model: static compiled model (host object, not a pytree).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(eq=False)
class Model:
  """Compiled model: numpy arrays + python ints; closed over by the engine.

  Hashable by identity so it can serve as a static jit argument.  All
  `*_adr`/`*_id`/type fields are plain numpy int arrays used for Python-level
  indexing at trace time.
  """

  # sizes ------------------------------------------------------------------
  nq: int = 0
  nv: int = 0
  nu: int = 0
  na: int = 0
  nbody: int = 1
  njnt: int = 0
  ngeom: int = 0
  nsite: int = 0
  ncam: int = 0
  ntendon: int = 0
  nwrap: int = 0
  nsensor: int = 0
  nsensordata: int = 0
  neq: int = 0
  nkey: int = 0
  nmocap: int = 0

  opt: Option = dataclasses.field(default_factory=Option)

  # qpos defaults ----------------------------------------------------------
  qpos0: np.ndarray = None          # (nq,)
  qpos_spring: np.ndarray = None    # (nq,)

  # bodies -----------------------------------------------------------------
  body_parentid: np.ndarray = None  # (nbody,) i4
  body_rootid: np.ndarray = None    # (nbody,) i4
  body_weldid: np.ndarray = None    # (nbody,) i4
  body_jntnum: np.ndarray = None    # (nbody,) i4
  body_jntadr: np.ndarray = None    # (nbody,) i4
  body_dofnum: np.ndarray = None    # (nbody,) i4
  body_dofadr: np.ndarray = None    # (nbody,) i4
  body_geomnum: np.ndarray = None   # (nbody,) i4
  body_geomadr: np.ndarray = None   # (nbody,) i4
  body_pos: np.ndarray = None       # (nbody, 3)
  body_quat: np.ndarray = None      # (nbody, 4)
  body_ipos: np.ndarray = None      # (nbody, 3)
  body_iquat: np.ndarray = None     # (nbody, 4)
  body_mass: np.ndarray = None      # (nbody,)
  body_subtreemass: np.ndarray = None  # (nbody,)
  body_inertia: np.ndarray = None   # (nbody, 3)
  body_gravcomp: np.ndarray = None  # (nbody,)
  body_invweight0: np.ndarray = None  # (nbody, 2)
  body_mocapid: np.ndarray = None   # (nbody,) i4, -1 if not mocap

  # joints -----------------------------------------------------------------
  jnt_type: np.ndarray = None       # (njnt,) i4 JointType
  jnt_qposadr: np.ndarray = None    # (njnt,) i4
  jnt_dofadr: np.ndarray = None     # (njnt,) i4
  jnt_bodyid: np.ndarray = None     # (njnt,) i4
  jnt_limited: np.ndarray = None    # (njnt,) bool
  jnt_actfrclimited: np.ndarray = None  # (njnt,) bool
  jnt_pos: np.ndarray = None        # (njnt, 3)
  jnt_axis: np.ndarray = None       # (njnt, 3)
  jnt_stiffness: np.ndarray = None  # (njnt,)
  jnt_range: np.ndarray = None      # (njnt, 2)
  jnt_actfrcrange: np.ndarray = None  # (njnt, 2)
  jnt_margin: np.ndarray = None     # (njnt,)
  jnt_solref: np.ndarray = None     # (njnt, 2)
  jnt_solimp: np.ndarray = None     # (njnt, 5)
  jnt_springdamper: np.ndarray = None  # (njnt, 2) timeconst, dampratio

  # dofs -------------------------------------------------------------------
  dof_bodyid: np.ndarray = None     # (nv,) i4
  dof_jntid: np.ndarray = None      # (nv,) i4
  dof_parentid: np.ndarray = None   # (nv,) i4 (-1 at root)
  dof_armature: np.ndarray = None   # (nv,)
  dof_damping: np.ndarray = None    # (nv,)
  dof_frictionloss: np.ndarray = None  # (nv,)
  dof_solref: np.ndarray = None     # (nv, 2) friction loss solref
  dof_solimp: np.ndarray = None     # (nv, 5)
  dof_invweight0: np.ndarray = None  # (nv,)

  # geoms ------------------------------------------------------------------
  geom_type: np.ndarray = None      # (ngeom,) i4 GeomType
  geom_bodyid: np.ndarray = None    # (ngeom,) i4
  geom_contype: np.ndarray = None   # (ngeom,) i4
  geom_conaffinity: np.ndarray = None  # (ngeom,) i4
  geom_condim: np.ndarray = None    # (ngeom,) i4
  geom_priority: np.ndarray = None  # (ngeom,) i4
  geom_pos: np.ndarray = None       # (ngeom, 3)
  geom_quat: np.ndarray = None      # (ngeom, 4)
  geom_size: np.ndarray = None      # (ngeom, 3)
  geom_rbound: np.ndarray = None    # (ngeom,)
  geom_friction: np.ndarray = None  # (ngeom, 3)
  geom_margin: np.ndarray = None    # (ngeom,)
  geom_gap: np.ndarray = None       # (ngeom,)
  geom_solmix: np.ndarray = None    # (ngeom,)
  geom_solref: np.ndarray = None    # (ngeom, 2)
  geom_solimp: np.ndarray = None    # (ngeom, 5)
  geom_rgba: np.ndarray = None      # (ngeom, 4) for the built-in renderer
  geom_dataid: np.ndarray = None    # (ngeom,) i4 mesh asset id, -1 if none

  # mesh assets (host lists of numpy arrays; ragged across meshes) ----------
  mesh_vert: Any = None             # [nmesh] (nvert_i, 3)
  mesh_face: Any = None             # [nmesh] (nface_i, 3) i4
  mesh_hull: Any = None             # [nmesh] (nhull_i, 3) collision hull

  # heightfield assets -------------------------------------------------------
  nhfield: int = 0
  hfield_size: np.ndarray = None    # (nhfield, 4) x, y, z_top, z_bottom
  hfield_nrow: np.ndarray = None    # (nhfield,) i4
  hfield_ncol: np.ndarray = None    # (nhfield,) i4
  hfield_adr: np.ndarray = None     # (nhfield,) i4
  hfield_data: np.ndarray = None    # (sum nrow*ncol,) in [0, 1]

  # sites ------------------------------------------------------------------
  site_bodyid: np.ndarray = None    # (nsite,) i4
  site_pos: np.ndarray = None       # (nsite, 3)
  site_quat: np.ndarray = None      # (nsite, 4)
  site_size: np.ndarray = None      # (nsite, 3)
  site_type: np.ndarray = None      # (nsite,) i4

  # cameras (pose only; rendering is host-side) ----------------------------
  cam_bodyid: np.ndarray = None     # (ncam,) i4
  cam_pos: np.ndarray = None        # (ncam, 3)
  cam_quat: np.ndarray = None       # (ncam, 4)
  cam_mode: np.ndarray = None       # (ncam,) i4
  cam_fovy: np.ndarray = None       # (ncam,)

  # tendons ----------------------------------------------------------------
  tendon_adr: np.ndarray = None     # (ntendon,) i4 -> wrap_*
  tendon_num: np.ndarray = None     # (ntendon,) i4
  tendon_limited: np.ndarray = None  # (ntendon,) bool
  tendon_range: np.ndarray = None   # (ntendon, 2)
  tendon_margin: np.ndarray = None  # (ntendon,)
  tendon_stiffness: np.ndarray = None  # (ntendon,)
  tendon_damping: np.ndarray = None    # (ntendon,)
  tendon_frictionloss: np.ndarray = None  # (ntendon,)
  tendon_lengthspring: np.ndarray = None  # (ntendon, 2)
  tendon_length0: np.ndarray = None  # (ntendon,)
  tendon_solref_lim: np.ndarray = None  # (ntendon, 2)
  tendon_solimp_lim: np.ndarray = None  # (ntendon, 5)
  tendon_solref_fri: np.ndarray = None  # (ntendon, 2) friction-loss solref
  tendon_solimp_fri: np.ndarray = None  # (ntendon, 5)
  tendon_invweight0: np.ndarray = None  # (ntendon,)
  wrap_type: np.ndarray = None      # (nwrap,) i4 WrapType
  wrap_objid: np.ndarray = None     # (nwrap,) i4
  wrap_prm: np.ndarray = None       # (nwrap,)

  # actuators --------------------------------------------------------------
  actuator_trntype: np.ndarray = None  # (nu,) i4 TrnType
  actuator_dyntype: np.ndarray = None  # (nu,) i4 DynType
  actuator_gaintype: np.ndarray = None  # (nu,) i4 GainType
  actuator_biastype: np.ndarray = None  # (nu,) i4 BiasType
  actuator_trnid: np.ndarray = None  # (nu, 2) i4
  actuator_actadr: np.ndarray = None  # (nu,) i4 (-1 if stateless)
  actuator_actnum: np.ndarray = None  # (nu,) i4
  actuator_ctrllimited: np.ndarray = None  # (nu,) bool
  actuator_forcelimited: np.ndarray = None  # (nu,) bool
  actuator_actlimited: np.ndarray = None   # (nu,) bool
  actuator_dynprm: np.ndarray = None   # (nu, 10)
  actuator_gainprm: np.ndarray = None  # (nu, 10)
  actuator_biasprm: np.ndarray = None  # (nu, 10)
  actuator_ctrlrange: np.ndarray = None  # (nu, 2)
  actuator_forcerange: np.ndarray = None  # (nu, 2)
  actuator_actrange: np.ndarray = None   # (nu, 2)
  actuator_gear: np.ndarray = None     # (nu, 6)
  actuator_length0: np.ndarray = None  # (nu,)
  actuator_lengthrange: np.ndarray = None  # (nu, 2)
  actuator_acc0: np.ndarray = None     # (nu,)

  # equality constraints ---------------------------------------------------
  eq_type: np.ndarray = None        # (neq,) i4 EqType
  eq_obj1id: np.ndarray = None      # (neq,) i4
  eq_obj2id: np.ndarray = None      # (neq,) i4
  eq_active0: np.ndarray = None     # (neq,) bool
  eq_solref: np.ndarray = None      # (neq, 2)
  eq_solimp: np.ndarray = None      # (neq, 5)
  eq_data: np.ndarray = None        # (neq, 11)

  # sensors ----------------------------------------------------------------
  sensor_type: np.ndarray = None    # (nsensor,) i4 SensorType
  sensor_objtype: np.ndarray = None  # (nsensor,) i4 ObjType
  sensor_objid: np.ndarray = None   # (nsensor,) i4
  sensor_reftype: np.ndarray = None  # (nsensor,) i4
  sensor_refid: np.ndarray = None   # (nsensor,) i4
  sensor_adr: np.ndarray = None     # (nsensor,) i4
  sensor_dim: np.ndarray = None     # (nsensor,) i4
  sensor_cutoff: np.ndarray = None  # (nsensor,)

  # keyframes --------------------------------------------------------------
  key_time: np.ndarray = None       # (nkey,)
  key_qpos: np.ndarray = None       # (nkey, nq)
  key_qvel: np.ndarray = None       # (nkey, nv)
  key_act: np.ndarray = None        # (nkey, na)
  key_ctrl: np.ndarray = None       # (nkey, nu)

  # collision candidate pairs (precomputed at build time) ------------------
  # list of (geom1 ids, geom2 ids) grouped by (GeomType, GeomType) pair key.
  collision_pairs: Any = None

  # name -> id maps, per object kind ---------------------------------------
  names: Dict[str, Dict[str, int]] = dataclasses.field(default_factory=dict)

  # ancestry mask: body_dof_mask[b, i] = 1.0 if dof i is on path root->b.
  body_dof_mask: np.ndarray = None  # (nbody, nv) f8

  # model statistics (reference mjStatistic; filled by setconst)
  stat_meaninertia: float = 1.0

  def name2id(self, kind: str, name: str) -> int:
    return self.names[kind][name]

  def id2name(self, kind: str, idx: int) -> Optional[str]:
    for n, i in self.names.get(kind, {}).items():
      if i == idx:
        return n
    return None


# ---------------------------------------------------------------------------
# Contact + Data (pytrees).
# ---------------------------------------------------------------------------


@pytree_dataclass
class Contact:
  """Fixed-size contact buffer (padded; `dist > 0` rows may be inactive).

  Replaces the variable-length mjContact array (reference
  dm_control/mujoco/wrapper/core.py:747-757 exposes data.contact) with a
  static-shape, maskable structure: row i is active iff efc_active[i].
  """
  dist: jax.Array       # (ncon,) penetration (negative => touching)
  pos: jax.Array        # (ncon, 3)
  frame: jax.Array      # (ncon, 3, 3) rows: normal, tangent1, tangent2
  includemargin: jax.Array  # (ncon,)
  friction: jax.Array   # (ncon, 5)
  solref: jax.Array     # (ncon, 2)
  solimp: jax.Array     # (ncon, 5)
  geom1: jax.Array      # (ncon,) i4
  geom2: jax.Array      # (ncon,) i4
  body1: jax.Array      # (ncon,) i4 (traced: dynamic under top-K broadphase)
  body2: jax.Array      # (ncon,) i4
  dim: jax.Array        # (ncon,) i4 condim


@pytree_dataclass
class Data:
  """Dynamic state + derived quantities (one env; vmap for batches)."""

  # integration state ------------------------------------------------------
  time: jax.Array       # ()
  qpos: jax.Array       # (nq,)
  qvel: jax.Array       # (nv,)
  act: jax.Array        # (na,)
  ctrl: jax.Array       # (nu,)
  qfrc_applied: jax.Array  # (nv,)
  xfrc_applied: jax.Array  # (nbody, 6)

  # kinematics -------------------------------------------------------------
  xpos: jax.Array       # (nbody, 3)
  xquat: jax.Array      # (nbody, 4)
  xmat: jax.Array       # (nbody, 3, 3)
  xipos: jax.Array      # (nbody, 3)
  ximat: jax.Array      # (nbody, 3, 3)
  geom_xpos: jax.Array  # (ngeom, 3)
  geom_xmat: jax.Array  # (ngeom, 3, 3)
  site_xpos: jax.Array  # (nsite, 3)
  site_xmat: jax.Array  # (nsite, 3, 3)
  xanchor: jax.Array    # (njnt, 3) joint anchors (sequential, world)
  xaxis: jax.Array      # (njnt, 3) joint axes (sequential, world)

  # com-based quantities ---------------------------------------------------
  subtree_com: jax.Array  # (nbody, 3)
  cinert: jax.Array     # (nbody, 10)
  cdof: jax.Array       # (nv, 6)
  cdof_dot: jax.Array   # (nv, 6)
  cvel: jax.Array       # (nbody, 6)

  # mass matrix ------------------------------------------------------------
  qM: jax.Array         # (nv, nv) dense
  qLD: jax.Array        # (nv, nv) cholesky factor (lower)

  # tendons ----------------------------------------------------------------
  ten_length: jax.Array   # (ntendon,)
  ten_velocity: jax.Array  # (ntendon,)
  ten_J: jax.Array        # (ntendon, nv)

  # actuation --------------------------------------------------------------
  actuator_length: jax.Array    # (nu,)
  actuator_velocity: jax.Array  # (nu,)
  actuator_moment: jax.Array    # (nu, nv)
  actuator_force: jax.Array     # (nu,)
  act_dot: jax.Array            # (na,)

  # forces -----------------------------------------------------------------
  qfrc_bias: jax.Array      # (nv,)
  qfrc_spring: jax.Array    # (nv,)
  qfrc_damper: jax.Array    # (nv,)
  qfrc_gravcomp: jax.Array  # (nv,)
  qfrc_fluid: jax.Array     # (nv,)
  qfrc_passive: jax.Array   # (nv,)
  qfrc_actuator: jax.Array  # (nv,)
  qfrc_smooth: jax.Array    # (nv,)
  qacc_smooth: jax.Array    # (nv,)
  qfrc_constraint: jax.Array  # (nv,)
  qacc: jax.Array           # (nv,)
  qacc_warmstart: jax.Array  # (nv,) previous solution (solver warmstart)

  # constraints (fixed-size padded rows) -----------------------------------
  contact: Contact          # ncon-padded contact set
  efc_J: jax.Array          # (nefc, nv)
  efc_pos: jax.Array        # (nefc,)
  efc_margin: jax.Array     # (nefc,)
  efc_D: jax.Array          # (nefc,) constraint stiffness 1/R
  efc_aref: jax.Array       # (nefc,)
  efc_frictionloss: jax.Array  # (nefc,)
  efc_force: jax.Array      # (nefc,)
  efc_active: jax.Array     # (nefc,) bool

  # sensors ----------------------------------------------------------------
  sensordata: jax.Array     # (nsensordata,)

  # diagnostics ------------------------------------------------------------
  energy: jax.Array         # (2,) potential, kinetic
  diverged: jax.Array       # () bool - state became non-finite

  # per-episode model-parameter overrides (replaces the reference's
  # per-episode mutation of mjModel fields, e.g. suite/reacher.py target
  # geom_pos): dict of {field_name: array} taking precedence over the
  # static Model arrays inside the engine.  Keys are part of the pytree
  # structure (static); values are batchable leaves.
  model_var: Any
