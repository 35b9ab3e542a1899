"""Core pytree types of the TPU physics engine.

``Model`` splits into (a) *static* topology/metadata — plain numpy arrays and
python ints used for trace-time control flow (tree structure, joint types,
collision pair tables) — and (b) *numeric parameter leaves* — jnp arrays
(masses, frictions, gains, ...) that are traced, differentiable, and
vmap-able for domain randomization (reference pattern:
ppo_train/airbot_training/domain_randomize.py:76-91).

``Data`` is one simulation state: a flat pytree of jnp arrays so that
``jax.vmap`` over envs and ``jax.lax.scan`` over substeps are trivial.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np
from flax import struct

# ---------------------------------------------------------------------------
# Enums mirroring MuJoCo's (values match mjtJoint / mjtGeom / ... so that
# model conversion is a direct copy).
# ---------------------------------------------------------------------------


class JointType:
  FREE = 0
  BALL = 1
  SLIDE = 2
  HINGE = 3


class GeomType:
  PLANE = 0
  HFIELD = 1
  SPHERE = 2
  CAPSULE = 3
  ELLIPSOID = 4
  CYLINDER = 5
  BOX = 6
  MESH = 7


class IntegratorType:
  EULER = 0
  RK4 = 1
  IMPLICIT = 2
  IMPLICITFAST = 3


class TrnType:
  JOINT = 0
  JOINTINPARENT = 1
  SITE = 4


class GainType:
  FIXED = 0
  AFFINE = 1


class BiasType:
  NONE = 0
  AFFINE = 1


class EqType:
  CONNECT = 0
  WELD = 1
  JOINT = 2


class DynType:
  NONE = 0
  INTEGRATOR = 1
  FILTER = 2
  FILTEREXACT = 3


class ConeType:
  PYRAMIDAL = 0
  ELLIPTIC = 1


# Sensor types we evaluate (subset used by the Go2 suite; values match
# mujoco.mjtSensor of the compiling MuJoCo version).
class SensorType:
  ACCELEROMETER = 1
  VELOCIMETER = 2
  GYRO = 3
  FRAMEPOS = 26
  FRAMEQUAT = 27
  FRAMEXAXIS = 28
  FRAMEYAXIS = 29
  FRAMEZAXIS = 30
  FRAMELINVEL = 31
  FRAMEANGVEL = 32
  SUBTREELINVEL = 36


class StaticArr:
  """Hashable wrapper so numpy topology arrays can live in static
  (non-pytree) Model fields without breaking jit caching."""

  __slots__ = ('arr', '_hash')

  def __init__(self, arr):
    self.arr = np.asarray(arr)
    self.arr.setflags(write=False)
    self._hash = hash((self.arr.shape, self.arr.dtype.str, self.arr.tobytes()))

  def __hash__(self):
    return self._hash

  def __eq__(self, other):
    return (
        isinstance(other, StaticArr)
        and self.arr.shape == other.arr.shape
        and bool(np.all(self.arr == other.arr))
    )

  def __getitem__(self, idx):
    return self.arr[idx]

  def __array__(self, dtype=None):
    return self.arr if dtype is None else self.arr.astype(dtype)

  def __len__(self):
    return len(self.arr)

  def __repr__(self):
    return f'StaticArr({self.arr!r})'


def _static(**kw):
  return struct.field(pytree_node=False, **kw)


@struct.dataclass
class Option:
  """Simulation options (mjOption subset)."""

  # traced leaves (tunable / randomizable)
  timestep: jax.Array
  gravity: jax.Array  # (3,)
  # static
  integrator: int = _static(default=IntegratorType.EULER)
  iterations: int = _static(default=8)
  ls_iterations: int = _static(default=8)
  tolerance: float = _static(default=1e-8)
  cone: int = _static(default=ConeType.PYRAMIDAL)
  impratio: float = _static(default=1.0)
  disableflags: int = _static(default=0)


# Collision pair table: static precomputed broad-phase.  A tuple of
# (group_name, StaticArr) entries where each StaticArr has shape (n, 3):
# [geom1, geom2, condim].  Geoms are ordered so the smaller geom_type comes
# first (planes/hfields lead).  Contact parameters (friction, solref,
# solimp) are looked up dynamically from Model leaves so domain
# randomization of geom_friction flows through (reference:
# ppo_train/airbot_training/domain_randomize.py:37-49).
CollisionPairs = tuple


@struct.dataclass
class Model:
  """Physics model. Numeric leaves are jnp arrays (differentiable,
  randomizable); topology is static numpy (trace-time control flow).

  Field names mirror mjModel so conversion and reading code stay obvious.
  """

  # ----- sizes (static python ints)
  nq: int = _static()
  nv: int = _static()
  nu: int = _static()
  na: int = _static()
  nbody: int = _static()
  njnt: int = _static()
  ngeom: int = _static()
  nsite: int = _static()
  neq: int = _static()
  nsensor: int = _static()
  nsensordata: int = _static()

  opt: Option = None

  # ----- numeric parameter leaves (jnp)
  qpos0: jax.Array = None  # (nq,)
  body_pos: jax.Array = None  # (nbody, 3)
  body_quat: jax.Array = None  # (nbody, 4)
  body_ipos: jax.Array = None  # (nbody, 3)
  body_iquat: jax.Array = None  # (nbody, 4)
  body_mass: jax.Array = None  # (nbody,)
  body_inertia: jax.Array = None  # (nbody, 3)
  body_invweight0: jax.Array = None  # (nbody, 2)
  jnt_axis: jax.Array = None  # (njnt, 3)
  jnt_pos: jax.Array = None  # (njnt, 3)
  jnt_range: jax.Array = None  # (njnt, 2)
  jnt_solref: jax.Array = None  # (njnt, 2)
  jnt_solimp: jax.Array = None  # (njnt, 5)
  jnt_stiffness: jax.Array = None  # (njnt,)
  jnt_margin: jax.Array = None  # (njnt,)
  dof_armature: jax.Array = None  # (nv,)
  dof_damping: jax.Array = None  # (nv,)
  dof_frictionloss: jax.Array = None  # (nv,)
  dof_invweight0: jax.Array = None  # (nv,)
  dof_solref: jax.Array = None  # (nv, 2)
  dof_solimp: jax.Array = None  # (nv, 5)
  geom_pos: jax.Array = None  # (ngeom, 3)
  geom_quat: jax.Array = None  # (ngeom, 4)
  geom_size: jax.Array = None  # (ngeom, 3)
  geom_friction: jax.Array = None  # (ngeom, 3)
  geom_solref: jax.Array = None  # (ngeom, 2)
  geom_solimp: jax.Array = None  # (ngeom, 5)
  geom_solmix: jax.Array = None  # (ngeom,)
  geom_margin: jax.Array = None  # (ngeom,)
  geom_gap: jax.Array = None  # (ngeom,)
  site_pos: jax.Array = None  # (nsite, 3)
  site_quat: jax.Array = None  # (nsite, 4)
  eq_data: jax.Array = None  # (neq, 11)
  eq_solref: jax.Array = None  # (neq, 2)
  eq_solimp: jax.Array = None  # (neq, 5)
  actuator_gainprm: jax.Array = None  # (nu, 10)
  actuator_biasprm: jax.Array = None  # (nu, 10)
  actuator_ctrlrange: jax.Array = None  # (nu, 2)
  actuator_forcerange: jax.Array = None  # (nu, 2)
  actuator_gear: jax.Array = None  # (nu, 6)
  hfield_data: Optional[jax.Array] = None  # (nhfielddata,) row-major heights
  key_qpos: Optional[jax.Array] = None  # (nkey, nq)
  key_ctrl: Optional[jax.Array] = None  # (nkey, nu)

  # ----- static topology (numpy via StaticArr / tuples)
  body_parentid: StaticArr = _static(default=None)  # (nbody,)
  body_rootid: StaticArr = _static(default=None)  # (nbody,)
  body_jntadr: StaticArr = _static(default=None)
  body_jntnum: StaticArr = _static(default=None)
  body_dofadr: StaticArr = _static(default=None)
  body_dofnum: StaticArr = _static(default=None)
  jnt_type: StaticArr = _static(default=None)  # (njnt,)
  jnt_qposadr: StaticArr = _static(default=None)
  jnt_dofadr: StaticArr = _static(default=None)
  jnt_bodyid: StaticArr = _static(default=None)
  jnt_limited: StaticArr = _static(default=None)
  jnt_actfrclimited: StaticArr = _static(default=None)
  jnt_actfrcrange: StaticArr = _static(default=None)
  dof_bodyid: StaticArr = _static(default=None)
  dof_jntid: StaticArr = _static(default=None)
  geom_type: StaticArr = _static(default=None)
  geom_bodyid: StaticArr = _static(default=None)
  geom_condim: StaticArr = _static(default=None)
  geom_priority: StaticArr = _static(default=None)
  geom_dataid: StaticArr = _static(default=None)
  site_bodyid: StaticArr = _static(default=None)
  eq_type: StaticArr = _static(default=None)
  eq_obj1id: StaticArr = _static(default=None)
  eq_obj2id: StaticArr = _static(default=None)
  eq_active0: StaticArr = _static(default=None)
  actuator_trntype: StaticArr = _static(default=None)
  actuator_trnid: StaticArr = _static(default=None)  # (nu, 2)
  actuator_gaintype: StaticArr = _static(default=None)
  actuator_biastype: StaticArr = _static(default=None)
  actuator_dyntype: StaticArr = _static(default=None)
  actuator_ctrllimited: StaticArr = _static(default=None)
  actuator_forcelimited: StaticArr = _static(default=None)
  sensor_type: StaticArr = _static(default=None)
  sensor_objid: StaticArr = _static(default=None)
  sensor_objtype: StaticArr = _static(default=None)
  sensor_reftype: StaticArr = _static(default=None)
  sensor_refid: StaticArr = _static(default=None)
  sensor_adr: StaticArr = _static(default=None)
  sensor_dim: StaticArr = _static(default=None)
  # ancestor mask: anc_mask[b, j] = 1.0 iff dof j is an ancestor dof of body b
  anc_mask: StaticArr = _static(default=None)  # (nbody, nv) float32
  # dof ancestor mask for mass matrix sparsity: dof_anc[i, j] = 1 iff
  # dof j is i or an ancestor of i (same kinematic chain)
  dof_anc: StaticArr = _static(default=None)  # (nv, nv) float32
  # hfield static meta: (nrow, ncol) and sizes (4,) per hfield
  hfield_nrow: StaticArr = _static(default=None)
  hfield_ncol: StaticArr = _static(default=None)
  hfield_size: StaticArr = _static(default=None)  # (nhfield, 4) x y ztop zbot
  hfield_adr: StaticArr = _static(default=None)

  pairs: CollisionPairs = _static(default=None)
  # total number of contact points (static) and layout bookkeeping
  ncon: int = _static(default=0)
  # active-contact selection: if > 0 and < ncon, the constraint assembly
  # solves only the ncon_sel nearest contact slots (top-k by dist).  The
  # full Contact set stays available on Data for queries/sensors.  Cuts the
  # Newton system from O(ncon) to O(ncon_sel) rows — the dominant cost for
  # scenes whose pair table is much larger than the simultaneously-active
  # contact count (Airbot cube scene: 480 slots, ≤ ~16 penetrating measured
  # during aggressive gripper-on-cube manipulation;
  # tests/test_physics_contact.py asserts the bound with margin via the
  # constraint.contact_overflow diagnostic).  Requires uniform condim
  # across contact pairs.
  ncon_sel: int = _static(default=0)
  # name lookup tables (python dicts; static)
  names: Any = _static(default=None)


@struct.dataclass
class Contact:
  """All potential contacts, static shape (ncon, ...).

  ``dist`` > 0 means separated; the constraint assembly gives separated
  contacts vanishing impedance so they contribute ~zero force, which lets
  us keep shapes static under jit (no boolean gather).
  """

  dist: jax.Array  # (ncon,)
  pos: jax.Array  # (ncon, 3)
  frame: jax.Array  # (ncon, 3, 3) rows: normal, tangent1, tangent2
  friction: jax.Array  # (ncon, 5)
  solref: jax.Array  # (ncon, 2)
  solimp: jax.Array  # (ncon, 5)
  geom1: StaticArr = _static(default=None)  # (ncon,) int
  geom2: StaticArr = _static(default=None)
  condim: StaticArr = _static(default=None)  # (ncon,) int


@struct.dataclass
class Data:
  """Simulation state + forward products for one environment instance."""

  # independent state
  qpos: jax.Array  # (nq,)
  qvel: jax.Array  # (nv,)
  ctrl: jax.Array  # (nu,)
  act: jax.Array  # (na,) actuator internal state
  time: jax.Array  # ()
  xfrc_applied: jax.Array  # (nbody, 6) (force, torque) at body CoM, world

  # forward kinematics products
  xpos: jax.Array  # (nbody, 3)
  xquat: jax.Array  # (nbody, 4)
  xmat: jax.Array  # (nbody, 3, 3)
  xipos: jax.Array  # (nbody, 3)
  ximat: jax.Array  # (nbody, 3, 3)
  geom_xpos: jax.Array  # (ngeom, 3)
  geom_xmat: jax.Array  # (ngeom, 3, 3)
  site_xpos: jax.Array  # (nsite, 3)
  site_xmat: jax.Array  # (nsite, 3, 3)
  subtree_com: jax.Array  # (nbody, 3)

  # dynamics products
  cdof: jax.Array  # (nv, 6) dof motion axes, world, anchored per-root com
  cdof_anchor: jax.Array  # (nv, 3) anchor point used for each dof
  cvel: jax.Array  # (nbody, 6) body spatial velocity in same frame
  qM: jax.Array  # (nv, nv) dense mass matrix
  qLD: jax.Array  # (nv, nv) Cholesky factor of qM (lower)
  qfrc_bias: jax.Array  # (nv,)
  qfrc_passive: jax.Array  # (nv,)
  qfrc_actuator: jax.Array  # (nv,)
  qfrc_applied: jax.Array  # (nv,)
  actuator_force: jax.Array  # (nu,)
  qfrc_smooth: jax.Array  # (nv,)
  qacc_smooth: jax.Array  # (nv,)
  qfrc_constraint: jax.Array  # (nv,)
  qacc: jax.Array  # (nv,)

  contact: Contact  # static-shape contact set
  efc_force: jax.Array  # (nefc,) constraint forces (for contact queries)
  sensordata: jax.Array  # (nsensordata,)


def tree_replace(obj, **changes):
  """Convenience: dataclass replace that works through flax structs."""
  return dataclasses.replace(obj, **changes)
