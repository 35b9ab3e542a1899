"""Constraint assembly: MuJoCo's soft-constraint model with static shapes.

Emits a fixed-layout constraint system (J, aref, D, ...) each step:

  rows = [equality | dof friction loss | joint limits | contact pyramids]

Separated contacts / inactive limits keep their rows but get vanishing
impedance, so the solver sees a static problem — the XLA-friendly
equivalent of MuJoCo's dynamic efc arrays.  Semantics follow the MuJoCo
computation spec (solref/solimp impedance, Baumgarte-style aref, pyramidal
friction cones); the Airbot models lean on condim-4 contacts, dof friction
loss and a joint-equality gripper coupling (cube.xml:49-93, :168-170).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rsr_mjx_tpu.physics.types import Data, EqType, JointType, Model

_MJ_MINVAL = 1e-15
_MINIMP = 0.0001
_MAXIMP = 0.9999

# row kinds
EQUALITY = 0
FRICTION = 1
LIMIT = 2
CONTACT = 3


@dataclasses.dataclass(frozen=True)
class EfcLayout:
  """Static description of the constraint rows for a model."""

  nefc: int
  n_eq: int
  n_fri: int
  n_lim: int
  n_con: int
  kind: np.ndarray  # (nefc,) row kind


def _contact_rows(condim: int) -> int:
  return 1 if condim == 1 else 2 * (condim - 1)


def contact_condims(m: Model) -> list:
  """Static per-contact condim, in collision.py's assembly order."""
  from rsr_mjx_tpu.physics.io import GROUP_NCON

  out = []
  for name, tbl in m.pairs:
    for row in tbl.arr:
      out.extend([int(row[2])] * GROUP_NCON[name])
  return out


def layout(m: Model) -> EfcLayout:
  n_eq = 0
  for e in range(m.neq):
    t = int(m.eq_type[e])
    if t == EqType.JOINT:
      n_eq += 1
    elif t == EqType.CONNECT:
      n_eq += 3
    elif t == EqType.WELD:
      n_eq += 6
    else:
      raise NotImplementedError(f'equality type {t}')
  n_fri = m.nv  # one potential friction-loss row per dof (zero-bound inert)
  n_lim = 2 * int(np.sum(m.jnt_limited.arr != 0))
  condims = contact_condims(m)
  nsel = _selection_size(m)
  if nsel:
    n_con = _contact_rows(condims[0]) * nsel
  else:
    n_con = sum(_contact_rows(cd) for cd in condims)
  kind = np.concatenate(
      [
          np.full(n_eq, EQUALITY),
          np.full(n_fri, FRICTION),
          np.full(n_lim, LIMIT),
          np.full(n_con, CONTACT),
      ]
  ).astype(np.int32)
  return EfcLayout(len(kind), n_eq, n_fri, n_lim, n_con, kind)


def count_rows(m: Model) -> int:
  return layout_cached(m).nefc


_LAYOUT_CACHE: dict = {}


def _selection_size(m: Model) -> int:
  """Effective top-k contact selection size (0 = disabled)."""
  nsel = getattr(m, 'ncon_sel', 0) or 0
  if nsel <= 0 or nsel >= m.ncon:
    return 0
  condims = set(contact_condims(m))
  if len(condims) > 1:
    raise NotImplementedError(
        'ncon_sel requires uniform contact condim; got %s' % sorted(condims)
    )
  return nsel


def _condims_static(m: Model) -> np.ndarray:
  """Static per-slot condim vector (ncon,)."""
  return np.asarray(contact_condims(m), np.int32)


_DMASK_CACHE: dict = {}


def contact_dmask(m: Model) -> np.ndarray:
  """Static (ncon, nv) relative dof mask anc_mask[b2] − anc_mask[b1], in
  collision.py's slot order (rebuilt from m.pairs, no Data needed)."""
  from rsr_mjx_tpu.physics.io import GROUP_NCON

  key = (id(m.anc_mask), tuple((n, t) for n, t in m.pairs))
  if key not in _DMASK_CACHE:
    g1_parts, g2_parts = [], []
    for name, tbl in m.pairs:
      pairs = tbl.arr
      if len(pairs) == 0:
        continue
      k = GROUP_NCON[name]
      g1_parts.append(np.repeat(pairs[:, 0], k))
      g2_parts.append(np.repeat(pairs[:, 1], k))
    g1 = np.concatenate(g1_parts) if g1_parts else np.zeros(0, np.int32)
    g2 = np.concatenate(g2_parts) if g2_parts else np.zeros(0, np.int32)
    b1 = m.geom_bodyid.arr[g1]
    b2 = m.geom_bodyid.arr[g2]
    _DMASK_CACHE[key] = m.anc_mask.arr[b2] - m.anc_mask.arr[b1]
  return _DMASK_CACHE[key]


def layout_cached(m: Model) -> EfcLayout:
  key = (
      m.neq,
      m.nv,
      m.jnt_limited,
      tuple((n, t) for n, t in m.pairs),
      m.ncon,
      getattr(m, 'ncon_sel', 0),
  )
  if key not in _LAYOUT_CACHE:
    _LAYOUT_CACHE[key] = layout(m)
  return _LAYOUT_CACHE[key]


def _impedance(solimp: jax.Array, pos: jax.Array) -> jax.Array:
  """MuJoCo constraint impedance d(pos) from solimp=(dmin,dmax,width,mid,p)."""
  dmin, dmax, width, mid, power = (
      solimp[..., 0],
      solimp[..., 1],
      solimp[..., 2],
      solimp[..., 3],
      solimp[..., 4],
  )
  dmin = jnp.clip(dmin, _MINIMP, _MAXIMP)
  dmax = jnp.clip(dmax, _MINIMP, _MAXIMP)
  width = jnp.maximum(width, _MJ_MINVAL)
  mid = jnp.clip(mid, _MINIMP, _MAXIMP)
  power = jnp.maximum(power, 1.0)

  x = jnp.clip(jnp.abs(pos) / width, 0.0, 1.0)
  # piecewise sigmoid: y = a x^p (x<=mid), 1 - b (1-x)^p (x>mid)
  a = 1.0 / jnp.power(mid, power - 1.0)
  b = 1.0 / jnp.power(1.0 - mid, power - 1.0)
  y = jnp.where(
      x <= mid,
      a * jnp.power(x, power),
      1.0 - b * jnp.power(1.0 - x, power),
  )
  return jnp.clip(dmin + y * (dmax - dmin), _MINIMP, _MAXIMP)


def _kbi(solref: jax.Array, solimp: jax.Array, pos: jax.Array,
         dmax: jax.Array):
  """Stiffness/damping from solref (standard or direct form)."""
  timeconst, dampratio = solref[..., 0], solref[..., 1]
  standard = timeconst > 0
  tc = jnp.where(standard, jnp.maximum(timeconst, _MJ_MINVAL), 1.0)
  dr = jnp.where(standard, jnp.maximum(dampratio, _MJ_MINVAL), 1.0)
  k_std = 1.0 / jnp.maximum(dmax * dmax * tc * tc * dr * dr, _MJ_MINVAL)
  b_std = 2.0 / jnp.maximum(dmax * tc, _MJ_MINVAL)
  k_dir = -solref[..., 0] / jnp.maximum(dmax * dmax, _MJ_MINVAL)
  b_dir = -solref[..., 1] / jnp.maximum(dmax, _MJ_MINVAL)
  k = jnp.where(standard, k_std, k_dir)
  b = jnp.where(standard, b_std, b_dir)
  return k, b


@dataclasses.dataclass
class Efc:
  """Traced constraint system handed to the solver (not a pytree — built
  and consumed within one jitted forward call)."""

  J: jax.Array  # (nefc, nv)
  aref: jax.Array  # (nefc,)
  D: jax.Array  # (nefc,) constraint stiffness (1/R)
  floss: jax.Array  # (nefc,) friction-loss bound (friction rows only)
  kind: np.ndarray  # static (nefc,)


class AssembleLeaves(NamedTuple):
  """The traced leaves the assembly reads, as an explicit pytree so the
  fused solver (solver.py) can route them through custom_vmap/custom_vjp —
  model leaves must be explicit args there because domain randomization
  batches them (wrappers.DomainRandomizationVmapWrapper).

  Round-5 fusion: the contact *geometry* inputs are the narrow-phase
  inputs (geom poses + sizes), not its outputs — the fused solver runs
  the narrow phase itself so the batched TPU path keeps contact features
  in lanes layout end-to-end.  The per-slot solver parameters
  (``con_friction/solref/solimp/invweight``) stay precomputed: they are
  pure functions of model leaves (mj_contactParam never reads positions),
  so they are assembled once per env outside the lanes pipeline."""

  qpos: jax.Array
  qvel: jax.Array
  cdof: jax.Array
  cdof_anchor: jax.Array
  geom_xpos: jax.Array
  geom_xmat: jax.Array
  geom_size: jax.Array
  hfield_data: jax.Array
  con_friction: jax.Array
  con_solref: jax.Array
  con_solimp: jax.Array
  con_invweight: jax.Array
  eq_data: jax.Array
  qpos0: jax.Array
  dof_invweight0: jax.Array
  eq_solref: jax.Array
  eq_solimp: jax.Array
  dof_solref: jax.Array
  dof_solimp: jax.Array
  dof_frictionloss: jax.Array
  jnt_range: jax.Array
  jnt_solref: jax.Array
  jnt_solimp: jax.Array
  jnt_margin: jax.Array


_GEOM_IDS_CACHE: dict = {}


def contact_geom_ids(m: Model):
  """Static per-slot (geom1, geom2) int arrays in collision slot order."""
  from rsr_mjx_tpu.physics.io import GROUP_NCON

  key = tuple((n, t) for n, t in m.pairs)
  if key not in _GEOM_IDS_CACHE:
    g1_parts, g2_parts = [], []
    for name, tbl in m.pairs:
      pairs = tbl.arr
      if len(pairs) == 0:
        continue
      k = GROUP_NCON[name]
      g1_parts.append(np.repeat(pairs[:, 0], k))
      g2_parts.append(np.repeat(pairs[:, 1], k))
    g1 = np.concatenate(g1_parts) if g1_parts else np.zeros(0, np.int32)
    g2 = np.concatenate(g2_parts) if g2_parts else np.zeros(0, np.int32)
    _GEOM_IDS_CACHE[key] = (g1, g2)
  return _GEOM_IDS_CACHE[key]


def narrowphase_leaves(m: Model, lv: AssembleLeaves):
  """Per-env narrow phase from leaves: (dist (ncon,), pos, frame).

  Dispatches through the collision module's cached collider, whose
  custom_vmap rule computes whole batches in lanes layout and whose
  custom_vjp keeps it differentiable (env_params_tuning path)."""
  from rsr_mjx_tpu.physics import collision as _col

  fn = _col._make_collider(_col._cfg_of(m))
  return fn(lv.geom_size, lv.hfield_data, lv.geom_xpos, lv.geom_xmat)


def gather_leaves(m: Model, d: Data) -> AssembleLeaves:
  """Collect the assembly's traced inputs from (m, d).

  ``con_*`` leaves precompute the per-slot contact solver parameters
  (mj_contactParam mixing + body invweights) from model leaves — static
  w.r.t. the dynamics, batched only under domain randomization."""
  from rsr_mjx_tpu.physics import collision as _col

  if m.ncon:
    g1, g2 = contact_geom_ids(m)
    b1 = m.geom_bodyid.arr[g1]
    b2 = m.geom_bodyid.arr[g2]
    con_invweight = m.body_invweight0[b1][:, 0] + m.body_invweight0[b2][:, 0]
    con_friction, con_solref, con_solimp = _col.combine_solparams(
        _col._cfg_of(m), m.geom_friction, m.geom_solref, m.geom_solimp,
        m.geom_solmix,
    )
  else:
    z = jnp.zeros((0,), dtype=d.qpos.dtype)
    con_friction, con_solref, con_solimp, con_invweight = (
        z.reshape(0, 5), z.reshape(0, 2), z.reshape(0, 5), z
    )
  hfd = m.hfield_data
  if hfd is None:
    hfd = jnp.zeros((0,), dtype=d.qpos.dtype)
  return AssembleLeaves(
      d.qpos, d.qvel, d.cdof, d.cdof_anchor,
      d.geom_xpos, d.geom_xmat, m.geom_size, hfd,
      con_friction, con_solref, con_solimp, con_invweight,
      m.eq_data, m.qpos0, m.dof_invweight0, m.eq_solref, m.eq_solimp,
      m.dof_solref, m.dof_solimp, m.dof_frictionloss,
      m.jnt_range, m.jnt_solref, m.jnt_solimp, m.jnt_margin,
  )


def make_constraints(m: Model, d: Data) -> Efc:
  """Assemble the traced constraint system for this step."""
  return _assemble(m, d)


def pair_groups(m: Model):
  """Static (name, n_pairs, slots_per_pair, row_offset) per pair-group, in
  the collider's slot order (pair-major blocks of ``slots_per_pair``)."""
  from rsr_mjx_tpu.physics.io import GROUP_NCON

  out = []
  off = 0
  for name, tbl in m.pairs:
    P = len(tbl.arr)
    if not P:
      continue
    k = GROUP_NCON[name]
    out.append((name, P, k, off))
    off += P * k
  return out


def contact_overflow(m: Model, d: Data):
  """(n_penetrating, truncated) active-contact diagnostic for ncon_sel.

  ``truncated`` is True when the scene has more simultaneously penetrating
  contact slots than the active-set selection solves (ncon_sel /
  ``max_contacts``) — i.e. the solver silently dropped real contacts this
  step.  Per-env under vmap.  Used by tests/test_physics_contact.py to
  validate the ncon_sel bound in the manipulation regime (round-2 advisor
  item) and exportable as a training metric.
  """
  n_pen = jnp.sum((d.contact.dist < 0.0).astype(jnp.int32))
  nsel = _selection_size(m)
  truncated = (n_pen > nsel) if nsel else jnp.zeros((), bool)
  return n_pen, truncated


def _assemble(m: Model, d: Data) -> Efc:
  return assemble_from_leaves(m, gather_leaves(m, d))


def assemble_from_leaves(m: Model, lv: AssembleLeaves, contact=None) -> Efc:
  """Per-env assembly from explicit traced leaves (static info from m).

  This is the single source of truth for constraint-row semantics; the
  vmapped batch-major path, the fused lanes path's reference, and the
  fused solver's custom_vjp backward all call it.

  ``contact`` is an optional precomputed (dist, pos, frame) narrow-phase
  triple; when absent it is computed from the leaves here.
  """
  if contact is None and m.ncon:
    contact = narrowphase_leaves(m, lv)
  lay = layout_cached(m)
  dtype = lv.qpos.dtype
  nv = m.nv

  J_rows = []
  pos_rows = []
  solref_rows = []
  solimp_rows = []
  diagA_rows = []
  floss_rows = []
  margin_rows = []

  zero = jnp.zeros((), dtype=dtype)
  one = jnp.ones((), dtype=dtype)

  # ---- equality (JOINT type: q1 - q1_0 = poly(q2 - q2_0))
  for e in range(m.neq):
    t = int(m.eq_type[e])
    if t != EqType.JOINT:
      raise NotImplementedError('connect/weld equality not yet implemented')
    j1 = int(m.eq_obj1id[e])
    j2 = int(m.eq_obj2id[e])
    q1adr, v1adr = int(m.jnt_qposadr[j1]), int(m.jnt_dofadr[j1])
    data = lv.eq_data[e]
    row = jnp.zeros(nv, dtype=dtype).at[v1adr].set(1.0)
    if j2 >= 0 and j2 < m.njnt and j2 != j1:
      q2adr, v2adr = int(m.jnt_qposadr[j2]), int(m.jnt_dofadr[j2])
      dif = lv.qpos[q2adr] - lv.qpos0[q2adr]
      poly = (
          data[0]
          + data[1] * dif
          + data[2] * dif**2
          + data[3] * dif**3
          + data[4] * dif**4
      )
      dpoly = (
          data[1]
          + 2 * data[2] * dif
          + 3 * data[3] * dif**2
          + 4 * data[4] * dif**3
      )
      pos = (lv.qpos[q1adr] - lv.qpos0[q1adr]) - poly
      row = row.at[v2adr].set(-dpoly)
      diagA = lv.dof_invweight0[v1adr] + lv.dof_invweight0[v2adr]
    else:
      pos = lv.qpos[q1adr] - lv.qpos0[q1adr] - data[0]
      diagA = lv.dof_invweight0[v1adr]
    J_rows.append(row)
    pos_rows.append(pos)
    solref_rows.append(lv.eq_solref[e])
    solimp_rows.append(lv.eq_solimp[e])
    diagA_rows.append(diagA)
    floss_rows.append(zero)
    margin_rows.append(zero)

  # ---- dof friction loss (inert when frictionloss == 0)
  eye = jnp.eye(nv, dtype=dtype)
  for v in range(nv):
    J_rows.append(eye[v])
    pos_rows.append(zero)
    solref_rows.append(lv.dof_solref[v])
    solimp_rows.append(lv.dof_solimp[v])
    diagA_rows.append(lv.dof_invweight0[v])
    floss_rows.append(lv.dof_frictionloss[v])
    margin_rows.append(zero)

  J_parts = [jnp.stack(J_rows)] if J_rows else []
  pos_parts = [jnp.stack(pos_rows)] if pos_rows else []
  solref_parts = [jnp.stack(solref_rows)] if solref_rows else []
  solimp_parts = [jnp.stack(solimp_rows)] if solimp_rows else []
  diagA_parts = [jnp.stack(diagA_rows)] if diagA_rows else []
  floss_parts = [jnp.stack(floss_rows)] if floss_rows else []
  margin_parts = [jnp.stack(margin_rows)] if margin_rows else []

  # ---- joint limits (two one-sided rows per limited joint), vectorized
  lim_j = np.nonzero(m.jnt_limited.arr != 0)[0]
  if len(lim_j):
    for jt in m.jnt_type.arr[lim_j]:
      if int(jt) not in (JointType.HINGE, JointType.SLIDE):
        raise NotImplementedError('ball/free limits')
    qadr = m.jnt_qposadr.arr[lim_j]
    vadr = m.jnt_dofadr.arr[lim_j]
    lo = lv.jnt_range[lim_j, 0]
    hi = lv.jnt_range[lim_j, 1]
    q = lv.qpos[qadr]
    # rows interleaved (lo, hi) per joint
    sign = jnp.tile(jnp.array([1.0, -1.0], dtype=dtype), len(lim_j))
    rows = jnp.repeat(eye[vadr], 2, axis=0) * sign[:, None]
    bound = jnp.stack([lo, hi], axis=-1).reshape(-1)
    posl = sign * (jnp.repeat(q, 2) - bound)
    J_parts.append(rows)
    pos_parts.append(posl)
    solref_parts.append(jnp.repeat(lv.jnt_solref[lim_j], 2, axis=0))
    solimp_parts.append(jnp.repeat(lv.jnt_solimp[lim_j], 2, axis=0))
    diagA_parts.append(jnp.repeat(lv.dof_invweight0[vadr], 2))
    floss_parts.append(jnp.zeros(2 * len(lim_j), dtype=dtype))
    margin_parts.append(jnp.repeat(lv.jnt_margin[lim_j], 2))

  # ---- contacts (pyramidal cones), fully vectorized per condim group
  if m.ncon:
    con_dist, con_pos, con_frame = contact
    dmask_all = jnp.asarray(contact_dmask(m), dtype=dtype)
    invweight_all = lv.con_invweight

    nsel = _selection_size(m)
    if nsel:
      # Active-set selection: solve only the nsel nearest contact slots.
      # Separated slots have ~zero impedance, so dropping all but the k
      # nearest preserves the dynamics as long as nsel ≥ #active contacts
      # (validated by contact_overflow / test_physics_contact.py).
      #
      # TPU cost notes (scripts/profile_assembly.py, B=1024 on v5e):
      # top_k itself is 0.10 ms, but batched fancy-indexing gathers of the
      # (ncon, …) contact arrays cost 2.3 ms/substep — they were the
      # dominant assembly cost.  A cumsum+scatter compaction is even worse
      # (2.4 ms for the scatter alone).  Instead the gather is expressed
      # as a one-hot matmul: under the env vmap it becomes one batched
      # (nsel × ncon) @ (ncon × F) contraction that lands on the MXU.
      # One-hot weights make it an exact gather, and gradients flow
      # through the matmul to the contact features like any dot product.
      feat = jnp.concatenate(
          [
              con_dist[:, None],
              con_pos,
              con_frame.reshape(m.ncon, 9),
              lv.con_friction,
              lv.con_solref,
              lv.con_solimp,
              invweight_all[:, None],
          ],
          axis=1,
      )  # (ncon, 26)
      _, sel_idx = jax.lax.top_k(-con_dist, nsel)
      onehot = (
          sel_idx[:, None] == jnp.arange(m.ncon, dtype=sel_idx.dtype)
      ).astype(dtype)  # (nsel, ncon)
      sel = onehot @ feat  # (nsel, 26)
      c_dist = sel[:, 0]
      c_pos = sel[:, 1:4]
      c_frame = sel[:, 4:13].reshape(nsel, 3, 3)
      c_friction = sel[:, 13:18]
      c_solref = sel[:, 18:20]
      c_solimp = sel[:, 20:25]
      invweight = sel[:, 25]
      dmask = onehot @ dmask_all  # (nsel, nv); dmask_all is static numpy
      groups = [(int(_condims_static(m)[0]), slice(None))]
    else:
      c_dist, c_pos, c_frame = con_dist, con_pos, con_frame
      c_friction, c_solref, c_solimp = (
          lv.con_friction, lv.con_solref, lv.con_solimp
      )
      dmask, invweight = dmask_all, invweight_all
      condim_arr = _condims_static(m)
      groups = [
          (cd, np.nonzero(condim_arr == cd)[0])
          for cd in sorted(set(int(x) for x in condim_arr))
      ]

    # translational jacobian of contact point on each body: (nc, nv, 3)
    ang = lv.cdof[:, :3]
    lin = lv.cdof[:, 3:]
    rel = c_pos[:, None, :] - lv.cdof_anchor[None, :, :]
    jac_t = lin[None] + jnp.cross(
        jnp.broadcast_to(ang[None], rel.shape), rel
    )
    jac_p = jac_t * dmask[:, :, None]  # relative: body2 − body1
    jac_r = ang[None] * dmask[:, :, None]

    n = c_frame[:, 0]
    Jn = jnp.einsum('cvk,ck->cv', jac_p, n)
    for cd, sel in groups:
      k = nsel if isinstance(sel, slice) else len(sel)
      if cd == 1:
        J_parts.append(Jn[sel])
        pos_parts.append(c_dist[sel])
        solref_parts.append(c_solref[sel])
        solimp_parts.append(c_solimp[sel])
        diagA_parts.append(invweight[sel])
        floss_parts.append(jnp.zeros(k, dtype=dtype))
        margin_parts.append(jnp.zeros(k, dtype=dtype))
        continue
      # friction axes: t1, t2, torsion, roll1, roll2 (first cd−1 used)
      axes = [
          jnp.einsum('cvk,ck->cv', jac_p[sel], c_frame[sel, 1]),
          jnp.einsum('cvk,ck->cv', jac_p[sel], c_frame[sel, 2]),
          jnp.einsum('cvk,ck->cv', jac_r[sel], n[sel]),
          jnp.einsum('cvk,ck->cv', jac_r[sel], c_frame[sel, 1]),
          jnp.einsum('cvk,ck->cv', jac_r[sel], c_frame[sel, 2]),
      ]
      nf = cd - 1
      axes = jnp.stack(axes[:nf], axis=1)  # (k, nf, nv)
      mus = c_friction[sel, :nf]  # (k, nf)
      # rows: Jn ± mu_i * axis_i  → (k, nf, 2, nv) → (k·nf·2, nv)
      pm = jnp.array([1.0, -1.0], dtype=dtype)
      rows = (
          Jn[sel][:, None, None, :]
          + pm[None, None, :, None] * (mus[..., None] * axes)[:, :, None, :]
      ).reshape(k * nf * 2, nv)
      nrep = nf * 2
      mu0 = c_friction[sel, 0]
      diagA_c = jnp.repeat(
          invweight[sel]
          * 2.0
          * jnp.maximum(mu0 * mu0, _MJ_MINVAL)
          / m.opt.impratio,
          nrep,
      )
      J_parts.append(rows)
      pos_parts.append(jnp.repeat(c_dist[sel], nrep))
      solref_parts.append(jnp.repeat(c_solref[sel], nrep, axis=0))
      solimp_parts.append(jnp.repeat(c_solimp[sel], nrep, axis=0))
      diagA_parts.append(diagA_c)
      floss_parts.append(jnp.zeros(k * nrep, dtype=dtype))
      margin_parts.append(jnp.zeros(k * nrep, dtype=dtype))

  cat = lambda parts, empty: (
      jnp.concatenate(parts) if parts else jnp.zeros(empty, dtype=dtype)
  )
  J = cat(J_parts, (0, nv))
  pos = cat(pos_parts, (0,))
  solref = cat(solref_parts, (0, 2))
  solimp = cat(solimp_parts, (0, 5))
  diagA = cat(diagA_parts, (0,))
  floss = cat(floss_parts, (0,))
  margin = cat(margin_parts, (0,))

  kind = lay.kind
  assert J.shape[0] == lay.nefc, (J.shape, lay)

  # one-sided rows (limits, contacts) deactivate when pos >= margin... the
  # impedance already vanishes smoothly; additionally gate D to ~0 for
  # clearly separated rows to keep the Newton Hessian well-behaved.
  imp = _impedance(solimp, pos - margin)
  k, b = _kbi(solref, solimp, pos, solimp[:, 1])
  vel = J @ lv.qvel
  aref = -b * vel - k * imp * (pos - margin)
  R = jnp.maximum(_MJ_MINVAL, (1.0 - imp) / jnp.maximum(imp, _MJ_MINVAL) * diagA)
  D = 1.0 / R

  onesided = (kind == LIMIT) | (kind == CONTACT)
  separated = pos - margin >= 0.0
  D = jnp.where(jnp.asarray(onesided) & separated, 0.0, D)
  aref = jnp.where(jnp.asarray(onesided) & separated, 0.0, aref)

  return Efc(J=J, aref=aref, D=D, floss=floss, kind=kind)
