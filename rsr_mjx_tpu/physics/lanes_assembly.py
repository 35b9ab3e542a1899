"""Batch-in-lanes constraint assembly (round-4 perf work).

The vmapped per-env assembly (constraint.assemble_from_leaves) batches to
batch-MAJOR intermediates like ``(B, ncon, nv, 3)`` whose minor dims (3,
nv≈20) waste most of the TPU's (8, 128) vector-register tile — the same
lane-wasting disease the round-3 collision rewrite fixed
(PROFILE.md "bottleneck ranking": 2.15 ms of the 3.59 ms substep at
B=1024).  This module assembles the identical constraint system with the
batch in the minor (lane) dimension throughout:

    J     (nv, nefc, B)      aref/D/floss   (nefc, B)

and feeds the fused Newton kernel (linalg_kernels) directly — no
batch-major J is ever materialized and the kernel-entry transpose round
trip disappears.  Every transpose used here keeps B minor, which lowers
to a cheap strided copy (no lane shuffles).

Row semantics and ORDER are exactly constraint.assemble_from_leaves's:
[equality | dof friction | joint limits | contact pyramids]; parity is
pinned by tests/test_lanes_assembly.py against the reference per-env
path.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rsr_mjx_tpu.physics import constraint as C
from rsr_mjx_tpu.physics.types import EqType, Model

_MJ_MINVAL = C._MJ_MINVAL
_MINIMP = C._MINIMP
_MAXIMP = C._MAXIMP


def _lanes(x):
  """Batch-major (B, ...) → lanes (..., B)."""
  return jnp.moveaxis(x, 0, -1)


def _impedance_l(si, pos):
  """constraint._impedance with solimp as (r, 5, B) and pos (r, B)."""
  dmin = jnp.clip(si[:, 0], _MINIMP, _MAXIMP)
  dmax = jnp.clip(si[:, 1], _MINIMP, _MAXIMP)
  width = jnp.maximum(si[:, 2], _MJ_MINVAL)
  mid = jnp.clip(si[:, 3], _MINIMP, _MAXIMP)
  power = jnp.maximum(si[:, 4], 1.0)
  x = jnp.clip(jnp.abs(pos) / width, 0.0, 1.0)
  a = 1.0 / jnp.power(mid, power - 1.0)
  b = 1.0 / jnp.power(1.0 - mid, power - 1.0)
  y = jnp.where(
      x <= mid,
      a * jnp.power(x, power),
      1.0 - b * jnp.power(1.0 - x, power),
  )
  return jnp.clip(dmin + y * (dmax - dmin), _MINIMP, _MAXIMP)


def _kbi_l(sr, dmax):
  """constraint._kbi with solref (r, 2, B); dmax (r, B)."""
  timeconst, dampratio = sr[:, 0], sr[:, 1]
  standard = timeconst > 0
  tc = jnp.where(standard, jnp.maximum(timeconst, _MJ_MINVAL), 1.0)
  dr = jnp.where(standard, jnp.maximum(dampratio, _MJ_MINVAL), 1.0)
  k_std = 1.0 / jnp.maximum(dmax * dmax * tc * tc * dr * dr, _MJ_MINVAL)
  b_std = 2.0 / jnp.maximum(dmax * tc, _MJ_MINVAL)
  k_dir = -timeconst / jnp.maximum(dmax * dmax, _MJ_MINVAL)
  b_dir = -dampratio / jnp.maximum(dmax, _MJ_MINVAL)
  return (
      jnp.where(standard, k_std, k_dir),
      jnp.where(standard, b_std, b_dir),
  )


def _pair_slot0(m: Model) -> np.ndarray:
  """Static first-slot id of each collision pair (slot order)."""
  out = []
  for _, P, k, off in C.pair_groups(m):
    out.append(off + np.arange(P) * k)
  return np.concatenate(out) if out else np.zeros((0,), np.int64)


def assemble_lanes(
    m: Model, lv: C.AssembleLeaves, basis: bool = False,
    dyn_lanes: bool = False,
):
  """Lanes-layout narrow phase + assembly over a batch.

  ``basis=True`` (round-5, pyramid-basis kernel): instead of expanding
  each selected contact into its 2·(condim−1) pyramid rows, return the
  contact BASIS — U grouped [Jn | μ₁A₁ | …], per-basis aref components,
  and the per-contact D (identical across a contact's rows) — plus the
  structured rows [equality | dof friction | joint limits] as a normal
  (J, aref, D, floss) block.  Requires the ncon_sel selection path with
  uniform condim ≥ 2.  Returns
  (J_s, aref_s, D_s, floss_s, dist_bm, U, arefU, D_c, naxes).

  ``lv`` leaves are batch-major with a leading batch axis B, EXCEPT
  ``hfield_data`` (always unbatched) and ``geom_size`` /
  ``con_friction/solref/solimp/invweight`` which may be unbatched when
  domain randomization does not touch them (the caller broadcasts
  DR-batched leaves only; see solver._build_fused's _NO_BCAST).

  Round-5: the narrow phase (collision._collide_lanes) runs inside, in
  lanes layout, so the dynamic contact features (dist/pos/frame) feed the
  Jacobian build without ever becoming batch-major — round 4 spent
  ~0.8 ms/substep at B=1024 transposing them out of the collider and back
  (PROFILE.md bottleneck #1).

  Returns (J (nv, nefc, B), aref (nefc, B), D (nefc, B), floss (nefc, B),
  dist_bm (B, ncon)) — dist crosses to batch-major for Data.contact.
  """
  lay = C.layout_cached(m)
  nv = m.nv
  # ``dyn_lanes``: the six DYNAMIC leaves (qpos, qvel, cdof, cdof_anchor,
  # geom_xpos, geom_xmat) arrive ALREADY in lanes layout (…, B) — the
  # merged fused-forward region (physics/fwd_fused.py) produces them in
  # lanes and this skips the batch-major round trip.  Model leaves keep
  # the batch-major contract either way.
  dl = (lambda x: x) if dyn_lanes else _lanes
  B = lv.qpos.shape[-1] if dyn_lanes else lv.qpos.shape[0]
  dtype = lv.qpos.dtype
  if basis and not m.ncon:
    raise ValueError('basis assembly requires a model with contacts')

  qpos_l = dl(lv.qpos)  # (nq, B)
  qvel_l = dl(lv.qvel)  # (nv, B)
  inv0_l = _lanes(lv.dof_invweight0)  # (nv, B)

  J_blocks = []  # (nv, r, B)
  pos_blocks = []  # (r, B)
  sr_blocks = []  # (r, 2, B)
  si_blocks = []  # (r, 5, B)
  diagA_blocks = []  # (r, B)
  floss_blocks = []  # (r, B)
  margin_blocks = []  # (r, B)

  zrow = lambda r: jnp.zeros((r, B), dtype)

  # ---- equality (JOINT)
  if m.neq:
    eqd_l = _lanes(lv.eq_data)  # (neq, 5, B)
    eqsr_l = _lanes(lv.eq_solref)  # (neq, 2, B)
    eqsi_l = _lanes(lv.eq_solimp)  # (neq, 5, B)
    for e in range(m.neq):
      t = int(m.eq_type[e])
      if t != EqType.JOINT:
        raise NotImplementedError('connect/weld equality not yet implemented')
      j1 = int(m.eq_obj1id[e])
      j2 = int(m.eq_obj2id[e])
      q1adr, v1adr = int(m.jnt_qposadr[j1]), int(m.jnt_dofadr[j1])
      data = eqd_l[e]  # (5, B)
      onehot1 = (
          jax.lax.broadcasted_iota(jnp.int32, (nv, 1, 1), 0) == v1adr
      ).astype(dtype)
      row = jnp.broadcast_to(onehot1, (nv, 1, B))
      if j2 >= 0 and j2 < m.njnt and j2 != j1:
        q2adr, v2adr = int(m.jnt_qposadr[j2]), int(m.jnt_dofadr[j2])
        dif = qpos_l[q2adr] - _lanes(lv.qpos0)[q2adr]  # (B,)
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
        pos = (qpos_l[q1adr] - _lanes(lv.qpos0)[q1adr]) - poly  # (B,)
        onehot2 = (
            jax.lax.broadcasted_iota(jnp.int32, (nv, 1, 1), 0) == v2adr
        ).astype(dtype)
        row = row - onehot2 * dpoly[None, None, :]
        diagA = inv0_l[v1adr] + inv0_l[v2adr]
      else:
        pos = qpos_l[q1adr] - _lanes(lv.qpos0)[q1adr] - data[0]
        diagA = inv0_l[v1adr]
      J_blocks.append(row)
      pos_blocks.append(pos[None])
      sr_blocks.append(eqsr_l[e][None])
      si_blocks.append(eqsi_l[e][None])
      diagA_blocks.append(diagA[None])
      floss_blocks.append(zrow(1))
      margin_blocks.append(zrow(1))

  # ---- dof friction loss
  eye_l = jnp.broadcast_to(jnp.eye(nv, dtype=dtype)[:, :, None], (nv, nv, B))
  J_blocks.append(eye_l)
  pos_blocks.append(zrow(nv))
  sr_blocks.append(_lanes(lv.dof_solref))  # (nv, 2, B)
  si_blocks.append(_lanes(lv.dof_solimp))  # (nv, 5, B)
  diagA_blocks.append(inv0_l)
  floss_blocks.append(_lanes(lv.dof_frictionloss))
  margin_blocks.append(zrow(nv))

  # ---- joint limits (interleaved lo/hi rows per limited joint)
  lim_j = np.nonzero(m.jnt_limited.arr != 0)[0]
  L = len(lim_j)
  if L:
    qadr = m.jnt_qposadr.arr[lim_j]
    vadr = m.jnt_dofadr.arr[lim_j]
    # static ± one-hot row pattern (nv, 2L)
    pattern = np.zeros((nv, 2 * L), np.float32)
    for i, v in enumerate(vadr):
      pattern[v, 2 * i] = 1.0
      pattern[v, 2 * i + 1] = -1.0
    J_blocks.append(
        jnp.broadcast_to(jnp.asarray(pattern, dtype)[:, :, None],
                         (nv, 2 * L, B))
    )
    jr_l = _lanes(lv.jnt_range)  # (njnt, 2, B)
    q = qpos_l[qadr]  # (L, B)
    lo = jr_l[lim_j, 0]  # (L, B)
    hi = jr_l[lim_j, 1]
    posl = jnp.stack([q - lo, hi - q], axis=1).reshape(2 * L, B)
    pos_blocks.append(posl)
    jsr_l = _lanes(lv.jnt_solref)[lim_j]  # (L, 2, B)
    jsi_l = _lanes(lv.jnt_solimp)[lim_j]
    sr_blocks.append(jnp.repeat(jsr_l, 2, axis=0))
    si_blocks.append(jnp.repeat(jsi_l, 2, axis=0))
    diagA_blocks.append(jnp.repeat(inv0_l[vadr], 2, axis=0))
    floss_blocks.append(zrow(2 * L))
    margin_blocks.append(jnp.repeat(_lanes(lv.jnt_margin)[lim_j], 2, axis=0))

  # ---- contacts
  if m.ncon:
    from rsr_mjx_tpu.physics import collision as _col

    dmask_all = C.contact_dmask(m).astype(np.float32)  # (ncon, nv) static
    nsel = C._selection_size(m)
    impratio = m.opt.impratio

    # narrow phase, in lanes.  geom_size may be unbatched (no randomizer
    # touches it in either model family) → trailing batch 1 broadcasts.
    cfg = _col._cfg_of(m)
    size_l = (
        _lanes(lv.geom_size) if lv.geom_size.ndim == 3
        else lv.geom_size[..., None]
    )
    dist_l, pos_l, frame_l = _col._collide_lanes(
        cfg, size_l, None, None, None, None, lv.hfield_data,
        dl(lv.geom_xpos), dl(lv.geom_xmat),
        include_solparams=False,
    )  # (ncon, B), (ncon, 3, B), (ncon, 3, 3, B)
    dist_bm = jnp.moveaxis(dist_l, -1, 0)  # (B, ncon) — crosses back

    # per-slot solver params: unbatched (ncon, c) unless DR-batched
    st_batched = lv.con_friction.ndim == 3

    if nsel:
      # top-k nearest slots (global ascending-dist order, lowest-index
      # ties — identical to the per-env lax.top_k path).  On TPU the whole
      # selection runs inside one Pallas kernel (nsel masked-min
      # extractions over VMEM-resident lanes arrays, static per-pair
      # tables gathered at pair level); the XLA fallback is the one-hot
      # einsum formulation.
      from rsr_mjx_tpu.physics import linalg_kernels as _lk

      feat_dyn = jnp.concatenate(
          [dist_l[:, None], pos_l, frame_l.reshape(m.ncon, 9, B)], axis=1
      )  # (ncon, 13, B)
      if st_batched:
        # DR-batched contact params ride the same gathers as the dynamic
        # features
        feat_stb = jnp.concatenate(
            [lv.con_friction, lv.con_solref, lv.con_solimp,
             lv.con_invweight[..., None]], axis=2
        )  # (B, ncon, 13)
        feat_dyn = jnp.concatenate([feat_dyn, _lanes(feat_stb)], axis=1)
        pair_table = np.asarray(dmask_all, np.float32)[_pair_slot0(m)]
      else:
        feat_st = jnp.concatenate(
            [lv.con_friction, lv.con_solref, lv.con_solimp,
             lv.con_invweight[:, None]], axis=1
        )  # (ncon, 13) — constant within a pair
        pair_table = None  # built below (needs concrete feat_st)
      nFd = feat_dyn.shape[1]

      # DR-batched contact params double the kernel's VMEM-resident
      # feature block past the scoped-vmem budget — that (rare) case takes
      # the einsum fallback instead
      if _lk._use_tpu_kernels() and not st_batched:
        slot0 = _pair_slot0(m)
        pair_struct = tuple(
            (P, k, off) for _, P, k, off in C.pair_groups(m)
        )
        ptab = jnp.concatenate(
            [feat_st[slot0].astype(dtype),
             jnp.asarray(dmask_all[slot0], dtype)], axis=1
        )  # (Ptot, 13 + nv)
        sel = _lk.contact_select_lanes(
            pair_struct, nsel, dist_l, feat_dyn, ptab
        )  # (nsel, nFd + nst, B)
      else:
        _, sel_idx = jax.lax.top_k(-dist_bm, nsel)  # (B, nsel)
        onehot = (
            sel_idx[..., None] == jnp.arange(m.ncon, dtype=sel_idx.dtype)
        ).astype(dtype)  # (B, nsel, ncon)
        parts = [jnp.einsum('bsc,cfb->sfb', onehot, feat_dyn)]
        if not st_batched:
          parts.append(_lanes(
              jnp.einsum('bsc,cf->bsf', onehot, feat_st.astype(dtype))
          ))
        parts.append(_lanes(
            jnp.einsum('bsc,cv->bsv', onehot, jnp.asarray(dmask_all, dtype))
        ))
        sel = jnp.concatenate(parts, axis=1)

      c_dist = sel[:, 0]  # (nc, B)
      c_pos = sel[:, 1:4]  # (nc, 3, B)
      c_frame = sel[:, 4:13]  # (nc, 9, B)
      sel_st = sel[:, 13:26] if st_batched else sel[:, nFd : nFd + 13]
      c_friction = sel_st[:, 0:5]
      c_solref = sel_st[:, 5:7]
      c_solimp = sel_st[:, 7:12]
      c_invw = sel_st[:, 12]
      dm_off = nFd if st_batched else nFd + 13
      dmask = sel[:, dm_off : dm_off + nv]  # (nc, nv, B)
      groups = [(int(C._condims_static(m)[0]), slice(None))]
    else:
      bc = lambda a: jnp.broadcast_to(a, a.shape[:-1] + (B,))
      c_dist = dist_l  # (ncon, B)
      c_pos = pos_l  # (ncon, 3, B)
      c_frame = frame_l.reshape(m.ncon, 9, B)
      if st_batched:
        c_friction = _lanes(lv.con_friction)
        c_solref = _lanes(lv.con_solref)
        c_solimp = _lanes(lv.con_solimp)
        c_invw = _lanes(lv.con_invweight)
      else:
        c_friction = bc(lv.con_friction[..., None])
        c_solref = bc(lv.con_solref[..., None])
        c_solimp = bc(lv.con_solimp[..., None])
        c_invw = bc(lv.con_invweight[..., None])
      dmask = jnp.broadcast_to(
          jnp.asarray(dmask_all, dtype)[:, :, None], (m.ncon, nv, B)
      )
      condim_arr = C._condims_static(m)
      groups = [
          (cd, np.nonzero(condim_arr == cd)[0])
          for cd in sorted(set(int(x) for x in condim_arr))
      ]

    cd_l = dl(lv.cdof)  # (nv, 6, B)
    anch_l = dl(lv.cdof_anchor)  # (nv, 3, B)
    ang = [cd_l[:, k] for k in range(3)]  # each (nv, B)
    lin = [cd_l[:, 3 + k] for k in range(3)]

    def contract(jac, vec9, off):
      """Σ_k jac[k] * frame-comp (off+k); jac[k] (nc, nv, B)."""
      return sum(
          jac[k] * vec9[:, off + k][:, None, :] for k in range(3)
      )

    jac_p = []
    jac_r = []
    for k in range(3):
      relk2 = c_pos[:, (k + 2) % 3][:, None, :] - anch_l[:, (k + 2) % 3][None]
      relk1 = c_pos[:, (k + 1) % 3][:, None, :] - anch_l[:, (k + 1) % 3][None]
      jac_t = (
          lin[k][None]
          + ang[(k + 1) % 3][None] * relk2
          - ang[(k + 2) % 3][None] * relk1
      )  # (nc, nv, B)
      jac_p.append(jac_t * dmask)
      jac_r.append(ang[k][None] * dmask)

    Jn = contract(jac_p, c_frame, 0)  # (nc, nv, B)

    if basis:
      (cd0, sel_g0) = groups[0]
      if not (nsel and isinstance(sel_g0, slice) and cd0 >= 2):
        raise ValueError(
            'basis assembly requires the ncon_sel path with condim >= 2'
        )
      nf = cd0 - 1
      axes = [
          contract(jac_p, c_frame, 3),  # t1
          contract(jac_p, c_frame, 6),  # t2
          contract(jac_r, c_frame, 0),  # torsion
          contract(jac_r, c_frame, 3),  # roll1
          contract(jac_r, c_frame, 6),  # roll2
      ][:nf]
      U_parts = [jnp.swapaxes(Jn, 0, 1)]  # (nv, nc, B)
      velU = [jnp.sum(Jn * qvel_l[None], axis=1)]  # (nc, B)
      for i in range(nf):
        Ai = c_friction[:, i][:, None, :] * axes[i]  # μᵢAᵢ (nc, nv, B)
        U_parts.append(jnp.swapaxes(Ai, 0, 1))
        velU.append(jnp.sum(Ai * qvel_l[None], axis=1))
      U_basis = jnp.concatenate(U_parts, axis=1)  # (nv, (nf+1)·nc, B)
      imp_c = _impedance_l(c_solimp, c_dist)
      kk_c, bb_c = _kbi_l(c_solref, c_solimp[:, 1])
      mu0 = c_friction[:, 0]
      diagA_c = c_invw * 2.0 * jnp.maximum(mu0 * mu0, _MJ_MINVAL) / impratio
      Rreg_c = jnp.maximum(
          _MJ_MINVAL, (1.0 - imp_c) / jnp.maximum(imp_c, _MJ_MINVAL)
          * diagA_c
      )
      sep_c = c_dist >= 0.0
      D_c = jnp.where(sep_c, 0.0, 1.0 / Rreg_c)
      aref_n = jnp.where(
          sep_c, 0.0, -bb_c * velU[0] - kk_c * imp_c * c_dist
      )
      arefU = jnp.concatenate(
          [aref_n]
          + [jnp.where(sep_c, 0.0, -bb_c * v) for v in velU[1:]], axis=0
      )
      basis_out = (U_basis, arefU, D_c, nf)
      groups = []

    for cd, sel_g in groups:
      if isinstance(sel_g, slice):
        k = nsel
        g = lambda x: x
      else:
        k = len(sel_g)
        g = lambda x: x[sel_g]
      if cd == 1:
        J_blocks.append(jnp.swapaxes(g(Jn), 0, 1))  # (nv, k, B)
        pos_blocks.append(g(c_dist))
        sr_blocks.append(g(c_solref))
        si_blocks.append(g(c_solimp))
        diagA_blocks.append(g(c_invw))
        floss_blocks.append(zrow(k))
        margin_blocks.append(zrow(k))
        continue
      nf = cd - 1
      axes = [
          contract(jac_p, c_frame, 3),  # t1
          contract(jac_p, c_frame, 6),  # t2
          contract(jac_r, c_frame, 0),  # torsion
          contract(jac_r, c_frame, 3),  # roll1
          contract(jac_r, c_frame, 6),  # roll2
      ][:nf]
      Jn_g = g(Jn)
      rows = []
      for i in range(nf):
        mu_i = g(c_friction[:, i])[:, None, :]  # (k, 1, B)
        ax = g(axes[i])
        rows.append(Jn_g + mu_i * ax)
        rows.append(Jn_g - mu_i * ax)
      nrep = nf * 2
      # (k, nrep, nv, B) → (k·nrep, nv, B) → (nv, k·nrep, B); row order
      # c-major then axis then ± — identical to the reference path
      rows = jnp.stack(rows, axis=1).reshape(k * nrep, nv, B)
      J_blocks.append(jnp.swapaxes(rows, 0, 1))
      rep = lambda x: jnp.repeat(x, nrep, axis=0)
      pos_blocks.append(rep(g(c_dist)))
      sr_blocks.append(rep(g(c_solref)))
      si_blocks.append(rep(g(c_solimp)))
      mu0 = g(c_friction[:, 0])
      diagA_blocks.append(
          rep(
              g(c_invw)
              * 2.0
              * jnp.maximum(mu0 * mu0, _MJ_MINVAL)
              / impratio
          )
      )
      floss_blocks.append(zrow(k * nrep))
      margin_blocks.append(zrow(k * nrep))

  J = jnp.concatenate(J_blocks, axis=1)  # (nv, R, B)
  pos = jnp.concatenate(pos_blocks, axis=0)  # (R, B)
  sr = jnp.concatenate(sr_blocks, axis=0)  # (R, 2, B)
  si = jnp.concatenate(si_blocks, axis=0)  # (R, 5, B)
  diagA = jnp.concatenate(diagA_blocks, axis=0)
  floss = jnp.concatenate(floss_blocks, axis=0)
  margin = jnp.concatenate(margin_blocks, axis=0)

  if basis:
    n_struct = lay.n_eq + lay.n_fri + lay.n_lim
    kind = lay.kind[:n_struct]
    assert J.shape[1] == n_struct, (J.shape, lay)
  else:
    kind = lay.kind
    assert J.shape[1] == lay.nefc, (J.shape, lay)

  imp = _impedance_l(si, pos - margin)
  kk, bb = _kbi_l(sr, si[:, 1])  # dmax = raw solimp[1] (reference parity)
  vel = jnp.sum(J * qvel_l[:, None, :], axis=0)  # (R, B)
  aref = -bb * vel - kk * imp * (pos - margin)
  Rreg = jnp.maximum(
      _MJ_MINVAL, (1.0 - imp) / jnp.maximum(imp, _MJ_MINVAL) * diagA
  )
  D = 1.0 / Rreg

  onesided = jnp.asarray(
      ((kind == C.LIMIT) | (kind == C.CONTACT))[:, None]
  )
  separated = pos - margin >= 0.0
  D = jnp.where(onesided & separated, 0.0, D)
  aref = jnp.where(onesided & separated, 0.0, aref)

  if not m.ncon:
    dist_bm = jnp.zeros((B, 0), dtype)
  if basis:
    return (J, aref, D, floss, dist_bm) + basis_out
  return J, aref, D, floss, dist_bm
