"""Pallas TPU kernels for the batched small linear algebra of the physics
step (reference role: the XLA kernels MJX leans on for its solver,
SURVEY §2.9 / §7 step 8).

Why these exist: the physics hot loop is thousands of *tiny* (nv≈20)
per-env dense problems.  XLA's builtin ``cholesky``/``cho_solve`` lower to
blocked LAPACK-style loops that serialize terribly for batched tiny
matrices (measured 9.4 ms per solve at B=4096 on v5e — scripts/
microbench_chol.py), and every elementwise pass over the (B, nefc, nv)
Jacobian re-reads ~19 MB from HBM.  The kernels here put the **batch in
the 128-lane dimension** so each Cholesky column update is one VPU op over
all envs, and the Newton kernel keeps J resident in VMEM across all solver
iterations — one HBM read per substep instead of ~a dozen.

Layout convention: arrays arrive batch-major ``(B, ...)`` from the vmapped
pipeline and are transposed here to batch-minor ``(..., B)`` so B maps to
lanes.  All kernels are f32 and shape-static.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# batch lanes per grid block
_BE = 128
_BIG = jnp.float32(1e30)

# force interpreter-mode kernels (CPU correctness tests)
_INTERPRET = os.environ.get('RSR_PALLAS_INTERPRET', '0') == '1'


def _round_up(x: int, m: int) -> int:
  return -(-x // m) * m


# ---------------------------------------------------------------------------
# In-kernel batched Cholesky + solve (batch in lanes).
#
# H: (n, n, E) — H[a, b, e] is entry (a, b) of env e's SPD matrix.  The
# factorization is the right-looking outer-product form: each column j is
# one rsqrt + one rank-1 update of the trailing submatrix, every op
# covering all E lanes at once.  n is static and tiny (≤ ~32) so the loop
# unrolls at trace time.
# ---------------------------------------------------------------------------


def _row_iota(n: int, dtype=jnp.int32):
  """(n, 1) row-index iota (Pallas kernels may not capture array
  constants, so masks are derived from iota ops instead)."""
  return jax.lax.broadcasted_iota(dtype, (n, 1), 0)


def _chol_cols(H, n: int, eps: float):
  """Returns (cols, djs): cols[j] is column j of L as (n, E) (zeros above
  the diagonal), djs[j] = L[j, j] as (1, E)."""
  dtype = H.dtype
  iota = _row_iota(n)
  S = H
  cols, djs = [], []
  for j in range(n):
    mask_ge = (iota >= j).astype(dtype)
    Sj = S[j]  # (n, E)
    dj2 = jnp.maximum(Sj[j : j + 1], eps)  # (1, E)
    inv = jax.lax.rsqrt(dj2)
    cols.append(Sj * inv * mask_ge)
    djs.append(dj2 * inv)
    if j < n - 1:
      c = cols[j]
      S = S - c[None, :, :] * c[:, None, :]
  return cols, djs


def _cho_solve_cols(cols, djs, b, n: int):
  """Solve L Lᵀ x = b given the column factor; b, x: (n, E)."""
  iota = _row_iota(n)
  g = b
  ys = []
  for j in range(n):
    yj = g[j : j + 1] / djs[j]  # (1, E)
    ys.append(yj)
    g = g - cols[j] * yj
  x = jnp.zeros_like(b)
  for j in range(n - 1, -1, -1):
    onehot = (iota == j).astype(b.dtype)
    t = jnp.sum(cols[j] * x, axis=0, keepdims=True)  # (1, E)
    x = x + onehot * ((ys[j] - t) / djs[j])
  return x


# ---------------------------------------------------------------------------
# Batched SPD solve: x = A⁻¹ b for (B, n, n) SPD A.
# Used for qacc_smooth (M⁻¹ f) and the implicit-integrator solve.
# ---------------------------------------------------------------------------


def _spd_kernel(n: int, eps: float, A_ref, b_ref, x_ref):
  cols, djs = _chol_cols(A_ref[...], n, eps)
  x_ref[...] = _cho_solve_cols(cols, djs, b_ref[...], n)


def spd_solve_lanes(At: jax.Array, bt: jax.Array, eps: float = 1e-12):
  """Lanes-layout batched SPD solve; A (n, n, B), b (n, B) → x (n, B)."""
  n, B = bt.shape
  Bp = _round_up(max(B, 1), _BE)
  if Bp != B:
    eye = jnp.broadcast_to(jnp.eye(n, dtype=At.dtype)[:, :, None],
                           (n, n, Bp - B))
    At = jnp.concatenate([At, eye], axis=-1)
    bt = jnp.concatenate([bt, jnp.zeros((n, Bp - B), bt.dtype)], axis=-1)
  xt = pl.pallas_call(
      functools.partial(_spd_kernel, n, eps),
      out_shape=jax.ShapeDtypeStruct((n, Bp), bt.dtype),
      grid=(Bp // _BE,),
      in_specs=[
          pl.BlockSpec((n, n, _BE), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((n, _BE), lambda i: (0, i), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((n, _BE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
      interpret=_INTERPRET,
  )(At, bt)
  return xt[:, :B]


def spd_solve_batched(A: jax.Array, b: jax.Array, eps: float = 1e-12):
  """Batched SPD solve on TPU; A (B, n, n), b (B, n) → (B, n), all f32."""
  xt = spd_solve_lanes(
      jnp.transpose(A, (1, 2, 0)), jnp.transpose(b, (1, 0)), eps
  )
  return jnp.transpose(xt, (1, 0))


def _use_tpu_kernels() -> bool:
  return _INTERPRET or jax.default_backend() == 'tpu'


@jax.custom_vjp
def spd_solve(A: jax.Array, b: jax.Array) -> jax.Array:
  """x = A⁻¹ b for SPD A — single system (n, n), (n,) → (n,).

  Under ``jax.vmap`` this dispatches to the Pallas lanes-batched kernel on
  TPU (custom_vmap rule); the unbatched / non-TPU path is XLA Cholesky.
  Gradients: one extra solve with the same A (A symmetric).
  """
  return _spd_primal(A, b)


from jax.custom_batching import custom_vmap  # noqa: E402


@custom_vmap
def _spd_primal(A, b):
  chol = jax.scipy.linalg.cholesky(A, lower=True)
  return jax.scipy.linalg.cho_solve((chol, True), b)


@_spd_primal.def_vmap
def _spd_primal_vmap(axis_size, in_batched, A, b):
  del axis_size
  if (
      _use_tpu_kernels()
      and A.dtype == jnp.float32
      and A.ndim == 3
      and all(in_batched)
  ):
    out = spd_solve_batched(A, b)
  else:
    out = jax.vmap(
        lambda A, b: jax.scipy.linalg.cho_solve(
            (jax.scipy.linalg.cholesky(A, lower=True), True), b
        )
    )(A, b)
  return out, True


def _spd_fwd(A, b):
  x = _spd_primal(A, b)
  return x, (A, x)


def _spd_bwd(res, g):
  A, x = res
  w = _spd_primal(A, g)  # A symmetric ⇒ A⁻ᵀ g = A⁻¹ g
  return (-w[..., :, None] * x[..., None, :], w)


spd_solve.defvjp(_spd_fwd, _spd_bwd)


# ---------------------------------------------------------------------------
# Fused Newton solver kernel.
#
# Solves  min_x ½(x−a0)ᵀM(x−a0) + Σᵢ sᵢ(Jᵢx − arefᵢ)  for a whole batch,
# with the MuJoCo soft-constraint penalties (see physics/solver.py).  The
# entire fixed-iteration Newton loop — residual, penalty derivatives,
# Hessian assembly, Cholesky, line search — runs on one VMEM-resident copy
# of J per block.  Static per-model row-kind masks are baked in as
# constants.
#
# Layouts inside the kernel (E = 128 batch lanes):
#   J     (nv, R, E)   — J[a] is a free leading-index view (R, E)
#   M     (nv, nv, E)
#   vecs  (nv, E) / rows (R, E)
# ---------------------------------------------------------------------------


def _penalty_se(r, D, floss, onesided_m, fric_m):
  """(ŝ', ŝ'') of the piecewise penalties, all (R, E)."""
  grad_q = D * r
  # active = r < 0 for one-sided rows, always for two-sided (pure boolean
  # algebra — Mosaic cannot lower a select between a bool vector and a
  # python-scalar bool)
  active = (r < 0) | (onesided_m <= 0)
  lim = jnp.where(fric_m > 0, floss, 1e30)
  in_quad = jnp.abs(grad_q) <= lim
  s_grad = jnp.where(in_quad, grad_q, jnp.sign(r) * lim)
  s_curv = jnp.where(in_quad, D, 0.0)
  s_grad = jnp.where(active, s_grad, 0.0)
  s_curv = jnp.where(active, s_curv, 0.0)
  inert = (fric_m > 0) & (floss <= 0)
  s_grad = jnp.where(inert, 0.0, s_grad)
  s_curv = jnp.where(inert, 0.0, s_curv)
  return s_grad, s_curv


def _penalty_cost_rows(r, D, floss, onesided_m, fric_m):
  """Per-row penalty cost sᵢ(rᵢ), (R, E) — for the in-kernel accept test."""
  active = (r < 0) | (onesided_m <= 0)
  quad = 0.5 * D * r * r
  lim = jnp.where(fric_m > 0, floss, 1e30)
  in_quad = jnp.abs(D * r) <= lim
  tail = floss * jnp.abs(r) - 0.5 * floss * floss / jnp.maximum(D, 1e-12)
  cost = jnp.where(in_quad, quad, tail)
  cost = jnp.where(active, cost, 0.0)
  cost = jnp.where((fric_m > 0) & (floss <= 0), 0.0, cost)
  return cost


def _newton_kernel(
    nv: int,
    R: int,
    iters: int,
    ls_iters: int,
    M_ref,
    a0_ref,
    x0_ref,
    J_ref,
    aref_ref,
    D_ref,
    fl_ref,
    ones_ref,
    fric_ref,
    x_out,
    f_out,
    qf_out,
):
  dtype = M_ref.dtype
  J = J_ref[...]  # (nv, R, E)
  aref = aref_ref[...]  # (R, E)
  Dv = D_ref[...]
  fl = fl_ref[...]
  M = M_ref[...]  # (nv, nv, E)
  a0 = a0_ref[...]  # (nv, E)
  x = x0_ref[...]

  ones_m = ones_ref[...][:, :1]  # (R, 1) row-kind masks, grid-invariant
  fric_m = fric_ref[...][:, :1]
  ri = jax.lax.broadcasted_iota(jnp.int32, (nv, nv, 1), 0)
  ci = jax.lax.broadcasted_iota(jnp.int32, (nv, nv, 1), 1)
  eye = (ri == ci).astype(dtype)

  def matvec_J(v):  # (nv, E) -> (R, E)
    return jnp.sum(J * v[:, None, :], axis=0)

  def matvec_Jt(s):  # (R, E) -> (nv, E)
    return jnp.sum(J * s[None, :, :], axis=1)

  def matvec_M(v):  # (nv, E) -> (nv, E)
    return jnp.sum(M * v[None, :, :], axis=1)

  # NOTE: a quasi-Newton schedule (rebuild H every other iteration) was
  # tried and REVERTED: it cut the kernel ~30% but the TPU-lane divergence
  # regression (tests_tpu) measured 14 guard trips per 153.6k eval steps
  # vs 0 for full Newton — stale curvature under-converges exactly in the
  # impact regime that matters.  scripts/impact_probe.py is the acceptance
  # test for any future schedule change.
  r = matvec_J(x) - aref
  for _ in range(iters):
    s_grad, s_curv = _penalty_se(r, Dv, fl, ones_m, fric_m)
    xa = x - a0
    grad = matvec_M(xa) + matvec_Jt(s_grad)

    # H = M + Jᵀ diag(s_curv) J.  The product is symmetric, so only the
    # lower triangle b ≥ a is computed (nv(nv+1)/2 row-reductions instead
    # of nv² — this is the kernel's dominant FLOP cost) and mirrored.
    P = J * s_curv[None, :, :]  # (nv, R, E)
    tri_rows = []
    for a in range(nv):
      vals = jnp.sum(J[a][None, :, :] * P[a:], axis=1)  # (nv-a, E)
      if a:
        vals = jnp.concatenate(
            [jnp.zeros((a,) + vals.shape[1:], dtype), vals], axis=0
        )
      tri_rows.append(vals)
    T = jnp.stack(tri_rows, axis=0)  # lower-tri-in-rows: T[a, b≥a]
    H = T + jnp.swapaxes(T, 0, 1) - eye * T
    H = H + M
    # Scale-aware Tikhonov regularization (round-4 f32 hardening): an
    # absolute 1e-9 is invisible next to contact-stiffness diagonal
    # entries of ~1e6, leaving the f32 Cholesky free to break down under
    # deep multi-contact penetration — the round-3 divergence root cause.
    dmax = jnp.max(jnp.max(H * eye, axis=0), axis=0, keepdims=True)
    H = H + eye * (1e-6 * dmax + 1e-12)[None]
    cols, djs = _chol_cols(H, nv, 1e-12)
    dx = -_cho_solve_cols(cols, djs, grad, nv)

    # 1-D Newton line search on the piecewise-quadratic φ(t)
    mdx = matvec_M(dx)
    jdx = matvec_J(dx)
    g0 = jnp.sum(xa * mdx, axis=0, keepdims=True)  # (1, E)
    h0 = jnp.sum(dx * mdx, axis=0, keepdims=True)
    t = jnp.ones_like(g0)
    for _ in range(ls_iters):
      rt = r + t * jdx
      sg, sc = _penalty_se(rt, Dv, fl, ones_m, fric_m)
      dphi = g0 + t * h0 + jnp.sum(sg * jdx, axis=0, keepdims=True)
      ddphi = h0 + jnp.sum(sc * jdx * jdx, axis=0, keepdims=True)
      t = jnp.clip(t - dphi / jnp.maximum(ddphi, 1e-12), 0.0, 4.0)
    # Monotone accept: take the step only if it strictly decreases the
    # cost Δφ(t) = t·g0 + t²/2·h0 + Σs(r+t·jdx) − Σs(r).  A garbage
    # direction from a borderline f32 factorization is rejected (NaN
    # deltas compare false), so the iteration can never inject energy.
    s_old = jnp.sum(
        _penalty_cost_rows(r, Dv, fl, ones_m, fric_m), axis=0, keepdims=True
    )
    s_new = jnp.sum(
        _penalty_cost_rows(r + t * jdx, Dv, fl, ones_m, fric_m),
        axis=0, keepdims=True,
    )
    delta = t * g0 + 0.5 * t * t * h0 + s_new - s_old
    accept = delta < 0
    x = jnp.where(accept, x + t * dx, x)
    # carry the residual (saves a J matvec next iteration)
    r = jnp.where(accept, r + t * jdx, r)

  s_grad, _ = _penalty_se(r, Dv, fl, ones_m, fric_m)
  force = -s_grad
  x_out[...] = x
  f_out[...] = force
  qf_out[...] = matvec_Jt(force)


# ---------------------------------------------------------------------------
# Fused top-k contact selection kernel (round-5 perf).
#
# The XLA selection path (lax.top_k + (B, nsel, ncon) one-hot einsums)
# costs ~0.54 ms/substep at B=1024 on the Airbot scene — the one-hot is a
# 47 MB HBM intermediate and the feature einsums lower to badly-utilized
# batched-tiny matmuls.  This kernel runs the identical selection — global
# top-nsel by ascending dist, lowest-slot-index tie-break, exactly
# lax.top_k's order — as nsel masked-min extractions over VMEM-resident
# lanes arrays, gathering each selected slot's features as it goes.
# Per-slot STATIC tables (solver params, dof masks) are constant within a
# collision pair, so they are gathered at pair level via a slot→pair
# reduction of the selection mask (16x less work for box_box pairs).
# ---------------------------------------------------------------------------


def _select_kernel(
    ncon: int,
    Fd: int,
    nsel: int,
    pair_struct: tuple,
    nst: int,
    dist_ref,
    feat_ref,
    pairtab_ref,
    out_ref,
):
  """dist (ncon, E), feat (ncon, Fd, E), pairtab (Ptot, nst, E)
  (grid-invariant static per-pair columns); out (nsel, Fd+nst, E), row j =
  features of the j-th nearest slot."""
  dtype = feat_ref.dtype
  dist = dist_ref[...]
  feat = feat_ref[...]
  E = dist.shape[-1]
  sidx = jax.lax.broadcasted_iota(jnp.int32, (ncon, 1), 0)
  taken = jnp.zeros((ncon, E), dtype=jnp.bool_)
  rows = []
  for _ in range(nsel):
    masked = jnp.where(taken, 1e30, dist)
    dmin = jnp.min(masked, axis=0, keepdims=True)  # (1, E)
    is_min = masked <= dmin
    cand = jnp.where(is_min, sidx, ncon + 1)  # (ncon, E)
    imin = jnp.min(cand, axis=0, keepdims=True)
    first = cand == imin  # exactly one true per lane
    taken = taken | first
    fm = first.astype(dtype)
    parts = [jnp.sum(fm[:, None, :] * feat, axis=0)]  # (Fd, E)
    if nst:
      poh_parts = []
      for P, k, off in pair_struct:
        blk = fm[off : off + P * k].reshape(P, k, E)
        poh_parts.append(jnp.sum(blk, axis=1))
      poh = jnp.concatenate(poh_parts, axis=0)  # (Ptot, E)
      parts.append(
          jnp.sum(poh[:, None, :] * pairtab_ref[...], axis=0)
      )  # (nst, E)
    rows.append(jnp.concatenate(parts, axis=0))
  out_ref[...] = jnp.stack(rows, axis=0)


def contact_select_lanes(
    pair_struct: tuple,
    nsel: int,
    dist_l: jax.Array,
    feat_dyn: jax.Array,
    pair_table: np.ndarray,
):
  """Top-nsel contact selection + feature gather, fused on TPU.

  dist_l (ncon, B) lanes; feat_dyn (ncon, Fd, B) per-slot dynamic
  features; pair_table (Ptot, nst) STATIC per-pair columns (gathered at
  pair level — exact because every slot of a pair shares them);
  pair_struct = static ((P, k, off), ...) slot-layout of the pair groups.
  Returns sel (nsel, Fd + nst, B): row j = features of the j-th nearest
  slot (ascending dist, lowest-index ties — lax.top_k order)."""
  ncon, Fd, B = feat_dyn.shape
  nst = int(pair_table.shape[1]) if pair_table is not None else 0
  Ptot = int(pair_table.shape[0]) if nst else 0
  BE = _BE
  Bp = _round_up(max(B, 1), BE)
  if Bp != B:
    pad = Bp - B
    dist_l = jnp.concatenate(
        [dist_l, jnp.full((ncon, pad), _BIG, dist_l.dtype)], axis=-1
    )
    feat_dyn = jnp.concatenate(
        [feat_dyn, jnp.zeros((ncon, Fd, pad), feat_dyn.dtype)], axis=-1
    )
  if nst:
    ptab = jnp.broadcast_to(
        jnp.asarray(pair_table, feat_dyn.dtype)[:, :, None],
        (Ptot, nst, BE),
    )
  else:
    ptab = jnp.zeros((1, 1, BE), feat_dyn.dtype)
  kernel = functools.partial(
      _select_kernel, ncon, Fd, nsel, pair_struct, nst
  )
  out = pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct((nsel, Fd + nst, Bp), feat_dyn.dtype),
      grid=(Bp // BE,),
      in_specs=[
          pl.BlockSpec((ncon, BE), lambda i: (0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((ncon, Fd, BE), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec(ptab.shape[:2] + (BE,), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((nsel, Fd + nst, BE), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
      interpret=_INTERPRET,
  )(dist_l, feat_dyn, ptab)
  return out[:, :, :B]


# ---------------------------------------------------------------------------
# Pyramid-basis Newton kernel (round-5 perf).
#
# For uniform-condim pyramid contacts (the ncon_sel selection path), the
# 2·(condim−1) rows of contact c are ± combinations of a (condim)-vector
# basis:  row(±, i) = Jn_c ± μᵢ·Aᵢ_c.  Every J-shaped cost in the Newton
# loop — residual matvecs, JᵀCJ Hessian accumulation, Jᵀ force products —
# then only needs the basis columns:
#
#   H_c = U_c S_c U_cᵀ with U_c = [Jn, μ₁A₁, …],  S symmetric from the
#   per-row curvatures, accumulated as Σ_k W_k U_kᵀ with W = U S (W_k[a]
#   U_k[b] is symmetric entrywise because S is), i.e. condim outer
#   products per contact instead of 2·(condim−1).
#
# For Airbot cube-push (24 contacts × 6 rows + 37 structured rows) the
# row-reduction work drops from 184 to 133 rows (−28%), and the per-row
# penalty logic on contact rows specializes to the one-sided quadratic
# (no friction-loss/Huber branches).  Parity vs the generic kernel is
# pinned by tests/test_fused_solve.py.
# ---------------------------------------------------------------------------


def _newton_kernel_pyr(
    nv: int,
    Rs: int,
    C: int,
    naxes: int,
    iters: int,
    ls_iters: int,
    M_ref,
    a0_ref,
    x0_ref,
    Js_ref,
    arefs_ref,
    Ds_ref,
    fls_ref,
    ones_ref,
    fric_ref,
    U_ref,
    arefU_ref,
    Dc_ref,
    x_out,
    fs_out,
    fc_out,
    qf_out,
):
  """U layout: rows [Jn(C) | μ₁A₁(C) | … | μₙAₙ(C)]; fc_out rows grouped
  [axis, ±, contact] (reordered to row-major outside the kernel)."""
  dtype = M_ref.dtype
  J = Js_ref[...]  # (nv, Rs, E)
  arefs = arefs_ref[...]  # (Rs, E)
  Ds = Ds_ref[...]
  fls = fls_ref[...]
  U = U_ref[...]  # (nv, (naxes+1)·C, E)
  arefU = arefU_ref[...]  # ((naxes+1)·C, E)
  Dc = Dc_ref[...]  # (C, E)
  M = M_ref[...]
  a0 = a0_ref[...]
  x = x0_ref[...]

  ones_m = ones_ref[...][:, :1]  # (Rs, 1)
  fric_m = fric_ref[...][:, :1]
  ri = jax.lax.broadcasted_iota(jnp.int32, (nv, nv, 1), 0)
  ci = jax.lax.broadcasted_iota(jnp.int32, (nv, nv, 1), 1)
  eye = (ri == ci).astype(dtype)

  def mv(A, v):  # (nv, R, E), (nv, E) -> (R, E)
    return jnp.sum(A * v[:, None, :], axis=0)

  def mvT(A, s):  # (nv, R, E), (R, E) -> (nv, E)
    return jnp.sum(A * s[None, :, :], axis=1)

  def matvec_M(v):
    return jnp.sum(M * v[None, :, :], axis=1)

  def con_se(r):
    """One-sided quadratic (contact rows): (ŝ', ŝ'')."""
    act = (r < 0).astype(dtype)
    return Dc * r * act, Dc * act

  rs = mv(J, x) - arefs  # (Rs, E)
  rU = mv(U, x) - arefU  # ((naxes+1)·C, E) basis residuals

  for _ in range(iters):
    sg_s, sc_s = _penalty_se(rs, Ds, fls, ones_m, fric_m)
    rho_n = rU[0:C]
    sgp, sgm, scp, scm = [], [], [], []
    for i in range(naxes):
      rho_i = rU[(1 + i) * C : (2 + i) * C]
      g, c = con_se(rho_n + rho_i)
      sgp.append(g)
      scp.append(c)
      g, c = con_se(rho_n - rho_i)
      sgm.append(g)
      scm.append(c)

    # grad = M(x−a0) + Jᵀŝ' over all rows, via the basis for contacts
    w_parts = [sum(p + q for p, q in zip(sgp, sgm))]
    w_parts += [p - q for p, q in zip(sgp, sgm)]
    w = jnp.concatenate(w_parts, axis=0)  # ((naxes+1)·C, E)
    xa = x - a0
    grad = matvec_M(xa) + mvT(J, sg_s) + mvT(U, w)

    # H = M + JᵀCJ: structured rows as (J, J·c) pairs, contacts as
    # (W, U) pairs with W = U S (see module comment)
    S00 = sum(p + q for p, q in zip(scp, scm))  # (C, E)
    Un = U[:, 0:C, :]
    Wn = S00[None] * Un
    Wi_parts = []
    for i in range(naxes):
      Ui = U[:, (1 + i) * C : (2 + i) * C, :]
      S0i = scp[i] - scm[i]
      Sii = scp[i] + scm[i]
      Wn = Wn + S0i[None] * Ui
      Wi_parts.append(S0i[None] * Un + Sii[None] * Ui)
    Wmat = jnp.concatenate([Wn] + Wi_parts, axis=1)  # (nv, (naxes+1)·C, E)

    # lower-tri accumulation over BOTH row families without concatenating
    # them (a (nv, Rt, E) concat per iteration is a pure VMEM copy)
    P_s = J * sc_s[None]
    tri_rows = []
    for a in range(nv):
      vals = (
          jnp.sum(J[a][None, :, :] * P_s[a:], axis=1)
          + jnp.sum(Wmat[a][None, :, :] * U[a:], axis=1)
      )  # (nv-a, E)
      if a:
        vals = jnp.concatenate(
            [jnp.zeros((a,) + vals.shape[1:], dtype), vals], axis=0
        )
      tri_rows.append(vals)
    T = jnp.stack(tri_rows, axis=0)
    H = T + jnp.swapaxes(T, 0, 1) - eye * T
    H = H + M
    dmax = jnp.max(jnp.max(H * eye, axis=0), axis=0, keepdims=True)
    H = H + eye * (1e-6 * dmax + 1e-12)[None]
    cols, djs = _chol_cols(H, nv, 1e-12)
    dx = -_cho_solve_cols(cols, djs, grad, nv)

    # line search on φ(t)
    mdx = matvec_M(dx)
    jdx_s = mv(J, dx)  # (Rs, E)
    u = mv(U, dx)  # ((naxes+1)·C, E)
    un = u[0:C]
    g0 = jnp.sum(xa * mdx, axis=0, keepdims=True)
    h0 = jnp.sum(dx * mdx, axis=0, keepdims=True)
    t = jnp.ones_like(g0)
    for _ in range(ls_iters):
      rt_s = rs + t * jdx_s
      sg, sc = _penalty_se(rt_s, Ds, fls, ones_m, fric_m)
      dphi = g0 + t * h0 + jnp.sum(sg * jdx_s, axis=0, keepdims=True)
      ddphi = h0 + jnp.sum(sc * jdx_s * jdx_s, axis=0, keepdims=True)
      rtn = rho_n + t * un
      for i in range(naxes):
        ui = u[(1 + i) * C : (2 + i) * C]
        rti = rU[(1 + i) * C : (2 + i) * C] + t * ui
        jp = un + ui
        jm = un - ui
        gp, cp = con_se(rtn + rti)
        gm, cm = con_se(rtn - rti)
        dphi = dphi + jnp.sum(gp * jp + gm * jm, axis=0, keepdims=True)
        ddphi = ddphi + jnp.sum(
            cp * jp * jp + cm * jm * jm, axis=0, keepdims=True
        )
      t = jnp.clip(t - dphi / jnp.maximum(ddphi, 1e-12), 0.0, 4.0)

    # monotone accept on Δφ(t)
    s_old = jnp.sum(
        _penalty_cost_rows(rs, Ds, fls, ones_m, fric_m), axis=0,
        keepdims=True,
    )
    s_new = jnp.sum(
        _penalty_cost_rows(rs + t * jdx_s, Ds, fls, ones_m, fric_m),
        axis=0, keepdims=True,
    )
    rtn = rho_n + t * un
    for i in range(naxes):
      ui = u[(1 + i) * C : (2 + i) * C]
      rti = rU[(1 + i) * C : (2 + i) * C] + t * ui
      rho_i = rU[(1 + i) * C : (2 + i) * C]
      for r_old, r_new in (
          (rho_n + rho_i, rtn + rti),
          (rho_n - rho_i, rtn - rti),
      ):
        s_old = s_old + jnp.sum(
            0.5 * Dc * r_old * r_old * (r_old < 0).astype(dtype),
            axis=0, keepdims=True,
        )
        s_new = s_new + jnp.sum(
            0.5 * Dc * r_new * r_new * (r_new < 0).astype(dtype),
            axis=0, keepdims=True,
        )
    delta = t * g0 + 0.5 * t * t * h0 + s_new - s_old
    accept = delta < 0
    x = jnp.where(accept, x + t * dx, x)
    rs = jnp.where(accept, rs + t * jdx_s, rs)
    rU = jnp.where(accept, rU + t * u, rU)

  # final forces
  sg_s, _ = _penalty_se(rs, Ds, fls, ones_m, fric_m)
  rho_n = rU[0:C]
  fc_parts = []
  wf_n = jnp.zeros_like(rho_n)
  wf_parts = []
  for i in range(naxes):
    rho_i = rU[(1 + i) * C : (2 + i) * C]
    gp, _ = con_se(rho_n + rho_i)
    gm, _ = con_se(rho_n - rho_i)
    fc_parts.append(-gp)
    fc_parts.append(-gm)
    wf_n = wf_n + (-gp) + (-gm)
    wf_parts.append((-gp) - (-gm))
  fs = -sg_s
  wf = jnp.concatenate([wf_n] + wf_parts, axis=0)
  x_out[...] = x
  fs_out[...] = fs
  fc_out[...] = (
      jnp.concatenate(fc_parts, axis=0)
      if naxes
      else jnp.zeros((0, rho_n.shape[-1]), dtype)
  )
  qf_out[...] = mvT(J, fs) + mvT(U, wf)


def newton_lanes_pyr_t(
    iterations: int,
    ls_iterations: int,
    kind_s: np.ndarray,
    Mt: jax.Array,
    a0t: jax.Array,
    x0t: jax.Array,
    Js: jax.Array,
    arefs: jax.Array,
    Ds: jax.Array,
    fls: jax.Array,
    U: jax.Array,
    arefU: jax.Array,
    Dc: jax.Array,
    naxes: int,
):
  """Pyramid-basis fused Newton solve on LANES-layout inputs.

  Mt (nv, nv, B), a0t/x0t (nv, B); structured rows Js (nv, Rs0,
  B) + arefs/Ds/fls (Rs0, B) with static kinds ``kind_s``; contact basis
  U (nv, (naxes+1)·C, B) grouped [Jn | μ₁A₁ | …], arefU likewise, Dc
  (C, B).  Returns lanes outputs (xt (nv, B), force (Rs0 + 2·naxes·C, B)
  in the original row order [structured | contact-major, axis, ±],
  qft (nv, B)).
  """
  from rsr_mjx_tpu.physics import constraint as _constraint

  nv = Mt.shape[0]
  Rs0, B = arefs.shape
  W1C = U.shape[1]
  C = W1C // (naxes + 1)
  Rs = _round_up(max(Rs0, 8), 8)
  Cp = _round_up(max(C, 8), 8)
  BE = _BE
  Bp = _round_up(max(B, 1), BE)

  onesided = (kind_s == _constraint.LIMIT) | (kind_s == _constraint.CONTACT)
  fric = kind_s == _constraint.FRICTION
  if Rs != Rs0:  # pad with inert friction rows
    pad = Rs - Rs0
    onesided = np.concatenate([onesided, np.zeros(pad, bool)])
    fric = np.concatenate([fric, np.ones(pad, bool)])
    zrow = lambda a: jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
    )
    arefs, Ds, fls = zrow(arefs), zrow(Ds), zrow(fls)
    Js = jnp.concatenate([Js, jnp.zeros((nv, pad, B), Js.dtype)], axis=1)
  if Cp != C:  # pad contacts with inert (Dc=0) slots
    pad = Cp - C
    Dc = jnp.concatenate([Dc, jnp.zeros((pad, B), Dc.dtype)], axis=0)
    Ug = [U[:, k * C : (k + 1) * C, :] for k in range(naxes + 1)]
    au = [arefU[k * C : (k + 1) * C] for k in range(naxes + 1)]
    zU = jnp.zeros((nv, pad, B), U.dtype)
    za = jnp.zeros((pad, B), arefU.dtype)
    U = jnp.concatenate(
        sum(([u, zU] for u in Ug), []), axis=1
    )
    arefU = jnp.concatenate(sum(([a, za] for a in au), []), axis=0)

  if Bp != B:
    pad = Bp - B
    eyeT = jnp.broadcast_to(
        jnp.eye(nv, dtype=Mt.dtype)[:, :, None], (nv, nv, pad)
    )
    Mt = jnp.concatenate([Mt, eyeT], axis=-1)
    zl = lambda a: jnp.concatenate(
        [a, jnp.zeros(a.shape[:-1] + (pad,), a.dtype)], axis=-1
    )
    a0t, x0t = zl(a0t), zl(x0t)
    Js, arefs, Ds, fls = zl(Js), zl(arefs), zl(Ds), zl(fls)
    U, arefU, Dc = zl(U), zl(arefU), zl(Dc)

  kernel = functools.partial(
      _newton_kernel_pyr, nv, Rs, Cp, naxes, iterations, ls_iterations
  )
  ones_in = jnp.broadcast_to(
      jnp.asarray(onesided.astype(np.float32))[:, None], (Rs, BE)
  )
  fric_in = jnp.broadcast_to(
      jnp.asarray(fric.astype(np.float32))[:, None], (Rs, BE)
  )
  vec_spec = pl.BlockSpec((nv, BE), lambda i: (0, i), memory_space=pltpu.VMEM)
  rs_spec = pl.BlockSpec((Rs, BE), lambda i: (0, i), memory_space=pltpu.VMEM)
  nc_rows = 2 * naxes * Cp
  xt, fst, fct, qft = pl.pallas_call(
      kernel,
      out_shape=(
          jax.ShapeDtypeStruct((nv, Bp), Mt.dtype),
          jax.ShapeDtypeStruct((Rs, Bp), Mt.dtype),
          jax.ShapeDtypeStruct((nc_rows, Bp), Mt.dtype),
          jax.ShapeDtypeStruct((nv, Bp), Mt.dtype),
      ),
      grid=(Bp // BE,),
      in_specs=[
          pl.BlockSpec((nv, nv, BE), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM),
          vec_spec,
          vec_spec,
          pl.BlockSpec((nv, Rs, BE), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM),
          rs_spec,
          rs_spec,
          rs_spec,
          pl.BlockSpec((Rs, BE), lambda i: (0, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((Rs, BE), lambda i: (0, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((nv, (naxes + 1) * Cp, BE), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec(((naxes + 1) * Cp, BE), lambda i: (0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((Cp, BE), lambda i: (0, i), memory_space=pltpu.VMEM),
      ],
      out_specs=(
          vec_spec,
          rs_spec,
          pl.BlockSpec((nc_rows, BE), lambda i: (0, i),
                       memory_space=pltpu.VMEM),
          vec_spec,
      ),
      interpret=_INTERPRET,
  )(Mt, a0t, x0t, Js, arefs, Ds, fls, ones_in, fric_in, U, arefU, Dc)

  # fc rows are grouped [axis, ±, contact]; reorder to the assembly's
  # row-major order [contact, axis, ±] and drop contact padding
  fct = fct.reshape(naxes, 2, Cp, Bp)[:, :, :C, :]
  fct = jnp.transpose(fct, (2, 0, 1, 3)).reshape(C * 2 * naxes, Bp)
  force = jnp.concatenate([fst[:Rs0], fct], axis=0)  # (R0, Bp)
  return xt[:, :B], force[:, :B], qft[:, :B]


def newton_solve_lanes_pyr(
    iterations: int,
    ls_iterations: int,
    kind_s: np.ndarray,
    M: jax.Array,
    a0: jax.Array,
    x0: jax.Array,
    Js: jax.Array,
    arefs: jax.Array,
    Ds: jax.Array,
    fls: jax.Array,
    U: jax.Array,
    arefU: jax.Array,
    Dc: jax.Array,
    naxes: int,
):
  """Pyramid-basis fused Newton solve with batch-major M/a0/x0 —
  transpose wrapper around :func:`newton_lanes_pyr_t`.  Returns
  (x (B, nv), force (B, R0), qfrc (B, nv)) batch-major."""
  xt, force, qft = newton_lanes_pyr_t(
      iterations, ls_iterations, kind_s,
      jnp.transpose(M, (1, 2, 0)),
      jnp.transpose(a0, (1, 0)),
      jnp.transpose(x0, (1, 0)),
      Js, arefs, Ds, fls, U, arefU, Dc, naxes,
  )
  return (
      jnp.transpose(xt, (1, 0)),
      jnp.transpose(force, (1, 0)),
      jnp.transpose(qft, (1, 0)),
  )


def newton_kernel_fits(nv: int, nefc: int) -> bool:
  """Whether the fused kernel's VMEM working set fits at the 128-lane block.

  The kernel keeps J (nv,R,E), the rank-update buffer P (same shape), M/H
  (nv,nv,E) and the row/vector temporaries resident; double-buffered input
  streaming roughly doubles J/M.  Very large constraint systems (e.g.
  ncon_sel disabled on a manipulation scene: R ≈ 3000) overflow the ~16 MB
  VMEM and must take the XLA fallback path instead (Pallas lane blocks
  must be 128-divisible, so shrinking E is not an option)."""
  R = _round_up(max(nefc, 8), 8)
  per_lane_bytes = (3 * nv * R + 4 * nv * nv + 12 * R + 12 * nv) * 4
  return per_lane_bytes * _BE <= 10 * 1024 * 1024


def _newton_lanes_core(
    kind: np.ndarray,
    iterations: int,
    ls_iterations: int,
    Mt: jax.Array,
    a0t: jax.Array,
    x0t: jax.Array,
    Jt: jax.Array,
    areft: jax.Array,
    Dt: jax.Array,
    flt: jax.Array,
):
  """Pallas Newton solve on LANES-layout inputs.

  Mt (nv, nv, B), a0t/x0t (nv, B), Jt (nv, R0, B), areft/Dt/flt (R0, B).
  Pads rows to a multiple of 8 (inert friction rows) and lanes to a
  multiple of 128 (identity systems).  Returns lanes outputs
  (xt (nv, B), ft (R0, B), qft (nv, B))."""
  from rsr_mjx_tpu.physics import constraint as _constraint

  nv, R0, B = Jt.shape
  R = _round_up(max(R0, 8), 8)
  if not newton_kernel_fits(nv, R0):
    raise ValueError(
        f'Newton kernel working set too large (nv={nv}, nefc={R0}); '
        'use the XLA fallback or enable contact selection (max_contacts).'
    )
  BE = _BE
  Bp = _round_up(max(B, 1), BE)

  onesided = (kind == _constraint.LIMIT) | (kind == _constraint.CONTACT)
  fric = kind == _constraint.FRICTION
  if R != R0:  # padded rows: friction kind with floss=0 ⇒ inert
    pad = R - R0
    onesided = np.concatenate([onesided, np.zeros(pad, bool)])
    fric = np.concatenate([fric, np.ones(pad, bool)])
    zrow = lambda a: jnp.concatenate(
        [a, jnp.zeros((R - R0,) + a.shape[1:], a.dtype)], axis=0
    )
    areft, Dt, flt = zrow(areft), zrow(Dt), zrow(flt)
    Jt = jnp.concatenate(
        [Jt, jnp.zeros((nv, R - R0, B), Jt.dtype)], axis=1
    )
  if Bp != B:
    pad = Bp - B
    eye = jnp.broadcast_to(
        jnp.eye(nv, dtype=Mt.dtype)[:, :, None], (nv, nv, pad)
    )
    Mt = jnp.concatenate([Mt, eye], axis=-1)
    zlane = lambda a: jnp.concatenate(
        [a, jnp.zeros(a.shape[:-1] + (pad,), a.dtype)], axis=-1
    )
    Jt, a0t, x0t, areft, Dt, flt = (
        zlane(Jt), zlane(a0t), zlane(x0t), zlane(areft), zlane(Dt), zlane(flt)
    )

  kernel = functools.partial(
      _newton_kernel, nv, R, iterations, ls_iterations
  )
  ones_in = jnp.broadcast_to(
      jnp.asarray(onesided.astype(np.float32))[:, None], (R, BE)
  )
  fric_in = jnp.broadcast_to(
      jnp.asarray(fric.astype(np.float32))[:, None], (R, BE)
  )
  vec_spec = pl.BlockSpec((nv, BE), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
  row_spec = pl.BlockSpec((R, BE), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
  mask_spec = pl.BlockSpec((R, BE), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
  xt, ft, qft = pl.pallas_call(
      kernel,
      out_shape=(
          jax.ShapeDtypeStruct((nv, Bp), Mt.dtype),
          jax.ShapeDtypeStruct((R, Bp), Mt.dtype),
          jax.ShapeDtypeStruct((nv, Bp), Mt.dtype),
      ),
      grid=(Bp // BE,),
      in_specs=[
          pl.BlockSpec((nv, nv, BE), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM),
          vec_spec,
          vec_spec,
          pl.BlockSpec((nv, R, BE), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM),
          row_spec,
          row_spec,
          row_spec,
          mask_spec,
          mask_spec,
      ],
      out_specs=(vec_spec, row_spec, vec_spec),
      interpret=_INTERPRET,
  )(Mt, a0t, x0t, Jt, areft, Dt, flt, ones_in, fric_in)

  return xt[:, :B], ft[:R0, :B], qft[:, :B]


def newton_solve_lanes(
    kind: np.ndarray,
    iterations: int,
    ls_iterations: int,
    M: jax.Array,
    a0: jax.Array,
    x0: jax.Array,
    J_l: jax.Array,
    aref_l: jax.Array,
    D_l: jax.Array,
    floss_l: jax.Array,
):
  """Fused Newton solve with a lanes-layout constraint system.

  M (B, nv, nv), a0/x0 (B, nv) batch-major; J_l (nv, R0, B),
  aref_l/D_l/floss_l (R0, B) straight from lanes_assembly — no J
  transpose round trip.  Returns (x, force, qfrc) batch-major.
  """
  Mt = jnp.transpose(M, (1, 2, 0))
  a0t = jnp.transpose(a0, (1, 0))
  x0t = jnp.transpose(x0, (1, 0))
  xt, ft, qft = _newton_lanes_core(
      kind, iterations, ls_iterations, Mt, a0t, x0t, J_l, aref_l, D_l,
      floss_l,
  )
  return (
      jnp.transpose(xt, (1, 0)),
      jnp.transpose(ft, (1, 0)),
      jnp.transpose(qft, (1, 0)),
  )


def newton_solve_batched(
    kind: np.ndarray,
    iterations: int,
    ls_iterations: int,
    M: jax.Array,
    a0: jax.Array,
    x0: jax.Array,
    J: jax.Array,
    aref: jax.Array,
    D: jax.Array,
    floss: jax.Array,
):
  """Batched fused Newton solve on TPU.

  Args are batch-major: M (B, nv, nv), a0/x0 (B, nv), J (B, R0, nv),
  aref/D/floss (B, R0); ``kind`` is the static (R0,) row-kind vector.
  Returns (x, force, qfrc_constraint) batch-major.
  """
  Jt = jnp.transpose(J, (2, 1, 0))  # (nv, R0, B)
  areft = jnp.transpose(aref, (1, 0))
  Dt = jnp.transpose(D, (1, 0))
  flt = jnp.transpose(floss, (1, 0))
  return newton_solve_lanes(
      kind, iterations, ls_iterations, M, a0, x0, Jt, areft, Dt, flt
  )
