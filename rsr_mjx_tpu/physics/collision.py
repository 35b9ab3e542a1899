"""Static-shape narrow-phase collision, batch-in-lanes.

The pair table is precomputed on the host (io._collision_pairs); at runtime
every potential pair always produces its fixed quota of contact slots, with
``dist > 0`` marking separated candidates (those get ~zero impedance in the
constraint stage, so they are numerically inert).  No broad-phase, no
gather/scatter, no dynamic shapes — the XLA-native replacement for the
reference's nconmax-buffered dynamic contacts (cube.xml:36).

Layout: the narrow-phase math is written structure-of-arrays with the
**batch in the trailing (lane) dimension** — every 3-vector is a python
list of three ``(P, B)`` arrays (P pairs, B envs), so each primitive is one
full-width VPU op.  The naive per-env formulation vmapped batch-major puts
the 3-long coordinate axis in the 128-lane minor dimension and wastes
125/128 lanes; measured on v5e it cost 27.3 ms per substep at B=1024 vs
0.5 ms for this layout (scripts/profile_scan.py, PROFILE.md).  A
``jax.custom_batching.custom_vmap`` rule re-routes the env-level ``vmap``
into the lanes layout; the unbatched path is the same code at B=1, so both
paths share one set of formulas.

There is no per-pair ``top_k`` manifold selection: every candidate point is
a contact slot (box_box: 8+8 vertex probes, plane_box: all 8 corners).
Downstream, Model.ncon_sel selects the k nearest slots for the solver.

Contact convention (MuJoCo-compatible): ``frame[0]`` is the contact normal
pointing from geom1 towards geom2; ``dist < 0`` means penetration; ``pos``
is the midpoint between the two surfaces.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.custom_batching import custom_vmap

from rsr_mjx_tpu.physics.types import Contact, Data, Model, StaticArr

_MJ_MINVAL = 1e-15


# ---------------------------------------------------------------------------
# SoA vector helpers. A "v3" is a list of three arrays of identical shape
# (..., B); a "m3" is a 3x3 nested list. All ops broadcast, so model-derived
# quantities can stay (P, 1) against (P, B) state.
# ---------------------------------------------------------------------------


def _dot(a, b):
  return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _sub(a, b):
  return [a[i] - b[i] for i in range(3)]


def _add(a, b):
  return [a[i] + b[i] for i in range(3)]


def _scale(a, s):
  return [a[i] * s for i in range(3)]


def _cross(a, b):
  return [
      a[1] * b[2] - a[2] * b[1],
      a[2] * b[0] - a[0] * b[2],
      a[0] * b[1] - a[1] * b[0],
  ]


def _matvec(M, v):
  return [M[i][0] * v[0] + M[i][1] * v[1] + M[i][2] * v[2] for i in range(3)]


def _matTvec(M, v):
  return [M[0][j] * v[0] + M[1][j] * v[1] + M[2][j] * v[2] for j in range(3)]


def _safe_norm_v(v):
  """‖v‖ with a NaN-free gradient at v = 0 (double-where trick).

  Zero vectors occur on the differentiation path for every box-interior
  contact point (_point_box), which would poison env_params_tuning
  gradients through the contact solve (reference relies on the same
  property via MJX's safe math, SURVEY §3.2)."""
  sq = _dot(v, v)
  is_zero = sq < _MJ_MINVAL
  return jnp.where(is_zero, 0.0, jnp.sqrt(jnp.where(is_zero, 1.0, sq)))


def _safe_normalize_v(v):
  """(v/‖v‖, ‖v‖) with zero output and NaN-free gradient at v = 0."""
  n = _safe_norm_v(v)
  inv = 1.0 / jnp.where(n < _MJ_MINVAL, 1.0, n)
  return _scale(v, inv), n


def _make_frame(n):
  """Orthonormal frame (n, t1, t2) from a unit normal; rows as v3 lists."""
  pick = jnp.abs(n[0]) < 0.5
  a = [
      jnp.where(pick, 1.0, 0.0),
      jnp.where(pick, 0.0, 1.0),
      jnp.zeros_like(n[0]),
  ]
  t1, _ = _safe_normalize_v(_cross(n, a))
  t2 = _cross(n, t1)
  return n, t1, t2


# ---------------------------------------------------------------------------
# Per-pair geometry in lanes layout.  Each group function takes
# (p1, m1, s1, p2, m2, s2) — v3/m3 with trailing (P, B) — and returns a
# list of contact slots [(dist (P,B), pos v3, n v3), ...], pair-major slot
# order matching io.GROUP_NCON.
# ---------------------------------------------------------------------------

_SIGNS = [
    (sx, sy, sz)
    for sx in (-1.0, 1.0)
    for sy in (-1.0, 1.0)
    for sz in (-1.0, 1.0)
]


def _point_box(v, pb, mb, sb):
  """Signed distance + direction from point v to box; returns
  (dist, n_point_to_box_surface_outward) where dist<0 inside.

  For v outside: dist = |v − closest|, n = (closest − v)/dist (towards box).
  For v inside: dist = −min face margin, n = −outward face normal
  (so that in both cases pos = v + n·dist/2 is the contact midpoint and n
  points from the point's body towards the box for the penetrating case
  consistent with 'normal: geom1 → geom2' when v ∈ geom1, box = geom2).
  """
  local = _matTvec(mb, _sub(v, pb))
  clamped = [jnp.clip(local[j], -sb[j], sb[j]) for j in range(3)]
  odir, out_d = _safe_normalize_v(_sub(local, clamped))
  inside = out_d < _MJ_MINVAL

  # inside: face with minimum margin (first-axis tie-break = argmin)
  margins = [sb[j] - jnp.abs(local[j]) for j in range(3)]
  k0 = (margins[0] <= margins[1]) & (margins[0] <= margins[2])
  k1 = (~k0) & (margins[1] <= margins[2])
  k2 = (~k0) & (~k1)
  mmin = jnp.minimum(margins[0], jnp.minimum(margins[1], margins[2]))
  ow_local = [
      jnp.where(k, jnp.sign(local[j]) + (local[j] == 0), 0.0)
      for j, k in enumerate((k0, k1, k2))
  ]
  outward = _matvec(mb, ow_local)
  n_out = _scale(_matvec(mb, odir), -1.0)

  dist = jnp.where(inside, -mmin, out_d)
  n = [jnp.where(inside, -outward[i], n_out[i]) for i in range(3)]
  return dist, n


def _plane_sphere(p1, m1, s1, p2, m2, s2):
  n = [m1[i][2] for i in range(3)]
  r = s2[0]
  dist = _dot(n, _sub(p2, p1)) - r
  pos = _sub(p2, _scale(n, r + 0.5 * dist))
  return [(dist, pos, n)]


def _plane_capsule(p1, m1, s1, p2, m2, s2):
  n = [m1[i][2] for i in range(3)]
  axis = [m2[i][2] for i in range(3)]
  r, half = s2[0], s2[1]
  out = []
  for sgn in (1.0, -1.0):
    e = _add(p2, _scale(axis, sgn * half))
    dist = _dot(e, n) - _dot(n, p1) - r
    pos = _sub(e, _scale(n, r + 0.5 * dist))
    out.append((dist, pos, n))
  return out


def _box_corner(p, mat, size, sg):
  local = [sg[j] * size[j] for j in range(3)]
  return _add(p, _matvec(mat, local))


def _plane_box(p1, m1, s1, p2, m2, s2):
  """All 8 corners are slots (separated ones are inert downstream)."""
  n = [m1[i][2] for i in range(3)]
  d0 = _dot(n, p1)
  out = []
  for sg in _SIGNS:
    c = _box_corner(p2, m2, s2, sg)
    dist = _dot(c, n) - d0
    pos = _sub(c, _scale(n, 0.5 * dist))
    out.append((dist, pos, n))
  return out


def _sphere_sphere_at(p1, r1, p2, r2):
  n, l = _safe_normalize_v(_sub(p2, p1))
  dist = l - r1 - r2
  pos = _add(p1, _scale(n, r1 + 0.5 * dist))
  return dist, pos, n


def _sphere_sphere(p1, m1, s1, p2, m2, s2):
  return [_sphere_sphere_at(p1, s1[0], p2, s2[0])]


def _closest_on_segment(p, a, axis, half):
  t = jnp.clip(_dot(_sub(p, a), axis), -half, half)
  return _add(a, _scale(axis, t))


def _sphere_capsule(p1, m1, s1, p2, m2, s2):
  axis = [m2[i][2] for i in range(3)]
  c = _closest_on_segment(p1, p2, axis, s2[1])
  return [_sphere_sphere_at(p1, s1[0], c, s2[0])]


def _sphere_box(p1, m1, s1, p2, m2, s2):
  dist_c, n = _point_box(p1, p2, m2, s2)
  r = s1[0]
  dist = dist_c - r
  pos = _add(p1, _scale(n, r + 0.5 * dist))
  return [(dist, pos, n)]


def _capsule_box(p1, m1, s1, p2, m2, s2):
  axis = [m1[i][2] for i in range(3)]
  r, half = s1[0], s1[1]
  out = []
  for sgn in (1.0, -1.0):
    e = _add(p1, _scale(axis, sgn * half))
    dc, n = _point_box(e, p2, m2, s2)
    dist = dc - r
    pos = _add(e, _scale(n, r + 0.5 * dist))
    out.append((dist, pos, n))
  return out


def _segment_segment(a1, u1, h1, a2, u2, h2):
  """Closest points between two segments (centers a, unit dirs u, half-len h)."""
  d = _sub(a1, a2)
  b = _dot(u1, u2)
  e = _dot(u1, d)
  f = _dot(u2, d)
  denom = 1.0 - b * b
  ok = jnp.abs(denom) > 1e-9
  s = jnp.where(ok, (b * f - e) / jnp.where(ok, denom, 1.0), 0.0)
  s = jnp.clip(s, -h1, h1)
  t = jnp.clip(b * s + f, -h2, h2)
  s = jnp.clip(b * t - e, -h1, h1)
  return _add(a1, _scale(u1, s)), _add(a2, _scale(u2, t))


def _capsule_capsule(p1, m1, s1, p2, m2, s2):
  u1 = [m1[i][2] for i in range(3)]
  u2 = [m2[i][2] for i in range(3)]
  c1, c2 = _segment_segment(p1, u1, s1[1], p2, u2, s2[1])
  return [_sphere_sphere_at(c1, s1[0], c2, s2[0])]


def _box_box(p1, m1, s1, p2, m2, s2):
  """Vertex-in-box probes both directions: 8 + 8 slots per pair.

  Handles face-face resting (4 corners active) and face-vertex pushing —
  the regimes exercised by cube-on-table and finger-on-cube contacts.
  Edge-edge crossings are approximated by their nearest vertex contacts.
  Every probe is a slot (no top_k manifold sort); downstream active-set
  selection (Model.ncon_sel) keeps the solver small.
  """
  out = []
  for pa, ma, sa, pb, mb, sb, flip in (
      (p1, m1, s1, p2, m2, s2, 1.0),
      (p2, m2, s2, p1, m1, s1, -1.0),
  ):
    for sg in _SIGNS:
      v = _box_corner(pa, ma, sa, sg)
      dist, n = _point_box(v, pb, mb, sb)
      pos = _add(v, _scale(n, 0.5 * dist))
      out.append((dist, pos, _scale(n, flip)))
  return out


_GROUP_FN = {
    'plane_sphere': _plane_sphere,
    'plane_capsule': _plane_capsule,
    'plane_box': _plane_box,
    'sphere_sphere': _sphere_sphere,
    'sphere_capsule': _sphere_capsule,
    'sphere_box': _sphere_box,
    'capsule_capsule': _capsule_capsule,
    'capsule_box': _capsule_box,
    'box_box': _box_box,
}


# ---------------------------------------------------------------------------
# Parameter mixing (mj_contactParam) in lanes layout: per PAIR (friction /
# solref / solimp of the two geoms combined), broadcast to slots at
# assembly. geom_priority is static, so the priority selects are trace-time
# numpy masks.
# ---------------------------------------------------------------------------


def _combine_params_lanes(cfg, fric, solref, solimp, solmix, g1, g2):
  """All model leaves have trailing batch (ngeom, c, Bp); returns
  (friction (P,5,Bp), solref (P,2,Bp), solimp (P,5,Bp))."""
  p1 = cfg.geom_priority.arr[g1]
  p2 = cfg.geom_priority.arr[g2]
  pri1 = (p1 > p2)[:, None, None]  # static numpy (P,1,1)
  pri2 = (p2 > p1)[:, None, None]
  nopri = ~(pri1 | pri2)

  f1, f2 = fric[g1], fric[g2]  # (P, 3, Bp)
  sr1, sr2 = solref[g1], solref[g2]
  si1, si2 = solimp[g1], solimp[g2]
  mix1, mix2 = solmix[g1][:, None, :], solmix[g2][:, None, :]  # (P,1,Bp)

  denom = mix1 + mix2
  w1 = jnp.where(denom > _MJ_MINVAL, mix1 / jnp.maximum(denom, _MJ_MINVAL),
                 0.5)
  w1 = jnp.where((mix1 < _MJ_MINVAL) & (mix2 >= _MJ_MINVAL), 0.0, w1)
  w1 = jnp.where((mix2 < _MJ_MINVAL) & (mix1 >= _MJ_MINVAL), 1.0, w1)

  friction3 = (
      jnp.where(pri1, f1, 0)
      + jnp.where(pri2, f2, 0)
      + jnp.where(nopri, jnp.maximum(f1, f2), 0)
  )
  # standard (positive) solref mixes; direct (non-positive) takes the min
  solref_mix = w1 * sr1 + (1 - w1) * sr2
  direct = (sr1[:, 0:1, :] <= 0) | (sr2[:, 0:1, :] <= 0)
  solref_nopri = jnp.where(direct, jnp.minimum(sr1, sr2), solref_mix)
  solref_c = (
      jnp.where(pri1, sr1, 0)
      + jnp.where(pri2, sr2, 0)
      + jnp.where(nopri, solref_nopri, 0)
  )
  solimp_c = (
      jnp.where(pri1, si1, 0)
      + jnp.where(pri2, si2, 0)
      + jnp.where(nopri, w1 * si1 + (1 - w1) * si2, 0)
  )
  # contact friction 5-vector: (slide, slide, torsion, roll, roll)
  friction = jnp.stack(
      [
          friction3[:, 0],
          friction3[:, 0],
          friction3[:, 1],
          friction3[:, 2],
          friction3[:, 2],
      ],
      axis=1,
  )
  return friction, solref_c, solimp_c


# ---------------------------------------------------------------------------
# Heightfield vs sphere (bilinear sample); per-pair loop (few pairs).
# ---------------------------------------------------------------------------


def _hfield_sphere_lanes(cfg, hfield_data, gxpos, gxmat, geom_size, pairs):
  """Returns slot list like the group fns; shapes (1, Bp) per pair slot.

  hfield_data must be unbatched (no randomizer touches terrain heights)."""
  out = []
  for k in range(len(pairs)):
    hgeom, sgeom = int(pairs[k, 0]), int(pairs[k, 1])
    hid = int(cfg.geom_dataid.arr[hgeom])
    nrow = int(cfg.hfield_nrow.arr[hid])
    ncol = int(cfg.hfield_ncol.arr[hid])
    adr = int(cfg.hfield_adr.arr[hid])
    hsize = cfg.hfield_size.arr[hid]  # (4,) numpy

    hpos = [gxpos[hgeom, i] for i in range(3)]  # (Bp,)
    hmat = [[gxmat[hgeom, i, j] for j in range(3)] for i in range(3)]
    center = [gxpos[sgeom, i] for i in range(3)]
    r = geom_size[sgeom, 0]  # (Bp,)

    local = _matTvec(hmat, _sub(center, hpos))
    fx = (local[0] / float(hsize[0]) * 0.5 + 0.5) * (ncol - 1)
    fy = (local[1] / float(hsize[1]) * 0.5 + 0.5) * (nrow - 1)
    fx = jnp.clip(fx, 0.0, ncol - 1.001)
    fy = jnp.clip(fy, 0.0, nrow - 1.001)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    wx = fx - x0
    wy = fy - y0
    base = adr + y0 * ncol + x0
    h00 = hfield_data[base]
    h01 = hfield_data[base + 1]
    h10 = hfield_data[base + ncol]
    h11 = hfield_data[base + ncol + 1]
    zs = float(hsize[2])
    h = (
        h00 * (1 - wx) * (1 - wy)
        + h01 * wx * (1 - wy)
        + h10 * (1 - wx) * wy
        + h11 * wx * wy
    ) * zs
    # estimate surface normal from finite differences (cell-scale)
    dx = 2 * float(hsize[0]) / (ncol - 1)
    dy = 2 * float(hsize[1]) / (nrow - 1)
    gx = (h01 - h00) * zs / dx
    gy = (h10 - h00) * zs / dy
    n_local = [-gx, -gy, jnp.ones_like(gx)]
    inv = 1.0 / jnp.sqrt(_dot(n_local, n_local))
    n_local = _scale(n_local, inv)
    n = _matvec(hmat, n_local)
    dist = (local[2] - h) - r
    pos = _sub(center, _scale(n, r + 0.5 * dist))
    out.append((dist[None], [p[None] for p in pos], [c[None] for c in n]))
  return out


# ---------------------------------------------------------------------------
# Whole-scene narrow-phase in lanes layout.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _ColliderCfg:
  """Hashable static collision config extracted from Model."""

  pairs: tuple
  geom_priority: StaticArr
  geom_dataid: StaticArr
  hfield_nrow: StaticArr
  hfield_ncol: StaticArr
  hfield_size: StaticArr
  hfield_adr: StaticArr
  ncon: int


def _cfg_of(m: Model) -> _ColliderCfg:
  return _ColliderCfg(
      pairs=m.pairs,
      geom_priority=m.geom_priority,
      geom_dataid=m.geom_dataid,
      hfield_nrow=m.hfield_nrow,
      hfield_ncol=m.hfield_ncol,
      hfield_size=m.hfield_size,
      hfield_adr=m.hfield_adr,
      ncon=m.ncon,
  )


def _collide_lanes(cfg, geom_size, geom_friction, geom_solref, geom_solimp,
                   geom_solmix, hfield_data, gxpos, gxmat,
                   include_solparams=True):
  """All inputs trailing-batch: size (ngeom,3,Bp), fric (ngeom,3,Bp),
  solref (ngeom,2,Bp), solimp (ngeom,5,Bp), solmix (ngeom,Bp),
  hfield_data (nhf,), gxpos (ngeom,3,B), gxmat (ngeom,3,3,B).

  Returns lanes-major (dist (ncon,B), pos (ncon,3,B), frame (ncon,3,3,B)
  [, friction (ncon,5,B), solref (ncon,2,B), solimp (ncon,5,B)]).

  ``include_solparams=False`` skips the per-slot solver parameters — they
  are static per (model, slot) (positions never enter mj_contactParam),
  so the hot path computes them once per env via ``combine_solparams``
  instead of transposing (ncon, 12, B) lanes arrays to batch-major every
  substep (round-4 profile: the transposes were ~0.97 ms of the 2.46 ms
  substep at B=1024)."""
  from rsr_mjx_tpu.physics.io import GROUP_NCON

  dist_parts, pos_parts, frame_parts = [], [], []
  fr_parts, sr_parts, si_parts = [], [], []

  for name, tbl in cfg.pairs:
    pairs = tbl.arr
    if len(pairs) == 0:
      continue
    k = GROUP_NCON[name]
    g1, g2 = pairs[:, 0], pairs[:, 1]

    if name == 'hfield_sphere':
      slots_per_pair = _hfield_sphere_lanes(
          cfg, hfield_data, gxpos, gxmat, geom_size, pairs
      )
      # per-pair slot lists of (1,Bp) → concat to pair-major (P·1, B)
      slots = [
          (
              jnp.concatenate([s[0] for s in slots_per_pair], axis=0),
              [
                  jnp.concatenate([s[1][i] for s in slots_per_pair], axis=0)
                  for i in range(3)
              ],
              [
                  jnp.concatenate([s[2][i] for s in slots_per_pair], axis=0)
                  for i in range(3)
              ],
          )
      ]
    else:
      p1 = [gxpos[g1, i] for i in range(3)]
      m1 = [[gxmat[g1, i, j] for j in range(3)] for i in range(3)]
      s1 = [geom_size[g1, i] for i in range(3)]
      p2 = [gxpos[g2, i] for i in range(3)]
      m2 = [[gxmat[g2, i, j] for j in range(3)] for i in range(3)]
      s2 = [geom_size[g2, i] for i in range(3)]
      slots = _GROUP_FN[name](p1, m1, s1, p2, m2, s2)
    assert len(slots) == k or name == 'hfield_sphere'

    # frames + stack: slot-major lists → pair-major (P·k, ..., B)
    d_sl, pos_sl, fr_sl = [], [], []
    for dist, pos, n in slots:
      nrm, t1, t2 = _make_frame(n)
      d_sl.append(dist)  # (P, B)
      pos_sl.append(jnp.stack(pos, axis=-2))  # (P, 3, B)
      fr_sl.append(
          jnp.stack(
              [jnp.stack(v, axis=-2) for v in (nrm, t1, t2)], axis=-3
          )
      )  # (P, 3, 3, B)
    P = d_sl[0].shape[0]
    B = d_sl[0].shape[-1]
    nk = len(d_sl)
    # (k, P, ...) → (P, k, ...) → (P·k, ...)
    dist_parts.append(
        jnp.stack(d_sl, axis=1).reshape(P * nk, B)
    )
    pos_parts.append(jnp.stack(pos_sl, axis=1).reshape(P * nk, 3, B))
    frame_parts.append(jnp.stack(fr_sl, axis=1).reshape(P * nk, 3, 3, B))

    if include_solparams:
      fr_p, sr_p, si_p = _combine_params_lanes(
          cfg, geom_friction, geom_solref, geom_solimp, geom_solmix, g1, g2
      )  # (P, c, Bp)
      rep = lambda a: jnp.broadcast_to(
          a[:, None], (P, nk) + a.shape[1:]
      ).reshape((P * nk,) + a.shape[1:])
      fr_parts.append(rep(fr_p))
      sr_parts.append(rep(sr_p))
      si_parts.append(rep(si_p))

  out = (
      jnp.concatenate(dist_parts),
      jnp.concatenate(pos_parts),
      jnp.concatenate(frame_parts),
  )
  if include_solparams:
    out = out + (
        jnp.concatenate(fr_parts),
        jnp.concatenate(sr_parts),
        jnp.concatenate(si_parts),
    )
  return out


def combine_solparams(cfg, geom_friction, geom_solref, geom_solimp,
                      geom_solmix):
  """Per-slot contact solver parameters (mj_contactParam), per env.

  Static w.r.t. dynamics: a pure function of model leaves (DR-batched at
  most), so the hot path computes it once per env in plain batch-major
  code instead of piping (ncon, 12, B) lanes arrays through the collider
  transposes every substep.  Returns (friction (ncon, 5),
  solref (ncon, 2), solimp (ncon, 5)) in collision slot order.
  """
  from rsr_mjx_tpu.physics.io import GROUP_NCON

  fr_parts, sr_parts, si_parts = [], [], []
  fric_l = geom_friction[..., None]
  sr_l = geom_solref[..., None]
  si_l = geom_solimp[..., None]
  sm_l = geom_solmix[..., None]
  for name, tbl in cfg.pairs:
    pairs = tbl.arr
    if len(pairs) == 0:
      continue
    k = GROUP_NCON[name]
    g1, g2 = pairs[:, 0], pairs[:, 1]
    fr_p, sr_p, si_p = _combine_params_lanes(
        cfg, fric_l, sr_l, si_l, sm_l, g1, g2
    )  # (P, c, 1)
    P = len(pairs)
    rep = lambda a: jnp.broadcast_to(
        a[:, None, :, 0], (P, k, a.shape[1])
    ).reshape(P * k, a.shape[1])
    fr_parts.append(rep(fr_p))
    sr_parts.append(rep(sr_p))
    si_parts.append(rep(si_p))
  return (
      jnp.concatenate(fr_parts),
      jnp.concatenate(sr_parts),
      jnp.concatenate(si_parts),
  )


def _expand(x, batched):
  """Move batch (axis 0 if batched) to the trailing axis; else append 1."""
  if batched:
    return jnp.moveaxis(x, 0, -1)
  return x[..., None]


@functools.lru_cache(maxsize=None)
def _make_collider(cfg: _ColliderCfg):
  """Build the (cached per static config) narrow-phase callable.

  Returned fn(geom_size, geom_friction, geom_solref, geom_solimp,
  geom_solmix, hfield_data, geom_xpos, geom_xmat) → per-env contact arrays
  (dist (ncon,), pos (ncon,3), frame (ncon,3,3), friction (ncon,5),
  solref (ncon,2), solimp (ncon,5)).

  Under ``jax.vmap`` the custom_vmap rule computes the whole batch in
  lanes layout (batch-minor); under differentiation the custom_vjp runs
  the same (pure-jnp, differentiable) code for the backward pass.
  """

  def raw(size, hfd, gxpos, gxmat):
    out = _collide_lanes(
        cfg,
        size[..., None], None, None, None, None,
        hfd,
        gxpos[..., None],
        gxmat[..., None],
        include_solparams=False,
    )
    return tuple(x[..., 0] for x in out)

  @custom_vmap
  def cv(size, hfd, gxpos, gxmat):
    return raw(size, hfd, gxpos, gxmat)

  @cv.def_vmap
  def _cv_rule(axis_size, in_batched, size, hfd, gxpos, gxmat):
    if in_batched[1]:
      # batched heightfield data is unsupported in lanes (no randomizer
      # produces it); fall back to plain batch-major vmap.
      axes = tuple(0 if b else None for b in in_batched)
      out = jax.vmap(raw, in_axes=axes)(size, hfd, gxpos, gxmat)
      return out, tuple(True for _ in out)
    size_l = _expand(size, in_batched[0])
    gxpos_l = _expand(gxpos, in_batched[2])
    gxmat_l = _expand(gxmat, in_batched[3])
    out = _collide_lanes(cfg, size_l, None, None, None, None, hfd,
                         gxpos_l, gxmat_l, include_solparams=False)
    # lanes-major (ncon, ..., B) → batch-major (B, ncon, ...)
    outs = []
    for x in out:
      x = jnp.moveaxis(x, -1, 0)
      if x.shape[0] != axis_size:  # nothing batched fed geometry
        x = jnp.broadcast_to(x, (axis_size,) + x.shape[1:])
      outs.append(x)
    return tuple(outs), tuple(True for _ in outs)

  @jax.custom_vjp
  def collide(size, hfd, gxpos, gxmat):
    return cv(size, hfd, gxpos, gxmat)

  def fwd(*args):
    return cv(*args), args

  def bwd(res, ct):
    # custom_vjp bwd fns are traced outside forward.py's
    # default_matmul_precision('highest') context; re-establish it here so
    # the TPU backward matmuls don't silently drop to bf16 (ADVICE r3)
    with jax.default_matmul_precision('highest'):
      _, vjp = jax.vjp(raw, *res)
      return vjp(ct)

  collide.defvjp(fwd, bwd)
  return collide


def geoms_colliding(m: Model, d: Data, geom1: int, geom2: int) -> jax.Array:
  """True iff any contact slot of the (geom1, geom2) pair penetrates
  (reference: mujoco_playground _src/collision.py:16-18).

  The slots are located statically from the contact table, so this is a
  fixed gather + reduce under jit.
  """
  g1 = d.contact.geom1.arr
  g2 = d.contact.geom2.arr
  sel = np.nonzero(
      ((g1 == geom1) & (g2 == geom2)) | ((g1 == geom2) & (g2 == geom1))
  )[0]
  if len(sel) == 0:
    return jnp.zeros((), dtype=bool)
  return jnp.any(d.contact.dist[sel] < 0)


def contact_static_ids(m: Model):
  """Static per-slot (geom1, geom2, condim) StaticArrs in slot order.

  Fills Contact's metadata at make_data time so contact queries
  (geoms_colliding) work on any Data whose ``dist`` was produced by the
  fused solver — which never materializes the rest of the Contact set."""
  from rsr_mjx_tpu.physics.io import GROUP_NCON

  g1_parts, g2_parts, condim_parts = [], [], []
  for name, tbl in m.pairs:
    pairs = tbl.arr
    if len(pairs) == 0:
      continue
    k = GROUP_NCON[name]
    g1_parts.append(np.repeat(pairs[:, 0], k))
    g2_parts.append(np.repeat(pairs[:, 1], k))
    condim_parts.append(np.repeat(pairs[:, 2], k))
  return (
      StaticArr(np.concatenate(g1_parts)),
      StaticArr(np.concatenate(g2_parts)),
      StaticArr(np.concatenate(condim_parts)),
  )


def collision(m: Model, d: Data) -> Data:
  """Run the narrow phase; assemble the full Contact set.

  Not on the hot path any more (round-5): ``solver.solve_fused`` runs the
  narrow phase internally in lanes layout and writes back only ``dist``.
  This standalone version materializes everything — used by fwd_position
  callers that want a complete Contact (tests, debugging, profiling)."""
  if m.ncon == 0:
    return d

  cfg = _cfg_of(m)
  fn = _make_collider(cfg)
  hfd = m.hfield_data
  if hfd is None:
    hfd = jnp.zeros((0,), dtype=d.qpos.dtype)
  dist, pos, frame = fn(m.geom_size, hfd, d.geom_xpos, d.geom_xmat)
  friction, solref, solimp = combine_solparams(
      cfg, m.geom_friction, m.geom_solref, m.geom_solimp, m.geom_solmix
  )
  g1, g2, condim = contact_static_ids(m)
  contact = Contact(
      dist=dist,
      pos=pos,
      frame=frame,
      friction=friction,
      solref=solref,
      solimp=solimp,
      geom1=g1,
      geom2=g2,
      condim=condim,
  )
  return d.replace(contact=contact)
