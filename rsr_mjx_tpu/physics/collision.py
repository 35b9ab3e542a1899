"""Static-shape narrow-phase collision.

The pair table is precomputed on the host (io._collision_pairs); at runtime
every potential pair always produces its fixed quota of contact slots, with
``dist > 0`` marking separated candidates (those get ~zero impedance in the
constraint stage, so they are numerically inert).  No broad-phase, no
gather/scatter, no dynamic shapes — the XLA-native replacement for the
reference's nconmax-buffered dynamic contacts (cube.xml:36).

Contact convention (MuJoCo-compatible): ``frame[0]`` is the contact normal
pointing from geom1 towards geom2; ``dist < 0`` means penetration; ``pos``
is the midpoint between the two surfaces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rsr_mjx_tpu.physics.types import Contact, Data, Model, StaticArr

_MJ_MINVAL = 1e-15


def _safe_norm(x: jax.Array, axis=-1, keepdims=False) -> jax.Array:
  """‖x‖ with a NaN-free gradient at x = 0 (double-where trick).

  A plain jnp.linalg.norm has d‖x‖/dx = x/‖x‖ → NaN at zero; zero vectors
  occur on the differentiation path for every box-interior contact point
  (_point_box), which poisons env_params_tuning gradients through the
  contact solve (reference relies on the same property via MJX's safe
  math, SURVEY §3.2)."""
  sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
  is_zero = sq < _MJ_MINVAL
  return jnp.where(is_zero, 0.0, jnp.sqrt(jnp.where(is_zero, 1.0, sq)))


def _safe_normalize(x: jax.Array) -> tuple[jax.Array, jax.Array]:
  """(x/‖x‖, ‖x‖) with zero output and NaN-free gradient at x = 0."""
  norm = _safe_norm(x, keepdims=True)
  n = x / jnp.where(norm < _MJ_MINVAL, 1.0, norm)
  return n, jnp.squeeze(norm, -1)


def _make_frame(n: jax.Array) -> jax.Array:
  """Orthonormal frame rows (n, t1, t2) from a unit normal."""
  # pick the axis least aligned with n
  a = jnp.where(
      jnp.abs(n[..., 0:1]) < 0.5,
      jnp.array([1.0, 0.0, 0.0], dtype=n.dtype),
      jnp.array([0.0, 1.0, 0.0], dtype=n.dtype),
  )
  t1, _ = _safe_normalize(jnp.cross(n, a))
  t2 = jnp.cross(n, t1)
  return jnp.stack([n, t1, t2], axis=-2)


def _combine_params(m: Model, g1: np.ndarray, g2: np.ndarray):
  """Mix contact friction/solref/solimp of two geom sets (mj_contactParam).

  g1/g2 are static numpy id arrays; the parameters themselves are traced
  Model leaves so domain randomization of geom_friction flows through
  (reference: ppo_train/airbot_training/domain_randomize.py:37-49).
  """
  p1 = m.geom_priority.arr[g1]
  p2 = m.geom_priority.arr[g2]
  f1, f2 = m.geom_friction[g1], m.geom_friction[g2]
  sr1, sr2 = m.geom_solref[g1], m.geom_solref[g2]
  si1, si2 = m.geom_solimp[g1], m.geom_solimp[g2]
  mix1, mix2 = m.geom_solmix[g1], m.geom_solmix[g2]

  denom = mix1 + mix2
  w1 = jnp.where(
      denom > _MJ_MINVAL,
      mix1 / jnp.maximum(denom, _MJ_MINVAL),
      0.5,
  )
  w1 = jnp.where((mix1 < _MJ_MINVAL) & (mix2 >= _MJ_MINVAL), 0.0, w1)
  w1 = jnp.where((mix2 < _MJ_MINVAL) & (mix1 >= _MJ_MINVAL), 1.0, w1)
  w1 = w1[:, None]

  pri1 = (p1 > p2)[:, None]
  pri2 = (p2 > p1)[:, None]
  nopri = ~(pri1 | pri2)

  friction3 = (
      jnp.where(pri1, f1, 0)
      + jnp.where(pri2, f2, 0)
      + jnp.where(nopri, jnp.maximum(f1, f2), 0)
  )
  # standard (positive) solref mixes; direct (non-positive) takes the min
  solref_mix = w1 * sr1 + (1 - w1) * sr2
  direct = (sr1[:, 0:1] <= 0) | (sr2[:, 0:1] <= 0)
  solref_nopri = jnp.where(direct, jnp.minimum(sr1, sr2), solref_mix)
  solref = (
      jnp.where(pri1, sr1, 0)
      + jnp.where(pri2, sr2, 0)
      + jnp.where(nopri, solref_nopri, 0)
  )
  solimp = (
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
      axis=-1,
  )
  return friction, solref, solimp


# ---------------------------------------------------------------------------
# per-pair geometry functions: signature (m, d, g1_pos, g1_mat, size1,
#                                          g2_pos, g2_mat, size2) -> per-pair
# (k, ...) contacts: dist (k,), pos (k,3), normal n (k,3)
# ---------------------------------------------------------------------------


def _plane_sphere(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  r = s2[0]
  dist = jnp.dot(n, p2 - p1) - r
  pos = p2 - n * (r + 0.5 * dist)
  return dist[None], pos[None], n[None]


def _plane_capsule(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  axis = m2[:, 2]
  r, half = s2[0], s2[1]
  ends = jnp.stack([p2 + axis * half, p2 - axis * half])
  dist = ends @ n - jnp.dot(n, p1) - r
  pos = ends - n[None] * (r + 0.5 * dist[:, None])
  return dist, pos, jnp.stack([n, n])


def _box_corners(p, mat, size):
  """(8, 3) world corners of a box."""
  signs = jnp.array(
      [
          [sx, sy, sz]
          for sx in (-1.0, 1.0)
          for sy in (-1.0, 1.0)
          for sz in (-1.0, 1.0)
      ]
  ).astype(p.dtype)
  return p + (signs * size) @ mat.T


def _plane_box(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  corners = _box_corners(p2, m2, s2)  # (8,3)
  dist = corners @ n - jnp.dot(n, p1)
  # keep the 4 deepest corners (resting face)
  _, idx = jax.lax.top_k(-dist, 4)
  dist4 = dist[idx]
  pos = corners[idx] - n[None] * (0.5 * dist4[:, None])
  return dist4, pos, jnp.broadcast_to(n, (4, 3))


def _sphere_sphere(p1, m1, s1, p2, m2, s2):
  n, l = _safe_normalize(p2 - p1)
  dist = l - s1[0] - s2[0]
  pos = p1 + n * (s1[0] + 0.5 * dist)
  return dist[None], pos[None], n[None]


def _closest_on_segment(p, a, axis, half):
  t = jnp.clip(jnp.dot(p - a, axis), -half, half)
  return a + axis * t


def _sphere_capsule(p1, m1, s1, p2, m2, s2):
  c = _closest_on_segment(p1, p2, m2[:, 2], s2[1])
  return _sphere_sphere(p1, m1, s1, c, m2, s2)


def _point_box(v, pb, mb, sb):
  """Signed distance + direction from point v to box; returns
  (dist, n_point_to_box_surface_outward) where dist<0 inside.

  For v outside: dist = |v − closest|, n = (closest − v)/dist (towards box).
  For v inside: dist = −min face margin, n = −outward face normal
  (so that in both cases pos = v + n·dist/2 is the contact midpoint and n
  points from the point's body towards the box for the penetrating case
  consistent with 'normal: geom1 → geom2' when v ∈ geom1, box = geom2).
  """
  local = mb.T @ (v - pb)
  clamped = jnp.clip(local, -sb, sb)
  outside_dir, out_d = _safe_normalize(local - clamped)
  inside = out_d < _MJ_MINVAL

  # inside: face with minimum margin
  margins = sb - jnp.abs(local)  # (3,) all >= 0 when inside
  k = jnp.argmin(margins)
  sgn = jnp.sign(local[k]) + (local[k] == 0)
  outward_local = jnp.zeros(3, dtype=v.dtype).at[k].set(sgn)
  outward = mb @ outward_local

  n_out = -(mb @ outside_dir)
  dist = jnp.where(inside, -margins[k], out_d)
  n = jnp.where(inside, -outward, n_out)
  return dist, n


def _sphere_box(p1, m1, s1, p2, m2, s2):
  dist_c, n = _point_box(p1, p2, m2, s2)
  r = s1[0]
  dist = dist_c - r
  # surface point of sphere towards box: p1 + n*r ; midpoint:
  pos = p1 + n * (r + 0.5 * dist)
  return dist[None], pos[None], n[None]


def _capsule_box(p1, m1, s1, p2, m2, s2):
  axis = m1[:, 2]
  r, half = s1[0], s1[1]
  ends = jnp.stack([p1 + axis * half, p1 - axis * half])

  def one(e):
    dc, n = _point_box(e, p2, m2, s2)
    dist = dc - r
    pos = e + n * (r + 0.5 * dist)
    return dist, pos, n

  dist, pos, n = jax.vmap(one)(ends)
  return dist, pos, n


def _segment_segment(a1, u1, h1, a2, u2, h2):
  """Closest points between two segments (centers a, unit dirs u, half-len h)."""
  d = a1 - a2
  a = 1.0
  b = jnp.dot(u1, u2)
  c = 1.0
  e = jnp.dot(u1, d)
  f = jnp.dot(u2, d)
  denom = a * c - b * b
  s = jnp.where(jnp.abs(denom) > 1e-9, (b * f - c * e) / jnp.where(jnp.abs(denom) > 1e-9, denom, 1.0), 0.0)
  s = jnp.clip(s, -h1, h1)
  t = jnp.clip(b * s + f, -h2, h2)
  s = jnp.clip(b * t - e, -h1, h1)
  return a1 + u1 * s, a2 + u2 * t


def _capsule_capsule(p1, m1, s1, p2, m2, s2):
  c1, c2 = _segment_segment(p1, m1[:, 2], s1[1], p2, m2[:, 2], s2[1])
  n, l = _safe_normalize(c2 - c1)
  dist = l - s1[0] - s2[0]
  pos = c1 + n * (s1[0] + 0.5 * dist)
  return dist[None], pos[None], n[None]


def _box_box(p1, m1, s1, p2, m2, s2):
  """Vertex-in-box manifold both directions, 8 deepest of 16 candidates.

  Handles face-face resting (4 corners active) and face-vertex pushing —
  the regimes exercised by cube-on-table and finger-on-cube contacts.
  Edge-edge crossings are approximated by their nearest vertex contacts.
  """
  c1 = _box_corners(p1, m1, s1)
  c2 = _box_corners(p2, m2, s2)

  def v_in_2(v):  # vertex of box1 into box2: n already points 1 → 2
    dist, n = _point_box(v, p2, m2, s2)
    return dist, v + n * (0.5 * dist), n

  def v_in_1(v):  # vertex of box2 into box1: flip to keep normal 1 → 2
    dist, n = _point_box(v, p1, m1, s1)
    return dist, v + n * (0.5 * dist), -n

  d1, pos1, n1 = jax.vmap(v_in_2)(c1)
  d2, pos2, n2 = jax.vmap(v_in_1)(c2)
  dist = jnp.concatenate([d1, d2])
  pos = jnp.concatenate([pos1, pos2])
  n = jnp.concatenate([n1, n2])
  _, idx = jax.lax.top_k(-dist, 8)
  return dist[idx], pos[idx], n[idx]


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


def _hfield_sphere(m: Model, d: Data, pairs: np.ndarray):
  """Sphere vs heightfield: bilinear height sample under the sphere center.

  Good for foot-sized spheres on smoothly varying terrain (Go2 rough
  terrain, scene_mjx_feetonly_rough_terrain.xml:15-24).
  """
  g1 = pairs[:, 0]  # hfield
  g2 = pairs[:, 1]  # sphere

  def one(hid_pos, hid_mat, hsize, nrow, ncol, adr, center, r):
    # local coords in hfield frame
    local = hid_mat.T @ (center - hid_pos)
    # grid coordinates: x ∈ [-sx, sx] → col, y → row
    fx = (local[0] / hsize[0] * 0.5 + 0.5) * (ncol - 1)
    fy = (local[1] / hsize[1] * 0.5 + 0.5) * (nrow - 1)
    fx = jnp.clip(fx, 0.0, ncol - 1.001)
    fy = jnp.clip(fy, 0.0, nrow - 1.001)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    wx = fx - x0
    wy = fy - y0
    hdata = jax.lax.dynamic_slice(m.hfield_data, (adr,), (nrow * ncol,))
    hgrid = hdata.reshape(nrow, ncol)
    h00 = hgrid[y0, x0]
    h01 = hgrid[y0, x0 + 1]
    h10 = hgrid[y0 + 1, x0]
    h11 = hgrid[y0 + 1, x0 + 1]
    h = (
        h00 * (1 - wx) * (1 - wy)
        + h01 * wx * (1 - wy)
        + h10 * (1 - wx) * wy
        + h11 * wx * wy
    ) * hsize[2]
    # estimate surface normal from finite differences (cell-scale)
    dx = 2 * hsize[0] / (ncol - 1)
    dy = 2 * hsize[1] / (nrow - 1)
    gx = (h01 - h00) * hsize[2] / dx
    gy = (h10 - h00) * hsize[2] / dy
    n_local = jnp.array([-gx, -gy, 1.0], dtype=center.dtype)
    n_local = n_local / jnp.linalg.norm(n_local)
    n = hid_mat @ n_local
    dist = (local[2] - h) - r
    pos = center - n * (r + 0.5 * dist)
    return dist[None], pos[None], n[None]

  outs = []
  for k in range(len(g1)):
    hgeom, sgeom = int(g1[k]), int(g2[k])
    hid = int(m.geom_dataid.arr[hgeom])
    outs.append(
        one(
            d.geom_xpos[hgeom],
            d.geom_xmat[hgeom],
            jnp.asarray(m.hfield_size.arr[hid], dtype=d.qpos.dtype),
            int(m.hfield_nrow.arr[hid]),
            int(m.hfield_ncol.arr[hid]),
            int(m.hfield_adr.arr[hid]),
            d.geom_xpos[sgeom],
            m.geom_size[sgeom][0],
        )
    )
  dist = jnp.concatenate([o[0] for o in outs])
  pos = jnp.concatenate([o[1] for o in outs])
  n = jnp.concatenate([o[2] for o in outs])
  return dist, pos, n


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


def collision(m: Model, d: Data) -> Data:
  """Run all pair groups; assemble the static Contact set."""
  if m.ncon == 0:
    return d

  all_dist, all_pos, all_n = [], [], []
  all_g1, all_g2, all_condim = [], [], []

  from rsr_mjx_tpu.physics.io import GROUP_NCON

  for name, tbl in m.pairs:
    pairs = tbl.arr
    if len(pairs) == 0:
      continue
    k = GROUP_NCON[name]
    g1, g2 = pairs[:, 0], pairs[:, 1]
    if name == 'hfield_sphere':
      dist, pos, n = _hfield_sphere(m, d, pairs)
    else:
      fn = _GROUP_FN[name]
      dist, pos, n = jax.vmap(fn)(
          d.geom_xpos[g1],
          d.geom_xmat[g1],
          m.geom_size[g1],
          d.geom_xpos[g2],
          d.geom_xmat[g2],
          m.geom_size[g2],
      )
      dist = dist.reshape(-1)
      pos = pos.reshape(-1, 3)
      n = n.reshape(-1, 3)
    all_dist.append(dist)
    all_pos.append(pos)
    all_n.append(n)
    all_g1.append(np.repeat(g1, k))
    all_g2.append(np.repeat(g2, k))
    all_condim.append(np.repeat(pairs[:, 2], k))

  dist = jnp.concatenate(all_dist)
  pos = jnp.concatenate(all_pos)
  n = jnp.concatenate(all_n)
  g1 = np.concatenate(all_g1)
  g2 = np.concatenate(all_g2)
  condim = np.concatenate(all_condim)

  friction, solref, solimp = _combine_params(m, g1, g2)
  frame = _make_frame(n)

  contact = Contact(
      dist=dist,
      pos=pos,
      frame=frame,
      friction=friction,
      solref=solref,
      solimp=solimp,
      geom1=StaticArr(g1),
      geom2=StaticArr(g2),
      condim=StaticArr(condim),
  )
  return d.replace(contact=contact)
