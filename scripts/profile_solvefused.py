"""Decompose solve_fused's on-device cost: lanes narrow phase, top-k
selection + feature gather, Jacobian build + aref, Newton kernel.  Scan
discipline as profile_scan.py (K iterations inside one jit, jiggled
inputs, baseline subtracted).

Usage: python scripts/profile_solvefused.py [num_envs] [K]
"""

import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
  num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
  K = int(sys.argv[2]) if len(sys.argv) > 2 else 20

  from rsr_mjx_tpu import envs
  from rsr_mjx_tpu.physics import collision as _col
  from rsr_mjx_tpu.physics import constraint as C
  from rsr_mjx_tpu.physics import lanes_assembly as LA
  from rsr_mjx_tpu.physics import lanes_smooth as _ls
  from rsr_mjx_tpu.physics import linalg_kernels as _lk
  from rsr_mjx_tpu.physics import kinematics as _kin
  from rsr_mjx_tpu.physics import solver as _solver

  env = envs.load('AirbotCubePush', max_contacts=24)
  m = env.model
  lay = C.layout_cached(m)

  rng = jax.random.split(jax.random.PRNGKey(0), num_envs)
  state = jax.jit(jax.vmap(env.reset))(rng)
  d0 = state.data
  with jax.default_matmul_precision('highest'):
    d1 = jax.jit(jax.vmap(lambda dd: _kin.kinematics(m, dd)))(d0)
    d2 = jax.jit(jax.vmap(lambda dd: _ls.smooth_fused(m, dd)))(d1)
  jax.block_until_ready(d2.qpos)
  print(f'num_envs={num_envs} K={K} nefc={lay.nefc}')

  lv = jax.vmap(lambda dd: C.gather_leaves(m, dd))(d2)
  # mimic solver._build_fused's lanes path: statics the DR does not batch
  # stay UNBATCHED (take env 0 — all envs identical here)
  _unbatch = ('geom_size', 'con_friction', 'con_solref', 'con_solimp',
              'con_invweight')
  lv = C.AssembleLeaves(*(
      (a[0] if f in _unbatch and a is not None else a)
      for f, a in zip(C.AssembleLeaves._fields, lv)
  ))

  with jax.default_matmul_precision('highest'):
    J_l, aref_l, D_l, fl_l, dist_bm = jax.jit(
        lambda lv_: LA.assemble_lanes(m, lv_)
    )(lv)
  jax.block_until_ready(J_l)

  def jiggle(tree, i):
    eps = 1e-12 * i

    def f(x):
      if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating):
        return x + jnp.asarray(eps, dtype=x.dtype)
      return x

    return jax.tree.map(f, tree)

  def bench(name, stage, tree_in, n=2, base=0.0):
    """stage: tree -> tree (same structure so it can carry)."""

    def body(carry, i):
      t = jiggle(carry, i)
      t = stage(t)
      return t, ()

    @jax.jit
    def run(t):
      with jax.default_matmul_precision('highest'):
        t, _ = jax.lax.scan(body, t, jnp.arange(K, dtype=jnp.float32))
      return t

    out = run(tree_in)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
      out = run(tree_in)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / (n * K) - base
    print(f'{name:36s} {dt * 1e3:9.3f} ms/iter', flush=True)
    return dt

  # --- baseline for lv-shaped carries
  t_b_lv = bench('jiggle lv (baseline)', lambda t: t, lv)

  # --- full assemble_lanes; fold outputs back into qpos-shaped carry
  def asm_full(t):
    J, aref, D, fl, dist = LA.assemble_lanes(m, t)
    probe = (jnp.sum(J) + jnp.sum(aref) + jnp.sum(D) + jnp.sum(fl)
             + jnp.sum(dist))
    return t._replace(qpos=t.qpos + 0.0 * probe)

  bench('assemble_lanes (narrow+sel+J)', asm_full, lv, base=t_b_lv)

  # --- narrow phase only
  cfg = _col._cfg_of(m)

  def narrow_only(t):
    size_l = (
        jnp.moveaxis(t.geom_size, 0, -1) if t.geom_size.ndim == 3
        else t.geom_size[..., None]
    )
    dist_l, pos_l, frame_l = _col._collide_lanes(
        cfg, size_l, None, None, None, None, t.hfield_data,
        jnp.moveaxis(t.geom_xpos, 0, -1), jnp.moveaxis(t.geom_xmat, 0, -1),
        include_solparams=False,
    )
    probe = jnp.sum(dist_l) + jnp.sum(pos_l) + jnp.sum(frame_l)
    return t._replace(qpos=t.qpos + 0.0 * probe)

  bench('  narrow phase only', narrow_only, lv, base=t_b_lv)

  # --- top-k + one-hot feature selection only
  nsel = C._selection_size(m)

  def sel_only(t):
    size_l = (
        jnp.moveaxis(t.geom_size, 0, -1) if t.geom_size.ndim == 3
        else t.geom_size[..., None]
    )
    dist_l, pos_l, frame_l = _col._collide_lanes(
        cfg, size_l, None, None, None, None, t.hfield_data,
        jnp.moveaxis(t.geom_xpos, 0, -1), jnp.moveaxis(t.geom_xmat, 0, -1),
        include_solparams=False,
    )
    B = dist_l.shape[-1]
    dist_bm = jnp.moveaxis(dist_l, -1, 0)
    _, sel_idx = jax.lax.top_k(-dist_bm, nsel)
    onehot = (
        sel_idx[..., None] == jnp.arange(m.ncon, dtype=sel_idx.dtype)
    ).astype(dist_l.dtype)
    feat_dyn = jnp.concatenate(
        [dist_l[:, None], pos_l, frame_l.reshape(m.ncon, 9, B)], axis=1
    )
    sel_dyn = jnp.einsum('bsc,cfb->sfb', onehot, feat_dyn)
    dmask_all = C.contact_dmask(m).astype(np.float32)
    dmask = jnp.moveaxis(
        jnp.einsum('bsc,cv->bsv', onehot, jnp.asarray(dmask_all, dist_l.dtype)),
        0, -1)
    probe = jnp.sum(sel_dyn) + jnp.sum(dmask)
    return t._replace(qpos=t.qpos + 0.0 * probe)

  t_sel = bench('  narrow + topk/onehot select', sel_only, lv, base=t_b_lv)
  del t_sel

  # --- basis assembly (narrow + Pallas selection + basis build)
  def asm_basis(t):
    out = LA.assemble_lanes(m, t, basis=True)
    probe = sum(jnp.sum(o) for o in out[:8])
    return t._replace(qpos=t.qpos + 0.0 * probe)

  bench('assemble_lanes basis', asm_basis, lv, base=t_b_lv)

  with jax.default_matmul_precision('highest'):
    (J_s, aref_s, D_s, fl_s, dist_bm2, U, arefU, D_c, naxes) = jax.jit(
        lambda lv_: LA.assemble_lanes(m, lv_, basis=True)
    )(lv)
  naxes = int(naxes)
  jax.block_until_ready(U)

  # --- Newton kernel only (fixed J etc., jiggled)
  kern_in = (d2.qM, d2.qacc_smooth, d2.qacc, J_l, aref_l, D_l, fl_l)
  t_b_k = bench('jiggle kernel-inputs (baseline)', lambda t: t, kern_in)

  kind = lay.kind
  iters = max(min(m.opt.iterations, 6), 1)
  ls_eff = max(min(m.opt.ls_iterations, 6), 1)

  def kern_only(t):
    M, a0, x0, J, aref, D, fl = t
    x, f, qf = _lk.newton_solve_lanes(
        kind, iters, ls_eff, M, a0, x0, J, aref, D, fl
    )
    probe = jnp.sum(x) + jnp.sum(f) + jnp.sum(qf)
    return (M, a0 + 0.0 * probe, x0, J, aref, D, fl)

  bench('newton kernel generic', kern_only, kern_in, base=t_b_k)

  n_struct = lay.n_eq + lay.n_fri + lay.n_lim
  kind_s = lay.kind[:n_struct]
  kern_in2 = (d2.qM, d2.qacc_smooth, d2.qacc, J_s, aref_s, D_s, fl_s,
              U, arefU, D_c)
  t_b_k2 = bench('jiggle pyr-inputs (baseline)', lambda t: t, kern_in2)

  def kern_pyr(t):
    M, a0, x0, Js, arefs, Ds, fls, U_, arefU_, Dc_ = t
    x, f, qf = _lk.newton_solve_lanes_pyr(
        iters, ls_eff, kind_s, M, a0, x0, Js, arefs, Ds, fls,
        U_, arefU_, Dc_, naxes,
    )
    probe = jnp.sum(x) + jnp.sum(f) + jnp.sum(qf)
    return (M, a0 + 0.0 * probe, x0, Js, arefs, Ds, fls, U_, arefU_, Dc_)

  bench('newton kernel pyr-basis', kern_pyr, kern_in2, base=t_b_k2)


if __name__ == '__main__':
  main()
