"""Sub-stage profiler for the constraint assembly (scan-based, like
profile_scan.py).  Identifies where the batch-major assembly spends time:
selection, gathers, contact jacobian, row stacking, impedance math.

Usage: python scripts/profile_assembly.py [num_envs] [K]
"""

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

  import importlib

  from rsr_mjx_tpu import envs
  from rsr_mjx_tpu.physics import constraint as C
  from rsr_mjx_tpu.physics import solver as S

  # physics/__init__ re-exports the `forward` *function*, shadowing the
  # module under `from ... import forward` (round-2 profiler bug class)
  F = importlib.import_module('rsr_mjx_tpu.physics.forward')

  env = envs.load('AirbotCubePush', max_contacts=32)
  m = env.model
  nsel = m.ncon_sel

  rng = jax.random.split(jax.random.PRNGKey(0), num_envs)
  state = jax.jit(jax.vmap(env.reset))(rng)
  d0 = jax.jit(jax.vmap(lambda dd: F.forward(m, dd)))(state.data)
  jax.block_until_ready(d0.qacc)

  def jiggle(d, i):
    eps = 1e-12 * i

    def f(x):
      if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating):
        return x + jnp.asarray(eps, dtype=x.dtype)
      return x

    return jax.tree.map(f, d)

  def scan_stage(stage):
    def body(carry, i):
      d = jiggle(carry, i)
      out = jax.vmap(stage)(d)
      # fold the probe back into the carry so nothing is dead code
      d = d.replace(qacc=d.qacc + 0.0 * out)
      return d, ()

    def run(d):
      d, _ = jax.lax.scan(body, d, jnp.arange(K, dtype=d.qpos.dtype))
      return d

    return jax.jit(run)

  def bench(name, stage, n=2, base=0.0):
    fn = scan_stage(stage)
    out = fn(d0)
    jax.block_until_ready(out.qpos)
    t0 = time.time()
    for _ in range(n):
      out = fn(d0)
    jax.block_until_ready(out.qpos)
    dt = (time.time() - t0) / (n * K) - base
    print(f'{name:40s} {dt * 1e3:9.3f} ms/iter', flush=True)
    return dt

  t_base = bench('jiggle only (baseline)', lambda dd: jnp.zeros(m.nv))

  # --- selection variants
  def sel_topk(dd):
    _, sel_idx = jax.lax.top_k(-dd.contact.dist, nsel)
    return jnp.sum(sel_idx.astype(jnp.float32)) * jnp.ones(m.nv)

  def sel_compact(dd):
    pen = dd.contact.dist < 0.0
    dest = jnp.cumsum(pen.astype(jnp.int32)) - 1
    dest = jnp.where(pen & (dest < nsel), dest, nsel)
    slot_iota = jnp.arange(m.ncon, dtype=jnp.int32)
    sel_idx = jnp.zeros(nsel + 1, jnp.int32).at[dest].set(slot_iota)[:nsel]
    return jnp.sum(sel_idx.astype(jnp.float32)) * jnp.ones(m.nv)

  def sel_gather(dd):
    pen = dd.contact.dist < 0.0
    dest = jnp.cumsum(pen.astype(jnp.int32)) - 1
    dest = jnp.where(pen & (dest < nsel), dest, nsel)
    slot_iota = jnp.arange(m.ncon, dtype=jnp.int32)
    sel_idx = jnp.zeros(nsel + 1, jnp.int32).at[dest].set(slot_iota)[:nsel]
    con = dd.contact
    tot = (
        jnp.sum(con.dist[sel_idx])
        + jnp.sum(con.pos[sel_idx])
        + jnp.sum(con.frame[sel_idx])
        + jnp.sum(con.friction[sel_idx])
        + jnp.sum(con.solref[sel_idx])
        + jnp.sum(con.solimp[sel_idx])
    )
    return tot * jnp.ones(m.nv)

  bench('selection: top_k only', sel_topk, base=t_base)
  bench('selection: compaction only', sel_compact, base=t_base)
  bench('selection: compaction + gathers', sel_gather, base=t_base)

  def sel_topk_gather(dd):
    _, sel_idx = jax.lax.top_k(-dd.contact.dist, nsel)
    con = dd.contact
    tot = (
        jnp.sum(con.dist[sel_idx])
        + jnp.sum(con.pos[sel_idx])
        + jnp.sum(con.frame[sel_idx])
        + jnp.sum(con.friction[sel_idx])
        + jnp.sum(con.solref[sel_idx])
        + jnp.sum(con.solimp[sel_idx])
    )
    return tot * jnp.ones(m.nv)

  bench('selection: top_k + gathers', sel_topk_gather, base=t_base)

  def jac_probe(dd):
    """Contact jacobian from pre-selected arrays (selection included but
    cheap): the (nc, nv, 3) cross/einsum block."""
    _, sel_idx = jax.lax.top_k(-dd.contact.dist, nsel)
    con = dd.contact
    c_pos = con.pos[sel_idx]
    c_frame = con.frame[sel_idx]
    ang = dd.cdof[:, :3]
    lin = dd.cdof[:, 3:]
    rel = c_pos[:, None, :] - dd.cdof_anchor[None, :, :]
    jac_t = lin[None] + jnp.cross(
        jnp.broadcast_to(ang[None], rel.shape), rel
    )
    jac_r = jnp.broadcast_to(ang[None], rel.shape)
    n = c_frame[:, 0]
    axes = [
        jnp.einsum('cvk,ck->cv', jac_t, n),
        jnp.einsum('cvk,ck->cv', jac_t, c_frame[:, 1]),
        jnp.einsum('cvk,ck->cv', jac_t, c_frame[:, 2]),
        jnp.einsum('cvk,ck->cv', jac_r, n),
        jnp.einsum('cvk,ck->cv', jac_r, c_frame[:, 1]),
        jnp.einsum('cvk,ck->cv', jac_r, c_frame[:, 2]),
    ]
    return sum(jnp.sum(a) for a in axes) * jnp.ones(m.nv)

  bench('jacobian cross+einsum block', jac_probe, base=t_base)

  # --- full assembly and solve
  def asm(dd):
    efc = C.make_constraints(m, dd)
    return (
        jnp.sum(efc.J, axis=0) * 0.0
        + jnp.sum(efc.aref)
        + jnp.sum(efc.D)
        + jnp.sum(efc.floss)
    ) * jnp.ones(m.nv)

  bench('full assembly', asm, base=t_base)

  def asm_newton(dd):
    efc = C.make_constraints(m, dd)
    out = S.solve(m, dd, efc)
    return out.qacc

  bench('assembly + newton', asm_newton, base=t_base)


if __name__ == '__main__':
  main()
