"""Split the collision stage cost: lanes narrow phase vs the
lanes->batch-major transpose of contact outputs (scan-based, jiggled)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rsr_mjx_tpu import envs
from rsr_mjx_tpu.physics import collision as collision_mod

B = 1024
K = 20


def main():
  env = envs.load('AirbotCubePush', max_contacts=32)
  m = env.model
  state = jax.jit(jax.vmap(env.reset))(
      jax.random.split(jax.random.PRNGKey(0), B)
  )
  d = state.data
  cfg = collision_mod._cfg_of(m)

  gxpos = d.geom_xpos  # (B, ngeom, 3)
  gxmat = d.geom_xmat

  hfd = m.hfield_data
  if hfd is None:
    hfd = jnp.zeros((0,), jnp.float32)

  statics = (m.geom_size, m.geom_friction, m.geom_solref, m.geom_solimp,
             m.geom_solmix)

  def lanes_only(gxpos, gxmat):
    out = collision_mod._collide_lanes(
        cfg, statics[0][..., None], None, None, None, None, hfd,
        jnp.moveaxis(gxpos, 0, -1), jnp.moveaxis(gxmat, 0, -1),
        include_solparams=False,
    )
    # reduce each output so nothing is transposed back
    return sum(jnp.sum(x) for x in out)

  def full(gxpos, gxmat):
    fn = collision_mod._make_collider(cfg)
    out = jax.vmap(lambda p, x: fn(statics[0], hfd, p, x))(gxpos, gxmat)
    return sum(jnp.sum(x) for x in out)

  def bench(name, fn):
    def run(gxpos, gxmat):
      def body(carry, i):
        # jiggle so nothing is loop-invariant
        gp = gxpos + 1e-6 * i
        gm = gxmat
        return carry + fn(gp, gm), None

      acc, _ = jax.lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))
      return acc

    jf = jax.jit(run)
    out = jf(gxpos, gxmat)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(3):
      out = jf(gxpos, gxmat)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / (3 * K)
    print(f'{name:30s} {dt*1e3:8.3f} ms/iter', flush=True)
    return dt

  base = bench('jiggle-only', lambda p, x: jnp.sum(p) * 0.0)
  t_lanes = bench('narrow phase (lanes, no T)', lanes_only)
  t_full = bench('full collision (with T)', full)
  print(f'transpose overhead ~ {(t_full - t_lanes)*1e3:.3f} ms/iter')


if __name__ == '__main__':
  main()
