"""Measure the worst-case number of simultaneously penetrating narrow-phase
probes PER COLLISION PAIR under the end-effector slam (the adversarial
workload of scripts/impact_probe.py).

This bounds the per-pair pre-selection width `t` of the two-stage contact
selection (lanes_assembly): stage 1 keeps the top-t most-penetrating
probes of each pair before the global top-k, which is exact as long as no
reachable state has more than t penetrating probes in one pair (separated
rows are inert in the Newton system, so selection only matters for
penetrating slots).

Usage: python scripts/pair_penetration_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rsr_mjx_tpu import envs
from rsr_mjx_tpu.physics import collision as _collision
from rsr_mjx_tpu.physics.io import GROUP_NCON, name2id


def main():
  # full model, selection disabled — we need every slot's dist
  env = envs.load('AirbotCubePush', max_contacts=0)
  m = env.model

  body = name2id(m, 'body', 'cube_for_push')
  jadr = int(m.body_jntadr.arr[body])
  vadr = int(m.jnt_dofadr.arr[jadr])
  del vadr

  # per-slot pair id, in assembly order
  pair_ids = []
  pid = 0
  for name, tbl in m.pairs:
    k = GROUP_NCON[name]
    for _ in range(len(tbl.arr)):
      pair_ids.extend([pid] * k)
      pid += 1
  pair_ids = np.asarray(pair_ids)
  n_pairs = pid
  onehot = jnp.asarray(
      (pair_ids[None, :] == np.arange(n_pairs)[:, None]).astype(np.float32)
  )  # (n_pairs, ncon)

  @jax.jit
  def run(keys):
    state = jax.vmap(env.reset)(keys)

    def body_fn(carry, _):
      s = carry
      act = jnp.concatenate(
          [jnp.clip(s.obs[:, -3:] / 0.005, -1, 1),
           jnp.zeros((s.obs.shape[0], 2))], axis=1
      )
      ns = jax.vmap(env.step)(s, act)
      d = jax.vmap(lambda dd: _collision.collision(m, dd).contact.dist)(
          ns.data
      )  # (B, ncon)
      pen = (d < 0).astype(jnp.float32)
      per_pair = jnp.einsum('pc,bc->bp', onehot, pen)  # (B, n_pairs)
      return ns, (jnp.max(per_pair), jnp.max(jnp.sum(pen, axis=1)))

    _, (mx, tot) = jax.lax.scan(body_fn, state, (), length=100)
    return jnp.max(mx), jnp.max(tot)

  worst_pair = 0.0
  worst_tot = 0.0
  for seed in range(3):
    keys = jax.random.split(jax.random.PRNGKey(seed), 8)
    a, b = run(keys)
    worst_pair = max(worst_pair, float(a))
    worst_tot = max(worst_tot, float(b))
  print(f'max penetrating probes in one pair: {worst_pair:.0f}')
  print(f'max penetrating probes total:       {worst_tot:.0f}')


if __name__ == '__main__':
  main()
