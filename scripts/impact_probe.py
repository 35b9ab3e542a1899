"""Impact convergence probe for the fused Newton kernel.

Servo-slams the end-effector into the cube (the regime where the warm
start is maximally wrong) for 3 seeds x 100 control steps and compares
the max cube speed produced by the TPU kernel path against the adaptive
20-iteration XLA path.  An under-converged solver injects energy and
launches the cube (round-2's iterations=4 bug hit 2.5 m/s vs 0.049 m/s
converged) — this probe is the acceptance test for any change to the
kernel's iteration schedule (count, line-search budget, quasi-Newton
pattern).

Usage: python scripts/impact_probe.py   (on the TPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rsr_mjx_tpu import envs
from rsr_mjx_tpu.physics import linalg_kernels as lk
from rsr_mjx_tpu.physics import solver as solver_mod


def max_cube_speed(env, seeds=(0, 1, 2), steps=100):
  m = env.model
  cube_dof = None
  # cube free joint dof address: find from model (6-dof free joint of
  # cube_for_push)
  from rsr_mjx_tpu.physics.io import name2id

  body = name2id(m, 'body', 'cube_for_push')
  jadr = int(m.body_jntadr.arr[body])
  vadr = int(m.jnt_dofadr.arr[jadr])

  @jax.jit
  def run(key):
    state = env.reset(key)

    def body_fn(carry, _):
      s = carry
      obs = s.obs
      # slam: drive end-effector hard toward the cube
      act = jnp.concatenate(
          [jnp.clip(obs[-3:] / 0.005, -1, 1), jnp.zeros(2)]
      )
      ns = env.step(s, act)
      speed = jnp.linalg.norm(ns.data.qvel[vadr : vadr + 3])
      return ns, speed

    _, speeds = jax.lax.scan(body_fn, state, (), length=steps)
    return jnp.max(speeds)

  return max(
      float(run(jax.random.PRNGKey(s))) for s in seeds
  )


def main():
  env = envs.load('AirbotCubePush')

  # batched (kernel path engages under vmap on TPU)
  envs_b = envs.load('AirbotCubePush')

  def batched_speed():
    m = envs_b.model
    from rsr_mjx_tpu.physics.io import name2id

    body = name2id(m, 'body', 'cube_for_push')
    jadr = int(m.body_jntadr.arr[body])
    vadr = int(m.jnt_dofadr.arr[jadr])

    @jax.jit
    def run(keys):
      state = jax.vmap(envs_b.reset)(keys)

      def body_fn(carry, _):
        s = carry
        act = jnp.concatenate(
            [jnp.clip(s.obs[:, -3:] / 0.005, -1, 1),
             jnp.zeros((s.obs.shape[0], 2))], axis=1
        )
        ns = jax.vmap(envs_b.step)(s, act)
        speed = jnp.linalg.norm(
            ns.data.qvel[:, vadr : vadr + 3], axis=-1
        )
        return ns, speed

      _, speeds = jax.lax.scan(body_fn, state, (), length=100)
      return jnp.max(speeds)

    return float(run(jax.random.split(jax.random.PRNGKey(0), 8)))

  v_kernel = batched_speed()
  print(f'kernel path   max cube speed: {v_kernel:.4f} m/s', flush=True)

  # XLA adaptive path (20 iterations, tolerance exit)
  import unittest.mock as mock

  with mock.patch.object(lk, '_use_tpu_kernels', lambda: False):
    solver_mod._FUSED_CACHE.clear()
    v_xla = batched_speed()
    solver_mod._FUSED_CACHE.clear()
  print(f'XLA adaptive  max cube speed: {v_xla:.4f} m/s', flush=True)

  ratio = v_kernel / max(v_xla, 1e-9)
  print(f'ratio {ratio:.3f}', flush=True)
  if v_kernel > 2.0 * v_xla + 0.05:
    print('FAIL: kernel under-converges at impacts (energy injection)')
    sys.exit(1)
  print('PASS')


if __name__ == '__main__':
  main()
