"""Scan-based stage timing of the round-5 fused physics step
(kinematics / smooth_fused / solve_fused / sensors / integrate), batched.
Same measurement discipline as profile_scan.py: each stage runs K times
inside one jitted lax.scan with every float Data leaf perturbed per
iteration, and the perturbation pass is measured and subtracted.

Usage: python scripts/profile_fused.py [num_envs] [K]
"""

import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
  num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
  K = int(sys.argv[2]) if len(sys.argv) > 2 else 20

  from rsr_mjx_tpu import envs
  from rsr_mjx_tpu.physics import kinematics as _kin
  from rsr_mjx_tpu.physics import lanes_smooth as _ls
  from rsr_mjx_tpu.physics import sensors as _sensors
  from rsr_mjx_tpu.physics import solver as _solver

  _forward = importlib.import_module('rsr_mjx_tpu.physics.forward')

  env = envs.load('AirbotCubePush', max_contacts=24)
  m = env.model

  rng = jax.random.split(jax.random.PRNGKey(0), num_envs)
  state = jax.jit(jax.vmap(env.reset))(rng)
  d0 = state.data
  jax.block_until_ready(d0.qpos)
  print(f'num_envs={num_envs} K={K} nv={m.nv}')

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
      d = stage(d)
      return d, ()

    def run(d):
      d, _ = jax.lax.scan(body, d, jnp.arange(K, dtype=d.qpos.dtype))
      return d

    return jax.jit(run)

  def bench(name, stage, d_in, n=2, base=0.0):
    fn = scan_stage(stage)
    out = fn(d_in)
    jax.block_until_ready(out.qpos)
    t0 = time.time()
    for _ in range(n):
      out = fn(d_in)
    jax.block_until_ready(out.qpos)
    dt = (time.time() - t0) / (n * K) - base
    print(f'{name:34s} {dt * 1e3:9.3f} ms/iter', flush=True)
    return dt

  with jax.default_matmul_precision('highest'):
    kin = jax.jit(jax.vmap(lambda dd: _kin.kinematics(m, dd)))
    d1 = kin(d0)
    sm = jax.jit(jax.vmap(lambda dd: _ls.smooth_fused(m, dd)))
    d2 = sm(d1)
    sv = jax.jit(jax.vmap(lambda dd: _solver.solve_fused(m, dd)))
    d3 = sv(d2)
    jax.block_until_ready(d3.qacc)

  def P(f):
    """Match the real pipeline's matmul precision (forward.py sets it)."""

    def g(dd):
      with jax.default_matmul_precision('highest'):
        return jax.vmap(f)(dd)

    return g

  t_base = bench('jiggle only (baseline)', lambda dd: dd, d3)
  t_total = bench(
      'physics step', P(lambda dd: _forward.step(m, dd)), d0, base=t_base)
  stages = [
      bench('kinematics',
            P(lambda dd: _kin.kinematics(m, dd)), d0, base=t_base),
      bench('smooth_fused',
            P(lambda dd: _ls.smooth_fused(m, dd)), d1, base=t_base),
      bench('solve_fused',
            P(lambda dd: _solver.solve_fused(m, dd)), d2, base=t_base),
      bench('sensors',
            P(lambda dd: _sensors.sensordata(m, dd)), d3, base=t_base),
      bench('integrate',
            P(lambda dd: _forward.integrate(m, dd)), d3, base=t_base),
  ]
  print(f'{"stage sum":34s} {sum(stages) * 1e3:9.3f} ms/iter '
        f'({sum(stages) / max(t_total, 1e-12):.0%} of whole step)')


if __name__ == '__main__':
  main()
