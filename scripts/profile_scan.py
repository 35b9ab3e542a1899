"""Scan-based stage profiler for the physics step (trustworthy on remote
TPU tunnels).

Per-call dispatch on a tunneled TPU can cost ~30 ms once any large program
has run in the process, which silently dominates naive per-stage timing
(measured: the same batched box_box narrow-phase reads 0.05 ms in a fresh
process and 30 ms after one jitted env.reset).  This profiler instead scans
each stage K times inside ONE jitted program and divides, so dispatch
overhead amortizes away and numbers reflect on-device cost.

To defeat loop-invariant hoisting / CSE of the stage body, EVERY float
leaf of Data is perturbed by an iteration-dependent epsilon each scan step
(round 2 perturbed only qpos, which let XLA hoist any stage that reads
geom_xpos/xpos/cdof instead — under-reporting collision 8x).  The cost of
the perturbation pass itself is measured via a no-op stage and subtracted.

Usage: python scripts/profile_scan.py [num_envs] [K]
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
  from rsr_mjx_tpu.physics import collision as _collision
  from rsr_mjx_tpu.physics import constraint as _constraint
  from rsr_mjx_tpu.physics import kinematics as _kin
  from rsr_mjx_tpu.physics import smooth as _smooth
  from rsr_mjx_tpu.physics import solver as _solver

  _forward = importlib.import_module('rsr_mjx_tpu.physics.forward')

  env = envs.load('AirbotCubePush', max_contacts=32)
  m = env.model
  lay = _constraint.layout_cached(m)
  print(
      f'nv={m.nv} ncon={m.ncon} ncon_sel={getattr(m, "ncon_sel", 0)} '
      f'nefc={lay.nefc} iters={m.opt.iterations} ls={m.opt.ls_iterations} '
      f'num_envs={num_envs} K={K}'
  )

  rng = jax.random.split(jax.random.PRNGKey(0), num_envs)
  state = jax.jit(jax.vmap(env.reset))(rng)
  d0 = state.data
  jax.block_until_ready(d0.qpos)

  def jiggle(d, i):
    """Perturb every float leaf so no stage input is loop-invariant."""
    eps = 1e-12 * i

    def f(x):
      if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating):
        return x + jnp.asarray(eps, dtype=x.dtype)
      return x

    return jax.tree.map(f, d)

  def scan_stage(stage):
    def body(carry, i):
      d = jiggle(carry, i)
      d = jax.vmap(stage)(d)
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

  # prepared inputs for later stages
  fwd_pos = jax.jit(jax.vmap(lambda dd: _forward.fwd_position(m, dd)))
  d_pos = fwd_pos(d0)

  def vel_stage(dd):
    dd = _smooth.rne(m, dd)
    dd = _smooth.passive(m, dd)
    dd = _smooth.actuation(m, dd)
    return _smooth.fwd_velocity(m, dd)

  d_vel = jax.jit(jax.vmap(vel_stage))(d_pos)
  d_fwd = jax.jit(jax.vmap(lambda dd: _forward.forward(m, dd)))(d0)
  jax.block_until_ready(d_fwd.qacc)

  # perturbation-only baseline (subtracted from every stage)
  t_base = bench('jiggle only (baseline)', lambda dd: dd, d_fwd)

  t_total = bench('physics step', lambda dd: _forward.step(m, dd), d0,
                  base=t_base)
  stages = [
      bench('kinematics', lambda dd: _kin.kinematics(m, dd), d0, base=t_base),
      bench('com_vel', lambda dd: _kin.com_vel(m, dd), d_pos, base=t_base),
      bench('crb', lambda dd: _smooth.crb(m, dd), d_pos, base=t_base),
      bench('collision', lambda dd: _collision.collision(m, dd), d_pos,
            base=t_base),
      bench('rne+passive+act+fwdvel', vel_stage, d_pos, base=t_base),
      bench(
          'assembly+newton',
          lambda dd: _solver.solve(m, dd, _constraint.make_constraints(m, dd)),
          d_vel,
          base=t_base,
      ),
  ]

  # split: assembly alone (efc folded into qacc so it is not dead code) and
  # newton alone (efc fixed from d_vel; M/a0/warm-start still jiggled)
  def asm_only(dd):
    efc = _constraint.make_constraints(m, dd)
    probe = (
        jnp.sum(efc.J) + jnp.sum(efc.aref) + jnp.sum(efc.D)
        + jnp.sum(efc.floss)
    )
    return dd.replace(qacc=dd.qacc + 0.0 * probe)

  t_asm = bench('  assembly only', asm_only, d_vel, base=t_base)
  del t_asm  # newton-only ≈ (assembly+newton) − (assembly only)
  stages += [
      bench('integrate', lambda dd: _forward.integrate(m, dd), d_fwd,
            base=t_base),
  ]
  print(f'{"stage sum":34s} {sum(stages) * 1e3:9.3f} ms/iter '
        f'({sum(stages) / max(t_total, 1e-12):.0%} of whole step)')

  # full env step (4 substeps + reward/obs), scanned at env level
  def env_body(carry, i):
    s = carry
    act = jnp.sin(jnp.ones((num_envs, env.action_size)) * i)
    s = jax.vmap(env.step)(s, act)
    return s, ()

  def env_run(s):
    s, _ = jax.lax.scan(env_body, s, jnp.arange(K, dtype=jnp.float32))
    return s

  env_fn = jax.jit(env_run)
  out = env_fn(state)
  jax.block_until_ready(out.data.qpos)
  t0 = time.time()
  for _ in range(2):
    out = env_fn(state)
  jax.block_until_ready(out.data.qpos)
  t_env = (time.time() - t0) / (2 * K)
  print(f'{"env.step (4 substeps+obs)":34s} {t_env * 1e3:9.3f} ms/iter')
  print()
  print(f'env-steps/s at {num_envs} envs: {num_envs / t_env:,.0f}')
  print(f'physics substep share: {4 * t_total / t_env:.2f}')


if __name__ == '__main__':
  main()
