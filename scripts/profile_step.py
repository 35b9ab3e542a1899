"""Breakdown timing of the Airbot cube-push physics step on the current
accelerator.  Times each pipeline stage separately (jitted, batched over
num_envs) to locate the throughput bottleneck (VERDICT round-1 item 1a).

Usage: python scripts/profile_step.py [num_envs]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(name, fn, *args, n=20):
  out = fn(*args)
  jax.block_until_ready(out)
  t0 = time.time()
  for _ in range(n):
    out = fn(*args)
  jax.block_until_ready(out)
  dt = (time.time() - t0) / n
  print(f'{name:28s} {dt * 1e3:10.3f} ms')
  return dt


def main():
  num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

  import importlib

  from rsr_mjx_tpu import envs
  from rsr_mjx_tpu.physics import collision as _collision
  from rsr_mjx_tpu.physics import constraint as _constraint

  # the package re-exports the forward() function under the same name as
  # the module, so import the module explicitly
  _forward = importlib.import_module('rsr_mjx_tpu.physics.forward')
  from rsr_mjx_tpu.physics import kinematics as _kin
  from rsr_mjx_tpu.physics import smooth as _smooth
  from rsr_mjx_tpu.physics import solver as _solver

  env = envs.load('AirbotCubePush', max_contacts=32)
  m = env.model
  lay = _constraint.layout_cached(m)
  print(f'nv={m.nv} ncon={m.ncon} ncon_sel={getattr(m, "ncon_sel", 0)} '
        f'nefc={lay.nefc} iters={m.opt.iterations} ls={m.opt.ls_iterations}')

  rng = jax.random.split(jax.random.PRNGKey(0), num_envs)
  state = jax.jit(jax.vmap(env.reset))(rng)
  d = state.data
  jax.block_until_ready(d.qpos)
  print(f'num_envs={num_envs}')

  # full env control step (4 substeps + reward/obs)
  act = jnp.zeros((num_envs, env.action_size))
  step_env = jax.jit(jax.vmap(env.step))
  t_env = bench('env.step (4 substeps)', step_env, state, act)

  # one physics step
  phys = jax.jit(jax.vmap(lambda dd: _forward.step(m, dd)))
  t_phys = bench('physics step x1', phys, d)

  # forward position only
  fwd_pos = jax.jit(jax.vmap(lambda dd: _forward.fwd_position(m, dd)))
  d2 = fwd_pos(d)
  bench('fwd_position (kin+crb+col)', fwd_pos, d)

  kin = jax.jit(jax.vmap(lambda dd: _kin.com_vel(m, _kin.kinematics(m, dd))))
  bench('kinematics+com_vel', kin, d)

  crb = jax.jit(jax.vmap(lambda dd: _smooth.crb(m, dd)))
  bench('crb', crb, d2)

  col = jax.jit(jax.vmap(lambda dd: _collision.collision(m, dd)))
  bench('collision (narrow)', col, d2)

  # velocity/actuation stages
  def vel_stage(dd):
    dd = _smooth.rne(m, dd)
    dd = _smooth.passive(m, dd)
    dd = _smooth.actuation(m, dd)
    return _smooth.fwd_velocity(m, dd)

  velf = jax.jit(jax.vmap(vel_stage))
  d3 = velf(d2)
  bench('rne+passive+act+fwdvel', velf, d2)

  # constraint assembly
  asm = jax.jit(jax.vmap(lambda dd: _constraint.make_constraints(m, dd).J))
  bench('constraint assembly', asm, d3)

  # Newton solve
  def solve_only(dd):
    efc = _constraint.make_constraints(m, dd)
    return _solver.solve(m, dd, efc).qacc

  sol = jax.jit(jax.vmap(solve_only))
  t_sol = bench('assembly+newton solve', sol, d3)

  # integrate
  integ = jax.jit(jax.vmap(lambda dd: _forward.integrate(m, dd).qpos))
  d4 = jax.jit(jax.vmap(lambda dd: _forward.forward(m, dd)))(d3)
  bench('integrate (incl implicit)', integ, d4)

  print()
  print(f'env-steps/s at {num_envs} envs: {num_envs / t_env:,.0f}')
  print(f'physics substep share: {4 * t_phys / t_env:.2f}')
  print(f'solver share of substep: {t_sol / t_phys:.2f}')


if __name__ == '__main__':
  main()
