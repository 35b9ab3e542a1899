"""End-to-end parity of the fused assembly+solve path (round-4).

The fused path (solver.solve_fused) must step identically to the explicit
make_constraints → solve chain, and the interpret-mode Pallas lanes route
(the exact code the TPU runs) must agree with the XLA fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsr_mjx_tpu import envs
from rsr_mjx_tpu import physics
from rsr_mjx_tpu.physics import constraint as C
from rsr_mjx_tpu.physics import solver as S
from rsr_mjx_tpu.physics import linalg_kernels as lk


def _contact_rich_batch(env, n=4, steps=30):
  def drive(key):
    state = env.reset(key)

    def body(state, _):
      obs = state.obs
      act = jnp.concatenate([jnp.clip(obs[-3:] / 0.02, -1, 1), jnp.zeros(2)])
      return env.step(state, act), ()

    state, _ = jax.lax.scan(body, state, (), length=steps)
    return state.data

  keys = jax.random.split(jax.random.PRNGKey(0), n)
  return jax.jit(jax.vmap(drive))(keys)


def test_fused_step_matches_reference_chain():
  env = envs.load('AirbotCubePush')
  m = env.model
  dB = _contact_rich_batch(env)

  import importlib
  F = importlib.import_module('rsr_mjx_tpu.physics.forward')

  def step_ref(d):
    # the pre-fusion forward: explicit assembly then solve
    with jax.default_matmul_precision('highest'):
      d = F.fwd_position(m, d)
      from rsr_mjx_tpu.physics import smooth as _smooth
      d = _smooth.rne(m, d)
      d = _smooth.passive(m, d)
      d = _smooth.actuation(m, d)
      d = _smooth.fwd_velocity(m, d)
      efc = C.make_constraints(m, d)
      d = S.solve(m, d, efc)
    return d

  def step_fused(d):
    with jax.default_matmul_precision('highest'):
      d = F.fwd_position(m, d)
      from rsr_mjx_tpu.physics import smooth as _smooth
      d = _smooth.rne(m, d)
      d = _smooth.passive(m, d)
      d = _smooth.actuation(m, d)
      d = _smooth.fwd_velocity(m, d)
      d = S.solve_fused(m, d)
    return d

  out_ref = jax.jit(jax.vmap(step_ref))(dB)
  out_fused = jax.jit(jax.vmap(step_fused))(dB)
  np.testing.assert_allclose(
      np.asarray(out_fused.qacc), np.asarray(out_ref.qacc),
      rtol=1e-4, atol=1e-4,
  )
  np.testing.assert_allclose(
      np.asarray(out_fused.qfrc_constraint),
      np.asarray(out_ref.qfrc_constraint), rtol=1e-4, atol=1e-3,
  )


def test_fused_lanes_kernel_interpret_matches_xla(monkeypatch):
  """Force the lanes assembly + Pallas kernel route (interpret mode on
  CPU) and compare against the pure-XLA vmap fallback — this exercises the
  exact code path the TPU training stack runs."""
  env = envs.load('AirbotCubePush')
  m = env.model
  dB = _contact_rich_batch(env)

  step = lambda d: physics.step(m, d)
  out_xla = jax.jit(jax.vmap(step))(dB)

  monkeypatch.setattr(lk, '_INTERPRET', True)
  S._FUSED_CACHE.clear()  # rebuild so the kernel branch is taken
  out_lanes = jax.jit(jax.vmap(step))(dB)
  monkeypatch.undo()
  S._FUSED_CACHE.clear()

  np.testing.assert_allclose(
      np.asarray(out_lanes.qacc), np.asarray(out_xla.qacc),
      rtol=5e-3, atol=5e-3,
  )
  np.testing.assert_allclose(
      np.asarray(out_lanes.qpos), np.asarray(out_xla.qpos),
      rtol=1e-5, atol=1e-5,
  )
