"""Parity of the merged fused forward region (physics/fwd_fused.py).

``physics.step`` routes through ONE fused region (smooth + narrow phase +
assembly + Newton + implicit-damping solve) when the model admits it; it
must step identically to the explicit forward() + integrate() chain on
every Data field, for both the per-env base path and the interpret-mode
lanes route (the exact code the TPU runs), and stay differentiable for
``env_params_tuning`` (reference RSR/rsr_pipeline.py:125-174).
"""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsr_mjx_tpu import envs, physics
from rsr_mjx_tpu.physics import linalg_kernels as lk

F = importlib.import_module('rsr_mjx_tpu.physics.forward')
FF = importlib.import_module('rsr_mjx_tpu.physics.fwd_fused')

_FIELDS = (
    'qpos', 'qvel', 'qacc', 'qM', 'cvel', 'qfrc_bias', 'qfrc_passive',
    'actuator_force', 'qfrc_actuator', 'qfrc_smooth', 'qacc_smooth',
    'qfrc_constraint', 'efc_force', 'sensordata',
)


def _perturbed_batch(m, B, key):
  d0 = F.make_data(m)
  ks = jax.random.split(key, 3)
  qpos = jnp.tile(d0.qpos[None], (B, 1)) + 0.01 * jax.random.normal(
      ks[0], (B, m.nq)
  )
  qvel = 0.1 * jax.random.normal(ks[1], (B, m.nv))
  ctrl = 0.2 * jax.random.normal(ks[2], (B, m.nu))
  return jax.vmap(lambda q, v, c: d0.replace(qpos=q, qvel=v, ctrl=c))(
      qpos, qvel, ctrl
  )


def _legacy_step(m, d):
  d = F.forward(m, d)
  with jax.default_matmul_precision('highest'):
    return F.integrate(m, d)


@pytest.mark.parametrize('env_name', ['AirbotCubePush', 'Go2Getup'])
def test_fused_step_matches_legacy_chain(env_name):
  env = envs.load(env_name)
  m = env.model
  assert FF.supported(m)
  dB = _perturbed_batch(m, 2, jax.random.PRNGKey(0))

  o_old = jax.jit(jax.vmap(lambda d: _legacy_step(m, d)))(dB)
  o_new = jax.jit(jax.vmap(lambda d: physics.step(m, d)))(dB)
  for f in _FIELDS:
    a, b = getattr(o_old, f), getattr(o_new, f)
    if a.size:
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6, err_msg=f
      )
  np.testing.assert_allclose(
      np.asarray(o_old.contact.dist), np.asarray(o_new.contact.dist),
      rtol=1e-6, atol=1e-6,
  )

  # unbatched base path
  d1 = jax.tree.map(lambda x: x[0], dB)
  o1_old = jax.jit(lambda d: _legacy_step(m, d))(d1)
  o1_new = jax.jit(lambda d: physics.step(m, d))(d1)
  np.testing.assert_allclose(
      np.asarray(o1_old.qacc), np.asarray(o1_new.qacc), rtol=1e-6, atol=1e-6
  )
  np.testing.assert_allclose(
      np.asarray(o1_old.qvel), np.asarray(o1_new.qvel), rtol=1e-6, atol=1e-6
  )


def test_fused_step_lanes_route_matches_legacy_lanes(monkeypatch):
  """Interpret-mode Pallas lanes route of the MERGED region vs the legacy
  two-region lanes path (batch-major kinematics + smooth_fused +
  solve_fused + batch-major implicit solve).  Both run the identical
  6-iteration kernel; the lanes kinematics/implicit-diagonal reorder
  individual multiplies, so compare at float-reordering precision
  (amplified through the Newton/implicit solves for qacc)."""
  env = envs.load('AirbotCubePush')
  m = env.model
  dB = _perturbed_batch(m, 2, jax.random.PRNGKey(1))
  monkeypatch.setattr(lk, '_INTERPRET', True)
  FF._CACHE.clear()
  o_old = jax.jit(jax.vmap(lambda d: _legacy_step(m, d)))(dB)
  o_new = jax.jit(jax.vmap(lambda d: physics.step(m, d)))(dB)
  FF._CACHE.clear()
  for f in ('xpos', 'xquat', 'geom_xpos', 'site_xpos', 'cdof', 'qM', 'cvel',
            'qacc_smooth', 'qfrc_smooth'):
    np.testing.assert_allclose(
        np.asarray(getattr(o_old, f)), np.asarray(getattr(o_new, f)),
        rtol=1e-4, atol=1e-5, err_msg=f,
    )
  for f in ('qpos', 'qvel', 'qacc'):
    np.testing.assert_allclose(
        np.asarray(getattr(o_old, f)), np.asarray(getattr(o_new, f)),
        rtol=1e-2, atol=1e-2, err_msg=f,
    )


def test_fused_step_differentiable():
  """grad d(step loss)/d(friction) flows through the merged region and
  matches the legacy chain (env_params_tuning property)."""
  env = envs.load('AirbotCubePush')
  m = env.model
  d1 = jax.tree.map(lambda x: x[0], _perturbed_batch(m, 1, jax.random.PRNGKey(2)))

  def loss(fric, stepper):
    m2 = m.replace(geom_friction=m.geom_friction.at[:, 0].set(fric))
    dn = stepper(m2, d1)
    return jnp.sum(dn.qvel**2) + jnp.sum(dn.qpos**2)

  g_new = jax.grad(loss)(jnp.float32(0.8), physics.step)
  g_old = jax.grad(loss)(jnp.float32(0.8), _legacy_step)
  assert np.isfinite(float(g_new))
  np.testing.assert_allclose(float(g_new), float(g_old), rtol=1e-4)
