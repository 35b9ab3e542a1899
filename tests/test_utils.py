"""Utility tests: tolerance sigmoids, gait profile."""

import numpy as np
import jax.numpy as jnp

from rsr_mjx_tpu.utils import gait, reward


def test_tolerance_bounds_and_margins():
  assert float(reward.tolerance(jnp.asarray(0.5), (0.0, 1.0))) == 1.0
  assert float(reward.tolerance(jnp.asarray(1.5), (0.0, 1.0))) == 0.0
  # with margin, value at distance == margin equals value_at_margin
  v = reward.tolerance(
      jnp.asarray(2.0), (0.0, 1.0), margin=1.0, value_at_margin=0.25
  )
  np.testing.assert_allclose(float(v), 0.25, rtol=1e-6)
  for sig in ('gaussian', 'hyperbolic', 'long_tail', 'reciprocal',
              'cosine', 'linear', 'quadratic', 'tanh_squared'):
    out = reward.tolerance(
        jnp.linspace(-2, 2, 5), (0.0, 0.5), margin=0.7, sigmoid=sig,
        value_at_margin=0.3,
    )
    assert np.all(np.asarray(out) >= 0) and np.all(np.asarray(out) <= 1)


def test_gait_rz():
  # stance phase (phi = -pi → x=0) at ground, peak mid-swing
  assert abs(float(gait.get_rz(-np.pi, 0.08))) < 1e-6
  assert float(gait.get_rz(0.0, 0.08)) > 0.07
  assert len(gait.GAIT_PHASES) == 5


def test_draw_joystick_command():
  """Arrow decoration adds one DECOR geom pointing along the rotated
  command (reference capability: gait.py:30-67)."""
  import mujoco

  mjm = mujoco.MjModel.from_xml_string(
      '<mujoco><worldbody><geom type="sphere" size="0.1"/></worldbody>'
      '</mujoco>'
  )
  scn = mujoco.MjvScene(mjm, maxgeom=8)
  n0 = scn.ngeom
  # command straight ahead, heading +90deg → arrow along +y
  gait.draw_joystick_command(
      scn, cmd=(1.0, 0.0, 0.0), xyz=(0.0, 0.0, 0.3), theta=np.pi / 2
  )
  assert scn.ngeom == n0 + 1
  g = scn.geoms[n0]
  assert g.category == mujoco.mjtCatBit.mjCAT_DECOR
  assert g.type == mujoco.mjtGeom.mjGEOM_ARROW.value
  # arrow anchored at `from`, local z-axis along +y (heading 90°), unit len
  np.testing.assert_allclose(g.pos, [0.0, 0.0, 0.3], atol=1e-8)
  np.testing.assert_allclose(g.mat.reshape(3, 3)[:, 2], [0, 1, 0], atol=1e-6)
  assert abs(g.size[2] - 1.0) < 1e-3
