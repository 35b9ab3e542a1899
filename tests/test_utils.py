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
