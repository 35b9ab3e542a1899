"""AirbotTPush env contract tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsr_mjx_tpu import envs


@pytest.fixture(scope='module')
def env():
  return envs.load('AirbotTPush')


def test_reset_step_shapes(env):
  state = jax.jit(env.reset)(jax.random.PRNGKey(0))
  assert state.obs.shape == (16,)
  assert env.action_size == 5
  assert env.observation_size == 16
  nstate = jax.jit(env.step)(state, jnp.zeros(5))
  assert np.isfinite(np.asarray(nstate.obs)).all()
  assert np.isfinite(float(nstate.reward))


def test_rollout_stable(env):
  state = jax.jit(env.reset)(jax.random.PRNGKey(3))
  step = jax.jit(env.step)
  rng = jax.random.PRNGKey(1)
  for _ in range(10):
    rng, sub = jax.random.split(rng)
    act = jax.random.uniform(sub, (5,), minval=-1, maxval=1)
    state = step(state, act)
  assert np.isfinite(np.asarray(state.obs)).all()
  # T block stays on the table
  t_z = float(state.info['T_pos'][2])
  assert 0.7 < t_z < 0.95, t_z
  # orientation angle finite and in [0, pi]
  assert 0.0 <= float(state.info['xita']) <= np.pi
