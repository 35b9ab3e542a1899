"""AirbotCubePush env contract tests: shapes, determinism, wrappers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsr_mjx_tpu import envs
from rsr_mjx_tpu.envs import wrappers


@pytest.fixture(scope='module')
def env():
  return envs.load('AirbotCubePush')


def test_reset_step_shapes(env):
  state = jax.jit(env.reset)(jax.random.PRNGKey(0))
  assert state.obs.shape == (23,)
  assert env.action_size == 5
  assert env.observation_size == 23
  nstate = jax.jit(env.step)(state, jnp.zeros(5))
  assert nstate.obs.shape == (23,)
  assert np.isfinite(np.asarray(nstate.obs)).all()
  assert np.isfinite(float(nstate.reward))
  # physics advanced
  assert float(nstate.data.time) > 0


def test_reset_determinism_and_spawn_ranges(env):
  s1 = jax.jit(env.reset)(jax.random.PRNGKey(7))
  s2 = jax.jit(env.reset)(jax.random.PRNGKey(7))
  np.testing.assert_array_equal(np.asarray(s1.obs), np.asarray(s2.obs))
  s3 = jax.jit(env.reset)(jax.random.PRNGKey(8))
  assert np.abs(np.asarray(s1.obs) - np.asarray(s3.obs)).max() > 0
  # cube spawn inside the configured box (test/airbot.py:32-39)
  cube = np.asarray(s1.info['cube_pos'])
  assert 0.27 < cube[0] < 0.30 and -0.02 < cube[1] < 0.02
  target = np.asarray(s1.info['target_pos'])
  assert 0.49 < target[0] < 0.52


def test_rollout_stable(env):
  """Random actions for 20 control steps: finite obs, cube stays on table."""
  state = jax.jit(env.reset)(jax.random.PRNGKey(0))
  step = jax.jit(env.step)
  rng = jax.random.PRNGKey(1)
  for _ in range(20):
    rng, sub = jax.random.split(rng)
    act = jax.random.uniform(sub, (5,), minval=-1, maxval=1)
    state = step(state, act)
  assert np.isfinite(np.asarray(state.obs)).all()
  cube_z = float(state.info['cube_pos'][2])
  assert 0.7 < cube_z < 0.95, cube_z


def test_wrapped_training_stack(env):
  wrapped = wrappers.wrap_for_training(env, episode_length=5, num_envs=4)
  rng = jax.random.split(jax.random.PRNGKey(0), 4)
  state = jax.jit(wrapped.reset)(rng)
  assert state.obs.shape == (4, 23)
  step = jax.jit(wrapped.step)
  for _ in range(5):
    state = step(state, jnp.zeros((4, 5)))
  # episode length reached → all done with truncation flag
  assert np.all(np.asarray(state.done) == 1.0)
  assert np.all(np.asarray(state.info['truncation']) == 1.0)
  # next step auto-resets (done cleared, steps reset)
  state = step(state, jnp.zeros((4, 5)))
  assert np.all(np.asarray(state.info['steps']) == 1.0)
