"""Fixed-seed golden regression tests for env semantics.

The reference has no test suite (SURVEY §4); these goldens pin OUR env
semantics so future engine/env changes that silently alter trajectories
fail loudly.  Regenerate with REGEN=1 python -m pytest tests/test_env_golden.py
after an intentional semantic change.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsr_mjx_tpu import envs

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), 'goldens')
REGEN = os.environ.get('REGEN', '0') == '1'

CASES = [
    ('AirbotCubePush', 5, 100),
    ('AirbotTPush', 5, 100),
    ('Go2JoystickFlatTerrain', 12, 100),
    # rough terrain runs on the reference's own heightfield elevations
    # (bundled hfield.png data — envs/go2/scene.py:reference_heightfield)
    ('Go2JoystickRoughTerrain', 12, 100),
    ('Go2Getup', 12, 100),
    ('Go2Handstand', 12, 100),
]


def _rollout(name, act_dim, steps):
  env = envs.load(name)
  state = jax.jit(env.reset)(jax.random.PRNGKey(42))

  def body(carry, key):
    state = carry
    act = jax.random.uniform(key, (act_dim,), minval=-0.3, maxval=0.3)
    state = env.step(state, act)
    obs = state.obs['state'] if isinstance(state.obs, dict) else state.obs
    return state, (obs, state.reward)

  keys = jax.random.split(jax.random.PRNGKey(7), steps)
  _, (obs, rew) = jax.jit(
      lambda s, k: jax.lax.scan(body, s, k)
  )(state, keys)
  return np.asarray(obs), np.asarray(rew)


@pytest.mark.parametrize('name,act_dim,steps', CASES,
                         ids=[c[0] for c in CASES])
def test_golden_trajectory(name, act_dim, steps):
  obs, rew = _rollout(name, act_dim, steps)
  path = os.path.join(GOLDEN_DIR, f'{name}.npz')
  if REGEN or not os.path.exists(path):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    np.savez(path, obs=obs, rew=rew)
    if not REGEN:
      pytest.skip('golden created; rerun to compare')
  golden = np.load(path)
  np.testing.assert_allclose(obs, golden['obs'], rtol=2e-4, atol=2e-5)
  np.testing.assert_allclose(rew, golden['rew'], rtol=2e-4, atol=2e-5)
