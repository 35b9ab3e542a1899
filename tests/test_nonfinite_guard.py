"""NaN quarantine tests (round-4 containment).

The reference never needed this machinery (f64 CUDA MJX; MuJoCo C has
mjWARN_BADQACC auto-reset) — on TPU f32 a ~1e-5/env-step solver divergence
under deep contact would otherwise poison the pmean'd gradient within one
epoch (round-3 VERDICT weak #2).  These tests drive a toy env that injects
non-finite / exploding state on demand and assert:

  - NonFiniteGuardWrapper trips: done=1, reward zeroed, state sanitized,
    ``nonfinite`` metric set, truncation NOT set (termination semantics);
  - AutoReset above the guard restores the cached first state, so the
    post-blow-up transition is finite end to end;
  - Evaluator.run_evaluation never averages NaN into the headline metric
    and reports eval/nan_episodes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rsr_mjx_tpu.envs import wrappers
from rsr_mjx_tpu.envs.core import Env, State
from rsr_mjx_tpu.train import acting


@struct.dataclass
class _FakeData:
  qpos: jax.Array
  qvel: jax.Array


class _ToyEnv(Env):
  """1-dof integrator; action > 0.5 injects |qvel| = 1e6, action < -0.5
  injects NaN qpos."""

  @property
  def model(self):
    return None

  @property
  def action_size(self):
    return 1

  @property
  def ctrl_dt(self):
    return 0.02

  @property
  def sim_dt(self):
    return 0.02

  def reset(self, rng: jax.Array) -> State:
    qpos = jax.random.uniform(rng, (1,))
    data = _FakeData(qpos=qpos, qvel=jnp.zeros(1))
    return State(
        data=data,
        obs=qpos,
        reward=jnp.zeros(()),
        done=jnp.zeros(()),
        metrics={'score': jnp.zeros(())},
        info={},
    )

  def step(self, state: State, action: jax.Array) -> State:
    a = action[0]
    qvel = jnp.where(a > 0.5, 1e6, 1.0) * jnp.ones(1)
    qpos = state.data.qpos + 0.02 * qvel
    qpos = jnp.where(a < -0.5, jnp.nan * qpos, qpos)
    data = _FakeData(qpos=qpos, qvel=qvel)
    # update metrics in place (real envs keep the dict structure stable)
    metrics = dict(state.metrics)
    metrics['score'] = jnp.ones(())
    return state.replace(
        data=data,
        obs=qpos,
        reward=jnp.ones(()) + 0.0 * qpos[0],
        done=jnp.zeros(()),
        metrics=metrics,
    )


def _make(batch=4, episode_length=10):
  env = wrappers.wrap_for_training(_ToyEnv(), episode_length=episode_length)
  return env


def _reset(env, key, batch=4):
  return env.reset(jax.random.split(key, batch))


def test_guard_passthrough_when_finite():
  env = _make()
  state = _reset(env, jax.random.PRNGKey(0))
  state = env.step(state, jnp.zeros((4, 1)))
  assert np.all(np.asarray(state.metrics['nonfinite']) == 0)
  np.testing.assert_allclose(np.asarray(state.reward), 1.0)
  assert np.all(np.asarray(state.done) == 0)


def test_guard_quarantines_exploding_qvel():
  env = _make()
  state = _reset(env, jax.random.PRNGKey(0))
  first_obs = np.asarray(state.obs)
  # env 1 explodes, others fine
  action = jnp.zeros((4, 1)).at[1, 0].set(1.0)
  nstate = env.step(state, action)
  nonfinite = np.asarray(nstate.metrics['nonfinite'])
  assert nonfinite[1] == 1 and np.all(nonfinite[[0, 2, 3]] == 0)
  # blown env: done, zero reward, NOT a truncation
  assert np.asarray(nstate.done)[1] == 1
  assert np.asarray(nstate.reward)[1] == 0
  assert np.asarray(nstate.info['truncation'])[1] == 0
  # AutoReset restored the cached first state for env 1 only
  np.testing.assert_allclose(np.asarray(nstate.obs)[1], first_obs[1])
  assert np.all(np.isfinite(np.asarray(nstate.data.qvel)))
  # healthy envs unaffected
  np.testing.assert_allclose(np.asarray(nstate.reward)[[0, 2, 3]], 1.0)


def test_guard_quarantines_nan_and_recovers():
  env = _make()
  state = _reset(env, jax.random.PRNGKey(1))
  action = jnp.zeros((4, 1)).at[2, 0].set(-1.0)
  nstate = env.step(state, action)
  assert np.asarray(nstate.metrics['nonfinite'])[2] == 1
  assert np.all(np.isfinite(np.asarray(nstate.obs)))
  # next step on the quarantined env proceeds normally from the restored
  # first state
  n2 = env.step(nstate, jnp.zeros((4, 1)))
  assert np.all(np.isfinite(np.asarray(n2.obs)))
  assert np.all(np.asarray(n2.metrics['nonfinite']) == 0)
  np.testing.assert_allclose(np.asarray(n2.reward), 1.0)


def test_guard_sanitizes_nan_action():
  env = _make()
  state = _reset(env, jax.random.PRNGKey(2))
  action = jnp.full((4, 1), jnp.nan)
  nstate = env.step(state, action)
  # NaN actions sanitized to 0 → finite rollout, no quarantine needed
  assert np.all(np.isfinite(np.asarray(nstate.obs)))
  assert np.all(np.isfinite(np.asarray(nstate.reward)))


def test_rollout_scan_stays_finite_under_periodic_blowups():
  env = _make(batch=8, episode_length=50)

  def policy(obs, rng):
    # every env explodes with ~10% probability per step
    p = jax.random.uniform(rng, (obs.shape[0], 1))
    return jnp.where(p < 0.1, 1.0, 0.0), {}

  state = _reset(env, jax.random.PRNGKey(3), batch=8)
  final, data = acting.generate_unroll(
      env, state, policy, jax.random.PRNGKey(4), unroll_length=60
  )
  for leaf in jax.tree.leaves((data.observation, data.reward, data.discount)):
    assert np.all(np.isfinite(np.asarray(leaf)))
  # blowups actually happened (guard exercised, not vacuous)
  assert np.asarray(data.discount).min() == 0


def test_evaluator_masks_nan_episodes():
  env = _make(batch=4, episode_length=5)
  eval_env = wrappers.EvalWrapper(env)

  def eval_policy_fn(params):
    def policy(obs, rng):
      return jnp.zeros((obs.shape[0], 1)), {}
    return policy

  ev = acting.Evaluator(
      eval_env,
      eval_policy_fn,
      num_eval_envs=4,
      episode_length=5,
      action_repeat=1,
      key=jax.random.PRNGKey(0),
  )

  # fabricate an unroll result with one NaN episode reward
  real_unroll = ev._generate_eval_unroll

  def poisoned(params, key):
    state = real_unroll(params, key)
    em = state.info['eval_metrics']
    rewards = em.episode_metrics['reward']
    rewards = rewards.at[0].set(jnp.nan)
    em.episode_metrics['reward'] = rewards
    return state

  ev._generate_eval_unroll = poisoned
  metrics = ev.run_evaluation(None, {})
  assert metrics['eval/nan_episodes'] == 1
  assert np.isfinite(metrics['eval/episode_reward'])
  assert np.isfinite(metrics['eval/episode_reward_std'])
