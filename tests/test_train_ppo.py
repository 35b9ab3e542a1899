"""PPO trainer tests: loss math units + end-to-end smoke training on an
8-device CPU mesh (spoofed multi-chip; conftest sets
--xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsr_mjx_tpu.envs import core
from rsr_mjx_tpu.rsr import distribution as dp
from rsr_mjx_tpu.rsr import loss as rsr_loss
from rsr_mjx_tpu.train import losses as ppo_losses
from rsr_mjx_tpu.train import ppo


# ---------------------------------------------------------------------------
# loss math
# ---------------------------------------------------------------------------


def test_gae_matches_discounted_returns():
  """With lambda=1 and no termination, vs = discounted reward-to-go plus
  the bootstrap tail."""
  T, B = 5, 2
  rewards = jnp.ones((T, B))
  values = jnp.zeros((T, B))
  bootstrap = jnp.zeros(B)
  disc = 0.9
  vs, adv = ppo_losses.compute_gae(
      truncation=jnp.zeros((T, B)),
      termination=jnp.zeros((T, B)),
      rewards=rewards,
      values=values,
      bootstrap_value=bootstrap,
      lambda_=1.0,
      discount=disc,
  )
  expected_t0 = sum(disc**i for i in range(T))
  np.testing.assert_allclose(np.asarray(vs)[0], expected_t0, rtol=1e-6)
  np.testing.assert_allclose(np.asarray(vs)[-1], 1.0, rtol=1e-6)
  # zero values → advantages equal the returns
  np.testing.assert_allclose(np.asarray(adv), np.asarray(vs), rtol=1e-6)


def test_gae_termination_cuts_bootstrap():
  T, B = 3, 1
  rewards = jnp.ones((T, B))
  termination = jnp.zeros((T, B)).at[1].set(1.0)
  vs, _ = ppo_losses.compute_gae(
      truncation=jnp.zeros((T, B)),
      termination=termination,
      rewards=rewards,
      values=jnp.zeros((T, B)),
      bootstrap_value=jnp.full((B,), 100.0),
      lambda_=1.0,
      discount=0.9,
  )
  # reward at t=1 terminates: value at t=0 = 1 + 0.9·1 = 1.9 (no tail)
  np.testing.assert_allclose(float(vs[0, 0]), 1.9, rtol=1e-6)


def test_kde_properties():
  rng = np.random.RandomState(0)
  data = jnp.asarray(rng.randn(20, 4))
  grid = rsr_loss.make_grid(10, 4)
  p = dp.evaluate_kde(data, grid, 0.5)
  np.testing.assert_allclose(float(jnp.sum(p)), 1.0, rtol=1e-5)
  assert np.all(np.asarray(p) > 0)
  # identical distributions → zero KL and zero Wasserstein
  assert abs(float(dp.kl_divergence(p, p))) < 1e-6
  assert float(dp.wasserstein_distance(p, p)) == 0.0
  q = dp.evaluate_kde(jnp.asarray(rng.randn(20, 4) + 3.0), grid, 0.5)
  assert float(dp.kl_divergence(p, q)) > 0
  assert float(dp.wasserstein_distance(p, q)) > 0


def test_rsr_loss_matches_direct_formulation():
  """The precomputed-anchor fold-in (round-5 loss.py) must equal the
  direct definition: KDE over the concatenated anchors+online set,
  Wasserstein against the anchor density (reference semantics,
  RSR/rsr_loss.py:122-175)."""
  rng = np.random.RandomState(7)
  N, D_OBS, D_ACT = 9, 3, 2
  width = 2 * D_OBS + D_ACT
  real = jnp.asarray(rng.randn(N, width))
  prev = real + 0.2
  cur = real + 0.1
  bw = 0.7
  data = rsr_loss.build_rsr_data(real, prev, cur, bandwidth=bw)

  obs = jnp.asarray(rng.randn(4, D_OBS))
  act = jnp.asarray(rng.randn(4, D_ACT))
  nobs = jnp.asarray(rng.randn(4, D_OBS))
  loss, dist_got = rsr_loss.compute_rsr_loss(
      obs, act, nobs, data, loss_scale=2.5
  )

  online = jnp.concatenate([obs, act, nobs], axis=-1)
  augmented = jnp.concatenate([cur, online], axis=0)
  density = dp.evaluate_kde(augmented, data.grid, bw)
  dist_want = dp.wasserstein_distance(
      density, dp.evaluate_kde(cur, data.grid, bw)
  )
  kl_want = dp.kl_divergence(
      dp.evaluate_kde(real, data.grid, bw),
      dp.evaluate_kde(prev, data.grid, bw),
  )
  np.testing.assert_allclose(
      float(dist_got), float(dist_want), rtol=1e-5, atol=1e-7
  )
  np.testing.assert_allclose(
      float(loss), 2.5 * float(kl_want) * float(dist_want),
      rtol=1e-5, atol=1e-7,
  )


def test_rsr_loss_gradient_flows_through_actions():
  """The penalty must produce nonzero gradient w.r.t. the policy action
  (the reference docstring property, RSR/rsr_loss.py:1-7)."""
  rng = np.random.RandomState(1)
  D_OBS, D_ACT, N = 3, 2, 8
  real = jnp.asarray(rng.randn(N, 2 * D_OBS + D_ACT))
  # wide bandwidth keeps the grid softmax un-saturated so the gradient is
  # numerically visible in float32 (narrow bandwidths make the density
  # one-hot and the gradient vanishes — true for the reference math too)
  data = rsr_loss.build_rsr_data(real, real + 0.1, real + 0.05, bandwidth=2.0)
  obs = jnp.asarray(rng.randn(4, D_OBS))
  nobs = jnp.asarray(rng.randn(4, D_OBS))

  def f(act):
    loss, _ = rsr_loss.compute_rsr_loss(obs, act, nobs, data)
    return loss

  g = jax.grad(f)(jnp.asarray(rng.randn(4, D_ACT)))
  assert float(jnp.abs(g).max()) > 0

  # disabled paths short-circuit to zero (rsr_loss.py:140-142)
  loss, dist = rsr_loss.compute_rsr_loss(obs, obs[:, :2], nobs, None)
  assert float(loss) == 0.0 and float(dist) == 0.0


# ---------------------------------------------------------------------------
# end-to-end smoke training
# ---------------------------------------------------------------------------


class PointMass(core.Env):
  """Trivial 2-D point mass: action displaces the point, reward is
  −‖pos‖.  Optimal policy drives the point to the origin."""

  @property
  def model(self):
    return None

  @property
  def action_size(self):
    return 2

  @property
  def ctrl_dt(self):
    return 0.1

  @property
  def sim_dt(self):
    return 0.1

  def reset(self, rng):
    pos = jax.random.uniform(rng, (2,), minval=-1.0, maxval=1.0)
    return core.State(
        data=pos,
        obs=pos,
        reward=jnp.zeros(()),
        done=jnp.zeros(()),
        metrics={'dist': jnp.zeros(())},
        info={},
    )

  def step(self, state, action):
    pos = state.data + 0.1 * jnp.clip(action, -1, 1)
    reward = -jnp.linalg.norm(pos)
    state.metrics.update(dist=-reward)
    return state.replace(data=pos, obs=pos, reward=reward)


def test_ppo_smoke_multidevice():
  assert jax.device_count() == 8
  env = PointMass()
  progress = []

  make_policy, params, metrics = ppo.train(
      env,
      num_timesteps=40_000,
      episode_length=16,
      num_envs=16,
      num_eval_envs=16,
      learning_rate=3e-3,
      entropy_cost=1e-3,
      discounting=0.95,
      unroll_length=8,
      batch_size=32,
      num_minibatches=4,
      num_updates_per_batch=2,
      num_evals=3,
      normalize_observations=True,
      seed=0,
      progress_fn=lambda step, m: progress.append((step, m)),
  )
  assert metrics['training/sps'] > 0
  first_reward = progress[0][1]['eval/episode_reward']
  last_reward = progress[-1][1]['eval/episode_reward']
  assert last_reward > first_reward, (first_reward, last_reward)
  # learned to approach the origin: mean distance shrinks significantly
  assert last_reward > first_reward * 0.5

  # inference path
  policy = make_policy(params, deterministic=True)
  act, _ = jax.jit(policy)(jnp.array([0.5, -0.5]), jax.random.PRNGKey(0))
  assert act.shape == (2,)
  # deterministic policy pushes towards origin
  assert float(act[0]) < 0 and float(act[1]) > 0


def test_ppo_restore_roundtrip(tmp_path):
  env = PointMass()
  make_policy, params, _ = ppo.train(
      env,
      num_timesteps=2_000,
      episode_length=8,
      num_envs=8,
      num_eval_envs=8,
      unroll_length=4,
      batch_size=8,
      num_minibatches=2,
      num_updates_per_batch=1,
      num_evals=1,
      seed=1,
  )
  from rsr_mjx_tpu.train import checkpoint

  path = str(tmp_path / 'ckpt')
  checkpoint.save(path, params)
  # restore-only train call (reference inference trick, RSR/train.py:403-408)
  make_policy2, params2, _ = ppo.train(
      env,
      num_timesteps=0,
      episode_length=8,
      num_envs=8,
      restore_checkpoint_path=path,
  )
  obs = jnp.array([0.3, 0.3])
  a1, _ = make_policy(params, True)(obs, jax.random.PRNGKey(0))
  a2, _ = make_policy2(params2, True)(obs, jax.random.PRNGKey(0))
  np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)


class DictPointMass(PointMass):
  """PointMass with dict obs: policy sees 'state', critic additionally
  sees a privileged key (asymmetric actor-critic, Go2 config shape)."""

  def reset(self, rng):
    s = super().reset(rng)
    obs = {'state': s.obs, 'privileged_state': jnp.concatenate([s.obs, s.obs])}
    return s.replace(obs=obs)

  def step(self, state, action):
    inner = state.replace(obs=state.obs['state'])
    s = super().step(inner, action)
    obs = {'state': s.obs, 'privileged_state': jnp.concatenate([s.obs, s.obs])}
    return s.replace(obs=obs)


def test_ppo_dict_obs_asymmetric():
  import functools
  from rsr_mjx_tpu.train import networks as ppo_networks

  env = DictPointMass()
  progress = []
  network_factory = functools.partial(
      ppo_networks.make_ppo_networks,
      policy_hidden_layer_sizes=(32, 32),
      value_hidden_layer_sizes=(64, 64),
      policy_obs_key='state',
      value_obs_key='privileged_state',
  )
  make_policy, params, metrics = ppo.train(
      env,
      num_timesteps=30_000,
      episode_length=16,
      num_envs=16,
      num_eval_envs=16,
      learning_rate=3e-3,
      entropy_cost=1e-3,
      discounting=0.95,
      unroll_length=8,
      batch_size=32,
      num_minibatches=4,
      num_updates_per_batch=2,
      num_evals=3,
      normalize_observations=True,
      network_factory=network_factory,
      seed=0,
      progress_fn=lambda step, m: progress.append((step, m)),
  )
  first = progress[0][1]['eval/episode_reward']
  last = progress[-1][1]['eval/episode_reward']
  assert last > first, (first, last)
  policy = make_policy(params, deterministic=True)
  obs = {'state': jnp.array([0.5, -0.5]),
         'privileged_state': jnp.zeros(4)}
  act, _ = jax.jit(policy)(obs, jax.random.PRNGKey(0))
  assert act.shape == (2,)


def test_running_statistics_negative_variance_clamped():
  """f32 Welford cancellation regression (round-4): a state carrying a
  slightly negative summed_variance (as XLA reduction reordering can
  produce for near-constant dims) must still yield finite std — round 3's
  15M run was all-NaN from epoch 1 through exactly this path."""
  from rsr_mjx_tpu.train import running_statistics as rs

  state = rs.init_state(3)
  state = state.replace(
      count=jnp.asarray(81920.0),
      summed_variance=jnp.array([-0.5, 0.0, 1.0]),
  )
  batch = jnp.broadcast_to(jnp.array([0.7, 0.7, 0.7]), (64, 3))
  new = rs.update(state, batch)
  assert np.all(np.isfinite(np.asarray(new.std)))
  assert np.all(np.asarray(new.std) > 0)
  # constant batch at scale: many repeated updates stay finite
  for _ in range(3):
    new = rs.update(new, batch)
  assert np.all(np.isfinite(np.asarray(new.std)))
