"""Real-TPU backend tests (opt-in lane; see conftest.py).

Covers the paths the CPU suite cannot: the fused Pallas Newton kernel, the
lanes collision kernels, TPU-specific numerics, and training-step
finiteness on the chip.  Reference contract: fixed-seed trajectory parity
and finite training (BASELINE.md quality row).

Run:  RSR_TPU_TESTS=1 python -m pytest tests_tpu/ -q
Regenerate TPU goldens after an intentional semantic change:
      RSR_TPU_TESTS=1 REGEN=1 python -m pytest tests_tpu/ -q
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsr_mjx_tpu import envs
from rsr_mjx_tpu.envs import wrappers
from rsr_mjx_tpu import physics

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), 'goldens')
REGEN = os.environ.get('REGEN', '0') == '1'

CASES = [
    ('AirbotCubePush', 5, 100),
    ('Go2JoystickFlatTerrain', 12, 100),
]


def _rollout(name, act_dim, steps):
  """Same fixed-seed rollout as tests/test_env_golden.py, on TPU."""
  env = envs.load(name)
  state = jax.jit(env.reset)(jax.random.PRNGKey(42))

  def body(carry, key):
    state = carry
    act = jax.random.uniform(key, (act_dim,), minval=-0.3, maxval=0.3)
    state = env.step(state, act)
    obs = state.obs['state'] if isinstance(state.obs, dict) else state.obs
    return state, (obs, state.reward)

  keys = jax.random.split(jax.random.PRNGKey(7), steps)
  _, (obs, rew) = jax.jit(lambda s, k: jax.lax.scan(body, s, k))(state, keys)
  return np.asarray(obs), np.asarray(rew)


@pytest.mark.parametrize('name,act_dim,steps', CASES,
                         ids=[c[0] for c in CASES])
def test_tpu_golden_trajectory(name, act_dim, steps):
  """TPU-generated goldens: a TPU-only trajectory regression fails here.

  Separate files from the CPU goldens — the fused kernel path and XLA CPU
  produce slightly different (both valid) trajectories, so each backend
  pins its own.
  """
  obs, rew = _rollout(name, act_dim, steps)
  assert np.all(np.isfinite(obs)) and np.all(np.isfinite(rew))
  path = os.path.join(GOLDEN_DIR, f'{name}.npz')
  if REGEN or not os.path.exists(path):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    np.savez(path, obs=obs, rew=rew)
    if not REGEN:
      pytest.skip('TPU golden created; rerun to compare')
  golden = np.load(path)
  np.testing.assert_allclose(obs, golden['obs'], rtol=2e-4, atol=2e-5)
  np.testing.assert_allclose(rew, golden['rew'], rtol=2e-4, atol=2e-5)


def test_kernel_vs_xla_parity_manipulation_regime(monkeypatch):
  """Fused Pallas Newton kernel vs pure-XLA solve on the same chip, from a
  contact-rich gripper-on-cube state (the regime where the round-3
  divergence lived).  One substep must agree tightly; a short rollout must
  stay finite on both paths."""
  from rsr_mjx_tpu.physics import linalg_kernels as _lk

  env = envs.load('AirbotCubePush')
  m = env.model
  state = jax.jit(env.reset)(jax.random.PRNGKey(0))
  env_step = jax.jit(env.step)
  for _ in range(40):
    obs = np.asarray(state.obs)
    act = np.zeros(5)
    act[:3] = np.clip(obs[-3:] / 0.02, -1, 1)
    state = env_step(state, jnp.asarray(act, jnp.float32))
  d = state.data

  # batch the single state so the kernel's custom_vmap rule engages
  dB = jax.tree.map(lambda x: jnp.broadcast_to(x, (8,) + x.shape), d)
  step_fn = lambda d: jax.vmap(lambda dd: physics.step(m, dd))(d)

  out_kernel = jax.jit(step_fn)(dB)

  monkeypatch.setattr(_lk, '_use_tpu_kernels', lambda: False)
  out_xla = jax.jit(step_fn)(dB)
  monkeypatch.undo()

  qk = np.asarray(out_kernel.qpos)
  qx = np.asarray(out_xla.qpos)
  assert np.all(np.isfinite(qk)) and np.all(np.isfinite(qx))
  np.testing.assert_allclose(qk, qx, atol=2e-5)
  np.testing.assert_allclose(
      np.asarray(out_kernel.qvel), np.asarray(out_xla.qvel), atol=5e-3
  )


def test_eval_unroll_no_unquarantined_divergence():
  """The round-3 failure, as a regression test: the trainer-exact eval
  unroll (128 envs x 1200 steps, seed 0, init params) must produce only
  finite episode rewards, and any solver blow-up must be caught by the
  NonFiniteGuard (bounded count; the round-3 baseline tripped ~1/128)."""
  from rsr_mjx_tpu.train import configs as _configs
  from rsr_mjx_tpu.train import networks as ppo_networks
  from rsr_mjx_tpu.train import ppo

  env_name = 'AirbotCubePushTrain'
  env = envs.load(env_name)
  cfg = _configs.ppo_config(env_name)
  nf = cfg.network_factory
  network_factory = functools.partial(
      ppo_networks.make_ppo_networks,
      policy_hidden_layer_sizes=tuple(nf.policy_hidden_layer_sizes),
      value_hidden_layer_sizes=tuple(nf.value_hidden_layer_sizes),
  )
  make_policy, params, _ = ppo.train(
      environment=env,
      num_timesteps=0,
      episode_length=cfg.episode_length,
      num_envs=cfg.num_envs,
      batch_size=cfg.batch_size,
      num_minibatches=cfg.num_minibatches,
      seed=0,
      normalize_observations=cfg.normalize_observations,
      network_factory=network_factory,
  )
  eval_env = wrappers.wrap_for_training(
      env, episode_length=cfg.episode_length, action_repeat=1
  )
  eval_env = wrappers.EvalWrapper(eval_env)
  policy = make_policy(params, deterministic=False)

  def scan_step(carry, _):
    state, k = carry
    k, sk = jax.random.split(k)
    actions, _ = policy(state.obs, sk)
    nstate = eval_env.step(state, actions)
    return (nstate, k), nstate.metrics['nonfinite']

  @jax.jit
  def run(key):
    reset_keys = jax.random.split(key, 128)
    state = eval_env.reset(reset_keys)
    (final_state, _), trips = jax.lax.scan(
        scan_step, (state, key), (), length=1200
    )
    return final_state, trips

  final_state, trips = run(jax.random.PRNGKey(0))
  em = final_state.info['eval_metrics']
  epi_rewards = np.asarray(em.episode_metrics['reward'])
  assert np.all(np.isfinite(epi_rewards)), 'NaN escaped the quarantine'
  n_trips = float(np.sum(np.asarray(trips)))
  assert n_trips <= 8, f'solver unstable: {n_trips} guard trips in 153.6k steps'


def test_ppo_train_step_finite_on_tpu():
  """One real PPO epoch on the chip: all losses and eval metrics finite."""
  from rsr_mjx_tpu.train import networks as ppo_networks
  from rsr_mjx_tpu.train import ppo

  env = envs.load('AirbotCubePushTrain')
  metrics_log = []
  make_policy, params, metrics = ppo.train(
      environment=env,
      num_timesteps=4096,
      episode_length=200,
      num_envs=64,
      num_eval_envs=16,
      batch_size=32,
      unroll_length=8,
      num_minibatches=2,
      num_updates_per_batch=2,
      num_evals=2,
      normalize_observations=True,
      learning_rate=1e-4,
      entropy_cost=2e-2,
      discounting=0.96,
      reward_scaling=0.1,
      max_grad_norm=1.0,
      seed=0,
      progress_fn=lambda step, m: metrics_log.append((step, m)),
  )
  assert metrics_log
  for _, m in metrics_log:
    for k, v in m.items():
      assert np.isfinite(v), (k, v)
  for leaf in jax.tree.leaves(params):
    assert np.all(np.isfinite(np.asarray(leaf)))
