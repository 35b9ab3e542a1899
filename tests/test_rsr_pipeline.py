"""RSR pipeline tests: dataset contract, env-param tuning gradient,
end-to-end RSR policy training smoke."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsr_mjx_tpu import envs
from rsr_mjx_tpu.rsr import datasets, pipeline


def _write(path, arr):
  np.savetxt(path, arr, delimiter=',')


def test_dataset_loader_contract(tmp_path):
  d = str(tmp_path)
  n, obs_dim, act_dim = 6, 23, 5
  rng = np.random.RandomState(0)
  _write(os.path.join(d, 'real_obs.txt'), rng.randn(n + 1, obs_dim))
  _write(os.path.join(d, 'real_action.txt'), rng.randn(n, act_dim))
  _write(os.path.join(d, 'past_sim_obs.txt'), rng.randn(n + 1, obs_dim))
  _write(os.path.join(d, 'current_sim_obs.txt'), rng.randn(n + 1, obs_dim))
  _write(os.path.join(d, 'obs.txt'), rng.randn(n + 1, obs_dim))
  _write(os.path.join(d, 'actions.txt'), rng.randn(n, act_dim))

  out = datasets.load_rsr_datasets(d, max_transitions=50)
  assert out[0].shape == (n, obs_dim)
  assert out[1].shape == (n, act_dim)
  for arr in (out[2], out[3], out[4]):
    assert arr.shape == (n, obs_dim)

  # missing file → FileNotFoundError
  os.remove(os.path.join(d, 'actions.txt'))
  with pytest.raises(FileNotFoundError):
    datasets.load_rsr_datasets(d)
  # width mismatch → ValueError
  _write(os.path.join(d, 'actions.txt'), rng.randn(n, act_dim + 1))
  with pytest.raises(ValueError):
    datasets.load_rsr_datasets(d)


def test_build_policy_rsr_data_validation():
  rng = np.random.RandomState(1)
  s = rng.randn(5, 4)
  a = rng.randn(5, 2)
  data = pipeline.build_policy_rsr_data(s, a, s + 0.1, s + 0.2, s + 0.05)
  assert (data.n_anchors, data.width) == (5, 10)
  assert data.anchor_logsum.shape == data.target_cdf.shape == (10,)
  with pytest.raises(ValueError):
    pipeline.build_policy_rsr_data(s, a, s[:4] + 0.1, s + 0.2, s)
  with pytest.raises(ValueError):
    pipeline.build_policy_rsr_data(s[None], a, s, s, s)


@pytest.mark.slow
def test_env_params_tuning_reduces_loss():
  """Tuning the cube friction against sim-generated 'real' transitions
  must produce a finite, shrinking loss and move the parameter."""
  # max_contacts=8 shrinks the constraint system: differentiating through
  # the contact solve is this suite's largest compile and 8 slots exercise
  # the same code paths (cold compile was ~25 min at the default 32)
  env = envs.load('AirbotCubePush', max_contacts=8)
  # generate 4 on-policy transitions from the env itself
  state = jax.jit(env.reset)(jax.random.PRNGKey(0))
  step = jax.jit(env.step)
  obs_rows, act_rows = [np.asarray(state.obs)], []
  rng = jax.random.PRNGKey(1)
  for _ in range(4):
    rng, sub = jax.random.split(rng)
    act = jax.random.uniform(sub, (5,), minval=-0.5, maxval=0.5)
    state = step(state, act)
    act_rows.append(np.asarray(act))
    obs_rows.append(np.asarray(state.obs))
  obs = np.stack(obs_rows)

  tuned, log = pipeline.env_params_tuning(
      env,
      num_steps=5,
      init_env_params=jnp.asarray(0.4),
      env_params_min=jnp.asarray(0.08),
      env_params_max=jnp.asarray(4.0),
      obs=obs[:-1],
      actions=np.stack(act_rows),
      next_obs_true=obs[1:],
      log_path=None,
  )
  assert np.isfinite(log['loss']).all()
  assert len(log['loss']) == 5
  # optimizer actually moved the parameter
  assert abs(float(np.asarray(tuned)) - 0.4) > 1e-6


def test_tuning_loss_multistep_math():
  """k-step rollout windows + per-dim error of `_make_tuning_loss`,
  verified against hand-computed values on synthetic linear dynamics
  (grad-through-contact itself is covered by the k=1 test above and the
  committed TPU demo, logs/rsr_demo_r4)."""
  import collections

  S = collections.namedtuple('S', 'obs')

  # dynamics: obs' = obs + p * a   (p the tuned parameter)
  def step_with_params(p, state, action):
    return S(obs=state.obs + p * action)

  obs = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [1.0, 2.0]])
  actions = jnp.asarray([[1.0, 0.0], [0.0, 2.0], [1.0, 1.0]])
  next_obs = jnp.asarray([[1.0, 0.0], [1.0, 2.0], [2.0, 3.0]])
  states = S(obs=obs)
  w = jnp.asarray([1.0, 10.0])

  # ---- k=1 reference objective: |w . (obs + p*a - next)| summed
  loss1 = pipeline._make_tuning_loss(
      step_with_params, states, actions, next_obs, w, 1, False
  )
  # p=1 makes every prediction exact
  assert float(loss1(jnp.asarray(1.0))) == pytest.approx(0.0)
  # p=0: per-row |w . (obs - next)| summed
  expect = sum(abs(float(jnp.dot(w, obs[i] - next_obs[i]))) for i in range(3))
  assert float(loss1(jnp.asarray(0.0))) == pytest.approx(expect)

  # ---- k=2 windows from starts {0, 1}, chained rollout, per-dim error
  loss2 = pipeline._make_tuning_loss(
      step_with_params, states, actions, next_obs, w, 2, True
  )
  assert float(loss2(jnp.asarray(1.0))) == pytest.approx(0.0)
  p = 0.5
  total = 0.0
  for s0 in (0, 1):
    cur = np.asarray(obs[s0])
    for t in range(2):
      cur = cur + p * np.asarray(actions[s0 + t])
      total += np.sum(np.abs(np.asarray(w) * (cur - np.asarray(next_obs[s0 + t]))))
  assert float(loss2(jnp.asarray(p))) == pytest.approx(total / 2, rel=1e-6)

  # gradient flows through the chained rollout
  g = jax.grad(lambda q: loss2(q))(jnp.asarray(0.5))
  assert np.isfinite(float(g)) and abs(float(g)) > 0

  # horizon must not exceed the data
  with pytest.raises(ValueError):
    pipeline._make_tuning_loss(
        step_with_params, states, actions, next_obs, w, 99, False
    )

  # ---- validity mask: invalid transitions are filtered STATICALLY
  # (post-hoc zero-weighting would still backprop NaN from a bad window)
  valid = np.array([True, False, True])
  # k=1: only rows 0 and 2 contribute
  loss1v = pipeline._make_tuning_loss(
      step_with_params, states, actions, next_obs, w, 1, False, valid=valid
  )
  expect = sum(
      abs(float(jnp.dot(w, obs[i] - next_obs[i]))) for i in (0, 2)
  )
  assert float(loss1v(jnp.asarray(0.0))) == pytest.approx(expect)
  # k=2: both windows span the invalid middle transition → no data left
  with pytest.raises(ValueError):
    pipeline._make_tuning_loss(
        step_with_params, states, actions, next_obs, w, 2, False, valid=valid
    )
  # k=2 with only the last transition invalid keeps window {0}
  valid2 = np.array([True, True, False])
  loss2v = pipeline._make_tuning_loss(
      step_with_params, states, actions, next_obs, w, 2, True, valid=valid2
  )
  assert float(loss2v(jnp.asarray(1.0))) == pytest.approx(0.0)
  p = 0.5
  total = 0.0
  cur = np.asarray(obs[0])
  for t in range(2):
    cur = cur + p * np.asarray(actions[t])
    total += np.sum(np.abs(np.asarray(w) * (cur - np.asarray(next_obs[t]))))
  assert float(loss2v(jnp.asarray(p))) == pytest.approx(total / 2, rel=1e-6)


@pytest.mark.slow
def test_rsr_policy_training_end_to_end(tmp_path):
  """Tiny RSR PPO run on the real cube env with the penalty active."""
  env = envs.load('AirbotCubePush')
  rng = np.random.RandomState(3)
  n, obs_dim, act_dim = 5, 23, 5
  s = rng.randn(n, obs_dim)
  a = rng.randn(n, act_dim)
  make_inference_fn, params = pipeline.policy_params_training(
      env=env,
      algorithm='ppo',
      past_states=s,
      past_actions=a,
      past_next_states_real=s + 0.1,
      past_next_states_sim=s + 0.2,
      current_next_states_sim=s + 0.05,
      rsr_loss_scale=1.0,
      num_timesteps=32,
      num_evals=1,
      episode_length=4,
      num_envs=8,
      batch_size=8,
      unroll_length=2,
      num_minibatches=2,
      num_updates_per_batch=1,
      num_eval_envs=8,
      seed=0,
  )
  policy = make_inference_fn(params, deterministic=True)
  state = jax.jit(env.reset)(jax.random.PRNGKey(0))
  act, _ = jax.jit(policy)(state.obs, jax.random.PRNGKey(1))
  assert act.shape == (5,)
  assert np.isfinite(np.asarray(act)).all()
