"""Deterministic reproduction of the contact-solver divergence.

Replicates the PPO trainer's very first evaluation unroll exactly
(seed-0 key derivation from train/ppo.py:117-121, Evaluator key split from
train/acting.py:99) on AirbotCubePushTrain with 128 eval envs x 1200 steps
at init params, and reports per-step blow-up statistics: which envs go
non-finite (or |qvel| > 1e3) and when.

Round-3 verdict root cause: the f32 Newton contact solver diverges at
~1e-5 per env-step under gripper-cube contact (qvel 3.6 -> 87 -> 796 ->
3.6e5 -> NaN over 4 control steps); env 37 blows at control step 727 on
the TPU kernel path.  This script is the acceptance test for the round-4
solver hardening + NaN quarantine.

Usage:  python scripts/repro_divergence.py [--steps 1200] [--envs 128]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rsr_mjx_tpu import envs as _envs
from rsr_mjx_tpu.envs import wrappers
from rsr_mjx_tpu.train import configs as _configs
from rsr_mjx_tpu.train import networks as ppo_networks
from rsr_mjx_tpu.train import ppo


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--steps', type=int, default=1200)
  p.add_argument('--envs', type=int, default=128)
  p.add_argument('--seed', type=int, default=0)
  args = p.parse_args()

  env_name = 'AirbotCubePushTrain'
  env = _envs.load(env_name)
  cfg = _configs.ppo_config(env_name)
  nf = cfg.network_factory

  network_factory = functools.partial(
      ppo_networks.make_ppo_networks,
      policy_hidden_layer_sizes=tuple(nf.policy_hidden_layer_sizes),
      value_hidden_layer_sizes=tuple(nf.value_hidden_layer_sizes),
  )

  # init params via the trainer's restore-only path (same init key
  # derivation as the real run: global_key from PRNGKey(seed))
  make_policy, params, _ = ppo.train(
      environment=env,
      num_timesteps=0,
      episode_length=cfg.episode_length,
      num_envs=cfg.num_envs,
      batch_size=cfg.batch_size,
      num_minibatches=cfg.num_minibatches,
      seed=args.seed,
      normalize_observations=cfg.normalize_observations,
      network_factory=network_factory,
  )

  # trainer-exact eval key derivation (train/ppo.py:117-121)
  key = jax.random.PRNGKey(args.seed)
  _global_key, local_key = jax.random.split(key)
  local_key = jax.random.fold_in(local_key, jax.process_index())
  local_key, _key_env, eval_key = jax.random.split(local_key, 3)
  # Evaluator.run_evaluation first split (train/acting.py:99)
  _eval_key, unroll_key = jax.random.split(eval_key)

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
    qvel = nstate.data.qvel
    finite = jnp.all(
        jnp.isfinite(nstate.data.qpos), axis=-1
    ) & jnp.all(jnp.isfinite(qvel), axis=-1)
    max_qvel = jnp.max(jnp.abs(jnp.nan_to_num(qvel, posinf=jnp.inf,
                                              neginf=-jnp.inf)), axis=-1)
    blown = (~finite) | (max_qvel > 1e3)
    # also track guard metric if present
    nonfinite = nstate.metrics.get(
        'nonfinite', jnp.zeros_like(nstate.reward))
    return (nstate, k), (blown, jnp.max(max_qvel), nonfinite,
                         nstate.reward)

  @jax.jit
  def run(key):
    reset_keys = jax.random.split(key, args.envs)
    state = eval_env.reset(reset_keys)
    (final_state, _), (blown, max_qvel, nonfinite, rewards) = jax.lax.scan(
        scan_step, (state, key), (), length=args.steps
    )
    return final_state, blown, max_qvel, nonfinite, rewards

  t0 = time.time()
  final_state, blown, max_qvel, nonfinite, rewards = run(unroll_key)
  jax.block_until_ready(blown)
  print(f'run time {time.time() - t0:.1f}s on {jax.default_backend()}')

  blown = np.asarray(blown)  # (steps, envs)
  max_qvel = np.asarray(max_qvel)
  nonfinite = np.asarray(nonfinite)
  rewards = np.asarray(rewards)

  ever_blown = blown.any(axis=0)
  n_blown = int(ever_blown.sum())
  print(f'envs ever blown (|qvel|>1e3 or nonfinite): {n_blown}/{args.envs}')
  for e in np.nonzero(ever_blown)[0]:
    first = int(np.argmax(blown[:, e]))
    print(f'  env {e}: first blow at control step {first}')
  print(f'global max |qvel| over run: {np.max(max_qvel):.3e}')
  print(f'nonfinite-guard trips (sum of metric): {np.sum(nonfinite):.0f}')
  n_nan_rew = int(np.sum(~np.isfinite(rewards)))
  print(f'non-finite step rewards: {n_nan_rew}')

  # eval metrics as the Evaluator would compute them
  em = final_state.info['eval_metrics']
  epi = np.asarray(em.episode_metrics['reward'])
  print(f'episode rewards: mean {np.nanmean(epi):.1f}  '
        f'finite {int(np.isfinite(epi).sum())}/{args.envs}  '
        f'finite-mean {np.mean(epi[np.isfinite(epi)]):.1f}')


if __name__ == '__main__':
  main()
