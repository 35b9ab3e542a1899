"""Benchmark: Airbot cube-push env-steps/s on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric = control env-steps/s (each control step = 4 physics substeps,
matching the reference's `training/sps` accounting, RSR/train.py:374-385).
vs_baseline is measured against the driver north-star of 5M env-steps/s on
a v5e-8 (BASELINE.json), scaled to the number of chips actually used:
vs_baseline = value / (5e6 * n_chips / 8).
"""

import json
import os
import time

import jax
import jax.numpy as jnp


def main():
  from rsr_mjx_tpu import envs

  n_dev = len(jax.devices())
  # per-chip batch: 2048 envs fills the lanes-kernel grid better than 1024
  # (fixed per-block overheads amortize over more 128-lane blocks)
  num_envs = int(os.environ.get('RSR_BENCH_NUM_ENVS', '2048')) * n_dev
  steps = 50

  # top-k active-contact selection: Newton system sees ≤24 of the scene's
  # 480 contact slots (≤12 penetrate even under an end-effector slam;
  # bound asserted with margin in test_physics_contact.py).
  env_core = envs.load(
      'AirbotCubePush',
      max_contacts=int(os.environ.get('RSR_BENCH_MAX_CONTACTS', '24')),
  )
  from rsr_mjx_tpu.envs import wrappers

  env = wrappers.wrap_for_training(
      env_core, episode_length=1200, num_envs=num_envs
  )

  rng = jax.random.split(jax.random.PRNGKey(0), num_envs)
  state = jax.jit(env.reset)(rng)

  def rollout(state, actions):
    def body(state, action):
      state = env.step(state, action)
      return state, state.reward

    return jax.lax.scan(body, state, actions)

  rollout = jax.jit(rollout)
  actions = (
      jax.random.uniform(jax.random.PRNGKey(1), (steps, num_envs, 5)) * 2 - 1
  )

  # compile + warmup
  state2, _ = rollout(state, actions)
  jax.block_until_ready(state2.data.qpos)

  t0 = time.time()
  n_rep = 3
  for _ in range(n_rep):
    state, rewards = rollout(state, actions)
  jax.block_until_ready(state.data.qpos)
  dt = time.time() - t0

  env_steps = steps * num_envs * n_rep
  sps = env_steps / dt
  target = 5e6 * n_dev / 8.0
  print(
      json.dumps({
          'metric': 'airbot_cube_push_env_steps_per_s',
          'value': round(sps, 1),
          'unit': 'env-steps/s',
          'vs_baseline': round(sps / target, 4),
      })
  )


if __name__ == '__main__':
  main()
