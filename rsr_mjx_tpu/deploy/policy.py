"""Checkpoint → deterministic inference function.

Native equivalent of the reference's PolicyInference
(airbot_sim2real_sl/src/.../ppo_inference.py:17-83), minus its quirk of
rebuilding the whole trainer: the restore-only path of ``ppo.train``
(num_timesteps=0) recovers (make_inference_fn, params) directly — the same
trick the reference relies on (RSR/train.py:403-408) — or a SAC pkl is
loaded straight.

``get_action`` reproduces the data-collection contract: every action is
appended to an action log file and the first six dims are scaled by 0.02
(ppo_inference.py:73-83) — these logs are the Step-1 inputs of the RSR
workflow.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class PolicyInference:
  """Loads a trained policy for hardware inference."""

  def __init__(
      self,
      ckpt_dir: str,
      env,
      algorithm: str = 'ppo',
      network_factory=None,
      action_log_path: Optional[str] = 'real_action.txt',
      action_scale: float = 0.02,
      seed: int = 42,
  ):
    self._action_log_path = action_log_path
    self._action_scale = action_scale
    self.rng = jax.random.PRNGKey(seed)

    if algorithm == 'ppo':
      from rsr_mjx_tpu.train import networks as ppo_networks
      from rsr_mjx_tpu.train import ppo

      network_factory = network_factory or functools.partial(
          ppo_networks.make_ppo_networks,
          policy_hidden_layer_sizes=(32, 32, 32, 32),
      )
      self.make_inference_fn, self.params, _ = ppo.train(
          environment=env,
          num_timesteps=0,
          episode_length=1200,
          normalize_observations=True,
          network_factory=network_factory,
          restore_checkpoint_path=ckpt_dir,
      )
    elif algorithm == 'sac':
      from rsr_mjx_tpu.train import sac, sac_networks

      network = (network_factory or sac_networks.make_sac_networks)(
          env.observation_size, env.action_size
      )
      self.params = sac.load_params(ckpt_dir)

      def make_inference_fn(params, deterministic=False):
        normalizer_params, policy_params = params

        def policy(obs, rng):
          from rsr_mjx_tpu.train import running_statistics

          obs_n = running_statistics.normalize(normalizer_params, obs)
          logits = network.policy_logits(policy_params, obs_n)
          if deterministic:
            return network.distribution.mode(logits), {}
          return network.distribution.sample(logits, rng), {}

        return policy

      self.make_inference_fn = make_inference_fn
    else:
      raise ValueError(f'unknown algorithm {algorithm!r}')

    self._jit_policies = {}

  def get_action(
      self, observation: jnp.ndarray, deterministic: bool = True
  ) -> np.ndarray:
    """Policy action scaled for hardware; logs the raw action."""
    if deterministic not in self._jit_policies:
      self._jit_policies[deterministic] = jax.jit(
          self.make_inference_fn(self.params, deterministic=deterministic)
      )
    act_rng, self.rng = jax.random.split(self.rng)
    action, _ = self._jit_policies[deterministic](observation, act_rng)
    action = np.asarray(action)
    if self._action_log_path:
      with open(self._action_log_path, 'a') as f:
        np.savetxt(f, action.reshape(1, -1), fmt='%.6f', delimiter=',')
    return action[:6] * self._action_scale
