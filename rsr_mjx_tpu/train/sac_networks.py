"""SAC networks: tanh-normal policy + twin Q critics.

Native equivalent of brax sac_networks (used via network_factory in the
reference, test/rsr_policy_training.py:267-270, locomotion_params.py SAC
configs)."""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from rsr_mjx_tpu.train.networks import MLP, NormalTanhDistribution


@dataclasses.dataclass(frozen=True)
class SACNetworks:
  policy: MLP
  q_mlps: Sequence[MLP]  # n_critics independent critics
  distribution: NormalTanhDistribution
  obs_size: int
  action_size: int

  def init(self, rng: jax.Array):
    kp, *kqs = jax.random.split(rng, 1 + len(self.q_mlps))
    return {
        'policy': self.policy.init(kp, self.obs_size),
        'q': [
            q.init(k, self.obs_size + self.action_size)
            for q, k in zip(self.q_mlps, kqs)
        ],
    }

  def policy_logits(self, policy_params, obs):
    return self.policy.apply(policy_params, obs)

  def q_values(self, q_params, obs, action):
    """(..., n_critics) Q estimates."""
    x = jnp.concatenate([obs, action], axis=-1)
    qs = [
        jnp.squeeze(q.apply(p, x), axis=-1)
        for q, p in zip(self.q_mlps, q_params)
    ]
    return jnp.stack(qs, axis=-1)


def make_sac_networks(
    obs_size: int,
    action_size: int,
    hidden_layer_sizes: Sequence[int] = (256, 256),
    activation=jax.nn.relu,
    n_critics: int = 2,
) -> SACNetworks:
  dist = NormalTanhDistribution(event_size=action_size)
  policy = MLP(tuple(hidden_layer_sizes) + (dist.param_size(),), activation)
  qs = [
      MLP(tuple(hidden_layer_sizes) + (1,), activation)
      for _ in range(n_critics)
  ]
  return SACNetworks(policy, tuple(qs), dist, obs_size, action_size)
