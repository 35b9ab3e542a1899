"""SAC losses with the RSR penalty on the actor objective.

Equations mirror the reference exactly (RSR/sac_losses.py:23-130, itself
brax 0.12.1 semantics): temperature loss vs target entropy −0.5·|A|,
twin-Q Bellman loss with truncation masking, actor loss
α·logπ − min(Q) + RSR on the freshly sampled postprocessed action.
Unlike the reference's module-swap injection (sac_train.py:104-123), the
RSR data is a plain argument.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from rsr_mjx_tpu.rsr import loss as rsr
from rsr_mjx_tpu.train import running_statistics
from rsr_mjx_tpu.train.sac_networks import SACNetworks


def make_losses(
    sac_network: SACNetworks,
    reward_scaling: float,
    discounting: float,
    action_size: int,
    *,
    normalize_fn=running_statistics.normalize,
    past_data: Any = None,
    rsr_loss_scale: float = 1.0,
):
  target_entropy = -0.5 * action_size
  dist = sac_network.distribution

  def alpha_loss(log_alpha, policy_params, normalizer_params, transitions,
                 key):
    """Temperature loss (SAC eq. 18; sac_losses.py:38-53)."""
    obs = normalize_fn(normalizer_params, transitions.observation)
    dist_params = sac_network.policy_logits(policy_params, obs)
    raw_action = dist.sample_no_postprocess(dist_params, key)
    log_prob = dist.log_prob(dist_params, raw_action)
    alpha = jnp.exp(log_alpha)
    loss = alpha * jax.lax.stop_gradient(-log_prob - target_entropy)
    return jnp.mean(loss)

  def critic_loss(q_params, policy_params, normalizer_params, target_q_params,
                  alpha, transitions, key):
    """Twin-Q Bellman loss (sac_losses.py:55-96)."""
    obs = normalize_fn(normalizer_params, transitions.observation)
    nobs = normalize_fn(normalizer_params, transitions.next_observation)
    old_q = sac_network.q_values(q_params, obs, transitions.action)
    next_dist_params = sac_network.policy_logits(policy_params, nobs)
    next_raw = dist.sample_no_postprocess(next_dist_params, key)
    next_log_prob = dist.log_prob(next_dist_params, next_raw)
    next_action = dist.postprocess(next_raw)
    next_q = sac_network.q_values(target_q_params, nobs, next_action)
    next_value = jnp.min(next_q, axis=-1) - alpha * next_log_prob
    target_q = jax.lax.stop_gradient(
        transitions.reward * reward_scaling
        + transitions.discount * discounting * next_value
    )
    q_error = old_q - jnp.expand_dims(target_q, -1)
    truncation = transitions.extras['state_extras']['truncation']
    q_error *= jnp.expand_dims(1 - truncation, -1)
    return 0.5 * jnp.mean(jnp.square(q_error))

  def actor_loss(policy_params, normalizer_params, q_params, alpha,
                 transitions, key):
    """α·logπ − min(Q) + RSR penalty (sac_losses.py:98-128)."""
    obs = normalize_fn(normalizer_params, transitions.observation)
    dist_params = sac_network.policy_logits(policy_params, obs)
    raw_action = dist.sample_no_postprocess(dist_params, key)
    log_prob = dist.log_prob(dist_params, raw_action)
    action = dist.postprocess(raw_action)
    q_action = sac_network.q_values(q_params, obs, action)
    base = jnp.mean(alpha * log_prob - jnp.min(q_action, axis=-1))
    sim2real_loss, _ = rsr.compute_rsr_loss(
        transitions.observation,
        action,
        transitions.next_observation,
        past_data,
        loss_scale=rsr_loss_scale,
    )
    return base + sim2real_loss

  return alpha_loss, critic_loss, actor_loss
