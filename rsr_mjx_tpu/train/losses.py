"""PPO loss with the RSR penalty as a first-class term.

Semantics mirror the reference fork of the brax PPO loss
(RSR/losses.py:39-205): GAE via a reverse scan with truncation masking,
clipped surrogate + 0.25·value error + entropy bonus, plus the RSR
distribution penalty evaluated on the MODE of the current policy (the
rollout action is constant w.r.t. params and would have zero gradient —
RSR/losses.py:186-193).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rsr_mjx_tpu.rsr import loss as rsr
from rsr_mjx_tpu.train import running_statistics
from rsr_mjx_tpu.train.networks import PPONetworks


class Transition(NamedTuple):
  """One env transition; leading dims [B, T] in the loss."""

  observation: jax.Array
  action: jax.Array  # postprocessed (tanh-squashed) action
  reward: jax.Array
  discount: jax.Array  # 1 - done
  next_observation: jax.Array
  extras: Dict[str, Any]  # {'state_extras': {...}, 'policy_extras': {...}}


def compute_gae(
    truncation: jax.Array,
    termination: jax.Array,
    rewards: jax.Array,
    values: jax.Array,
    bootstrap_value: jax.Array,
    lambda_: float = 1.0,
    discount: float = 0.99,
):
  """Generalized advantage estimation over [T, B] (RSR/losses.py:39-95)."""
  truncation_mask = 1 - truncation
  values_t_plus_1 = jnp.concatenate(
      [values[1:], jnp.expand_dims(bootstrap_value, 0)], axis=0
  )
  deltas = rewards + discount * (1 - termination) * values_t_plus_1 - values
  deltas *= truncation_mask

  acc = jnp.zeros_like(bootstrap_value)

  def body(carry, target_t):
    acc = carry
    truncation_mask, delta, termination = target_t
    acc = delta + discount * (1 - termination) * truncation_mask * lambda_ * acc
    return acc, acc

  _, vs_minus_v_xs = jax.lax.scan(
      body,
      acc,
      (truncation_mask, deltas, termination),
      length=int(truncation_mask.shape[0]),
      reverse=True,
  )
  vs = vs_minus_v_xs + values
  vs_t_plus_1 = jnp.concatenate(
      [vs[1:], jnp.expand_dims(bootstrap_value, 0)], axis=0
  )
  advantages = (
      rewards + discount * (1 - termination) * vs_t_plus_1 - values
  ) * truncation_mask
  return jax.lax.stop_gradient(vs), jax.lax.stop_gradient(advantages)


def compute_ppo_loss(
    params: Dict[str, Any],
    normalizer_params: running_statistics.RunningStatisticsState,
    data: Transition,
    rng: jax.Array,
    past_data: Any,
    ppo_network: PPONetworks,
    entropy_cost: float = 1e-4,
    discounting: float = 0.9,
    reward_scaling: float = 1.0,
    gae_lambda: float = 0.95,
    clipping_epsilon: float = 0.3,
    normalize_advantage: bool = True,
    rsr_loss_scale: float = 1.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
  """PPO loss over a [B, T] transition batch (RSR/losses.py:98-205)."""
  dist = ppo_network.distribution
  # time-major
  data = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), data)
  obs = running_statistics.normalize(normalizer_params, data.observation)
  policy_logits = ppo_network.policy_logits(params, obs)
  baseline = ppo_network.value_apply(params, obs)
  nobs_last = running_statistics.normalize(
      normalizer_params,
      jax.tree.map(lambda x: x[-1], data.next_observation),
  )
  bootstrap_value = ppo_network.value_apply(params, nobs_last)

  rewards = data.reward * reward_scaling
  truncation = data.extras['state_extras']['truncation']
  termination = (1 - data.discount) * (1 - truncation)

  target_action_log_probs = dist.log_prob(
      policy_logits, data.extras['policy_extras']['raw_action']
  )
  behaviour_action_log_probs = data.extras['policy_extras']['log_prob']

  vs, advantages = compute_gae(
      truncation=truncation,
      termination=termination,
      rewards=rewards,
      values=baseline,
      bootstrap_value=bootstrap_value,
      lambda_=gae_lambda,
      discount=discounting,
  )
  if normalize_advantage:
    advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
  rho_s = jnp.exp(target_action_log_probs - behaviour_action_log_probs)

  surrogate_loss1 = rho_s * advantages
  surrogate_loss2 = (
      jnp.clip(rho_s, 1 - clipping_epsilon, 1 + clipping_epsilon) * advantages
  )
  policy_loss = -jnp.mean(jnp.minimum(surrogate_loss1, surrogate_loss2))

  v_error = vs - baseline
  v_loss = jnp.mean(v_error * v_error) * 0.5 * 0.5

  entropy = jnp.mean(dist.entropy(policy_logits, rng))
  entropy_loss = entropy_cost * -entropy

  task_loss = policy_loss + v_loss + entropy_loss

  # RSR term on the current policy's mode action (RSR/losses.py:186-193).
  # With dict observations the transition vector uses the policy's obs key.
  current_policy_actions = dist.mode(policy_logits)
  rsr_obs = data.observation
  rsr_nobs = data.next_observation
  if isinstance(rsr_obs, dict):
    rsr_obs = rsr_obs[ppo_network.policy_obs_key]
    rsr_nobs = rsr_nobs[ppo_network.policy_obs_key]
  sim2real_loss, distribution_distance = rsr.compute_rsr_loss(
      rsr_obs,
      current_policy_actions,
      rsr_nobs,
      past_data,
      loss_scale=rsr_loss_scale,
  )

  total_loss = task_loss + sim2real_loss
  return total_loss, {
      'total_loss': total_loss,
      'task_loss': task_loss,
      'policy_loss': policy_loss,
      'v_loss': v_loss,
      'entropy_loss': entropy_loss,
      'sim2real_loss': sim2real_loss,
      'rsr_distribution_distance': distribution_distance,
  }
