"""Policy/value networks and action distributions.

Native equivalents of the brax network stack the reference trainers build
(RSR/train.py:237-246 uses brax ppo_networks with MLPs and a
NormalTanhDistribution).  Small MLPs over fixed-size observations: under
vmap these become large batched GEMMs that tile onto the TPU MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ActivationFn = Callable[[jax.Array], jax.Array]
Params = Any


# ---------------------------------------------------------------------------
# MLP
# ---------------------------------------------------------------------------


def _lecun_uniform(rng, shape, dtype=jnp.float32):
  fan_in = shape[0]
  scale = jnp.sqrt(3.0 / fan_in)
  return jax.random.uniform(rng, shape, dtype, minval=-scale, maxval=scale)


@dataclasses.dataclass(frozen=True)
class MLP:
  """Plain MLP: hidden layers + linear head."""

  layer_sizes: Sequence[int]
  activation: ActivationFn = jax.nn.swish
  activate_final: bool = False
  bias: bool = True

  def init(self, rng: jax.Array, obs_size: int) -> Params:
    sizes = (obs_size,) + tuple(self.layer_sizes)
    keys = jax.random.split(rng, len(self.layer_sizes))
    params = []
    for i, key in enumerate(keys):
      w = _lecun_uniform(key, (sizes[i], sizes[i + 1]))
      b = jnp.zeros(sizes[i + 1])
      params.append({'w': w, 'b': b} if self.bias else {'w': w})
    return params

  def apply(self, params: Params, x: jax.Array) -> jax.Array:
    n = len(self.layer_sizes)
    for i, layer in enumerate(params):
      x = x @ layer['w']
      if self.bias:
        x = x + layer['b']
      if i < n - 1 or self.activate_final:
        x = self.activation(x)
    return x


# ---------------------------------------------------------------------------
# Tanh-normal distribution (brax NormalTanhDistribution semantics)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class NormalTanhDistribution:
  """Normal with softplus std, squashed by tanh."""

  event_size: int
  min_std: float = 0.001
  var_scale: float = 1.0

  def param_size(self) -> int:
    return 2 * self.event_size

  def _loc_scale(self, params: jax.Array):
    loc, raw = jnp.split(params, 2, axis=-1)
    scale = (jax.nn.softplus(raw) + self.min_std) * self.var_scale
    return loc, scale

  def sample_no_postprocess(self, params: jax.Array, rng: jax.Array):
    loc, scale = self._loc_scale(params)
    return loc + scale * jax.random.normal(rng, loc.shape)

  def sample(self, params: jax.Array, rng: jax.Array):
    return jnp.tanh(self.sample_no_postprocess(params, rng))

  def mode(self, params: jax.Array):
    loc, _ = self._loc_scale(params)
    return jnp.tanh(loc)

  def log_prob(self, params: jax.Array, raw_actions: jax.Array):
    """log p of PRE-tanh actions incl. tanh change-of-variables."""
    loc, scale = self._loc_scale(params)
    log_unnormalized = -0.5 * jnp.square(raw_actions / scale - loc / scale)
    log_normalization = 0.5 * jnp.log(2.0 * jnp.pi) + jnp.log(scale)
    # density of y = tanh(x): log p_y = log p_x − log|dy/dx|
    log_det_jacobian = 2.0 * (
        jnp.log(2.0) - raw_actions - jax.nn.softplus(-2.0 * raw_actions)
    )
    return jnp.sum(
        log_unnormalized - log_normalization - log_det_jacobian, axis=-1
    )

  def postprocess(self, raw_actions: jax.Array):
    return jnp.tanh(raw_actions)

  def entropy(self, params: jax.Array, rng: jax.Array):
    """Entropy estimate incl. tanh jacobian at a sample (brax semantics)."""
    loc, scale = self._loc_scale(params)
    entropy = 0.5 + 0.5 * jnp.log(2.0 * jnp.pi) + jnp.log(scale)
    raw = loc + scale * jax.random.normal(rng, loc.shape)
    log_det_jacobian = 2.0 * (
        jnp.log(2.0) - raw - jax.nn.softplus(-2.0 * raw)
    )
    return jnp.sum(entropy + log_det_jacobian, axis=-1)


# ---------------------------------------------------------------------------
# PPO network bundle
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PPONetworks:
  """PPO networks.  Supports dict observations with separate policy/value
  keys — the asymmetric actor-critic the Go2 configs use (policy on
  'state', value on 'privileged_state', locomotion_params.py:30-39)."""

  policy: MLP
  value: MLP
  distribution: NormalTanhDistribution
  obs_size: Any  # int or {key: size}
  action_size: int
  policy_obs_key: str = 'state'
  value_obs_key: str = 'state'

  def _sizes(self):
    def last(s):
      return s[-1] if isinstance(s, (tuple, list)) else s

    if isinstance(self.obs_size, dict):
      return (
          last(self.obs_size[self.policy_obs_key]),
          last(self.obs_size[self.value_obs_key]),
      )
    return last(self.obs_size), last(self.obs_size)

  def init(self, rng: jax.Array):
    kp, kv = jax.random.split(rng)
    p_size, v_size = self._sizes()
    return {
        'policy': self.policy.init(kp, p_size),
        'value': self.value.init(kv, v_size),
    }

  def policy_logits(self, params, obs):
    if isinstance(obs, dict):
      obs = obs[self.policy_obs_key]
    return self.policy.apply(params['policy'], obs)

  def value_apply(self, params, obs):
    if isinstance(obs, dict):
      obs = obs[self.value_obs_key]
    return jnp.squeeze(self.value.apply(params['value'], obs), axis=-1)


def make_ppo_networks(
    obs_size,
    action_size: int,
    policy_hidden_layer_sizes: Sequence[int] = (32, 32, 32, 32),
    value_hidden_layer_sizes: Sequence[int] = (256, 256, 256, 256, 256),
    activation: ActivationFn = jax.nn.swish,
    policy_obs_key: str = 'state',
    value_obs_key: str = 'state',
) -> PPONetworks:
  """Mirror of brax ppo_networks.make_ppo_networks defaults
  (network factory usage: test/rsr_policy_training.py:260-266)."""
  dist = NormalTanhDistribution(event_size=action_size)
  policy = MLP(
      tuple(policy_hidden_layer_sizes) + (dist.param_size(),), activation
  )
  value = MLP(tuple(value_hidden_layer_sizes) + (1,), activation)
  return PPONetworks(
      policy, value, dist, obs_size, action_size,
      policy_obs_key, value_obs_key,
  )


def make_inference_fn(networks: PPONetworks, normalizer=None):
  """Returns make_policy(params, deterministic) -> policy(obs, rng)."""

  def make_policy(params, deterministic: bool = False):
    normalizer_params, net_params = params

    def policy(obs: jax.Array, rng: jax.Array):
      if normalizer is not None:
        obs = normalizer(normalizer_params, obs)
      logits = networks.policy_logits(net_params, obs)
      if deterministic:
        return networks.distribution.mode(logits), {}
      if rng.ndim == 2:
        # per-env keys (rng (B, 2)): each env draws from its own stream,
        # making rollout noise independent of the device/batch layout —
        # the property behind dryrun_multichip's 1-vs-N equivalence
        # assert (shard_map-era pmap.assert_is_replicated analogue).
        raw = jax.vmap(networks.distribution.sample_no_postprocess)(
            logits, rng
        )
      else:
        raw = networks.distribution.sample_no_postprocess(logits, rng)
      log_prob = networks.distribution.log_prob(logits, raw)
      actions = networks.distribution.postprocess(raw)
      return actions, {'log_prob': log_prob, 'raw_action': raw}

    return policy

  return make_policy
