"""Running observation normalization statistics.

Native equivalent of brax/acme running_statistics used by the reference
trainer (RSR/train.py:240-244, :333-336).  The update is a batched Welford
accumulation; under a device mesh the batch moments are averaged with
``jax.lax.pmean`` over the data axis so every replica holds identical
statistics (reference: pmap_axis_name='i' plumbing).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class RunningStatisticsState:
  """All fields except count are pytrees matching the observation
  structure — a plain array for array obs, a dict of arrays for dict obs
  (Go2's {'state', 'privileged_state'})."""

  count: jax.Array  # ()
  mean: Any  # obs-shaped pytree
  summed_variance: Any
  std: Any


def init_state(obs_size) -> RunningStatisticsState:
  """``obs_size`` is an int or a pytree of ints/shape-tuples."""

  def _zeros(n):
    n = n[-1] if isinstance(n, (tuple, list)) else n
    return jnp.zeros(n)

  def _ones(n):
    n = n[-1] if isinstance(n, (tuple, list)) else n
    return jnp.ones(n)

  if isinstance(obs_size, dict):
    mean = {k: _zeros(v) for k, v in obs_size.items()}
    var = {k: _zeros(v) for k, v in obs_size.items()}
    std = {k: _ones(v) for k, v in obs_size.items()}
  else:
    mean, var, std = _zeros(obs_size), _zeros(obs_size), _ones(obs_size)
  return RunningStatisticsState(
      count=jnp.zeros(()), mean=mean, summed_variance=var, std=std
  )


def update(
    state: RunningStatisticsState,
    batch: Any,
    pmap_axis_name: Optional[str] = None,
) -> RunningStatisticsState:
  """Welford update over all leading axes of every leaf of ``batch``."""
  leaves = jax.tree.leaves(batch)
  obs_size = leaves[0].shape[-1]
  local_count = jnp.asarray(
      np.prod(leaves[0].shape[:-1]) if leaves[0].ndim > 1 else 1,
      dtype=jnp.float32,
  )
  if pmap_axis_name is not None:
    num_replicas = jax.lax.psum(1, axis_name=pmap_axis_name)
  else:
    num_replicas = 1
  count = state.count + local_count * num_replicas

  def _mean_update(mean, x):
    flat = x.reshape(-1, x.shape[-1])
    mu = jnp.sum(flat - mean, axis=0) / count
    if pmap_axis_name is not None:
      mu = jax.lax.psum(mu, axis_name=pmap_axis_name)
    return mean + mu

  mean = jax.tree.map(_mean_update, state.mean, batch)

  def _var_update(var, old_mean, new_mean, x):
    flat = x.reshape(-1, x.shape[-1])
    vu = jnp.sum((flat - old_mean) * (flat - new_mean), axis=0)
    if pmap_axis_name is not None:
      vu = jax.lax.psum(vu, axis_name=pmap_axis_name)
    return var + vu

  summed_variance = jax.tree.map(
      _var_update, state.summed_variance, state.mean, mean, batch
  )
  # The Welford cross-term Σ(x−m_old)(x−m_new) is ≥ 0 analytically but can
  # come out slightly NEGATIVE in f32 for a near-constant dimension — the
  # cancellation depends on XLA's reduction order, so the same update that
  # is fine standalone can produce v/count < −1e-6 inside a large fused
  # training program, and sqrt() then yields NaN that poisons the
  # normalizer → logits → loss → every parameter within one minibatch
  # (round-4 diagnosis of the round-3 "all-NaN from epoch 1" failure).
  # Clamp at zero: exact-zero variance dims normalize by sqrt(1e-6).
  summed_variance = jax.tree.map(
      lambda v: jnp.maximum(v, 0.0), summed_variance
  )
  std = jax.tree.map(
      lambda v: jnp.sqrt(v / jnp.maximum(count, 1.0) + 1e-6),
      summed_variance,
  )
  return RunningStatisticsState(
      count=count, mean=mean, summed_variance=summed_variance, std=std
  )


def normalize(state: RunningStatisticsState, batch: Any) -> Any:
  return jax.tree.map(
      lambda x, m, s: (x - m) / s, batch, state.mean, state.std
  )


def denormalize(state: RunningStatisticsState, batch: Any) -> Any:
  return jax.tree.map(
      lambda x, m, s: x * s + m, batch, state.mean, state.std
  )
