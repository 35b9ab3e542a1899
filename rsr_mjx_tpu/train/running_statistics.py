"""Running observation normalization statistics.

Native equivalent of brax/acme running_statistics used by the reference
trainer (RSR/train.py:240-244, :333-336).  The update is a batched Welford
accumulation; under a device mesh the batch moments are averaged with
``jax.lax.pmean`` over the data axis so every replica holds identical
statistics (reference: pmap_axis_name='i' plumbing).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningStatisticsState:
  count: jax.Array  # ()
  mean: jax.Array  # (obs_size,)
  summed_variance: jax.Array  # (obs_size,)
  std: jax.Array  # (obs_size,)


def init_state(obs_size: int) -> RunningStatisticsState:
  return RunningStatisticsState(
      count=jnp.zeros(()),
      mean=jnp.zeros(obs_size),
      summed_variance=jnp.zeros(obs_size),
      std=jnp.ones(obs_size),
  )


def update(
    state: RunningStatisticsState,
    batch: jax.Array,
    pmap_axis_name: Optional[str] = None,
) -> RunningStatisticsState:
  """Welford update over all leading axes of ``batch``."""
  obs_size = batch.shape[-1]
  flat = batch.reshape(-1, obs_size)
  local_count = jnp.asarray(flat.shape[0], dtype=jnp.float32)
  if pmap_axis_name is not None:
    num_replicas = jax.lax.psum(1, axis_name=pmap_axis_name)
  else:
    num_replicas = 1
  batch_count = local_count * num_replicas

  count = state.count + batch_count
  diff_to_old = flat - state.mean
  mean_update = jnp.sum(diff_to_old, axis=0) / count
  if pmap_axis_name is not None:
    mean_update = jax.lax.psum(mean_update, axis_name=pmap_axis_name)
  mean = state.mean + mean_update

  diff_to_new = flat - mean
  var_update = jnp.sum(diff_to_old * diff_to_new, axis=0)
  if pmap_axis_name is not None:
    var_update = jax.lax.psum(var_update, axis_name=pmap_axis_name)
  summed_variance = state.summed_variance + var_update

  std = jnp.sqrt(summed_variance / jnp.maximum(count, 1.0) + 1e-6)
  return RunningStatisticsState(
      count=count, mean=mean, summed_variance=summed_variance, std=std
  )


def normalize(
    state: RunningStatisticsState, batch: jax.Array
) -> jax.Array:
  return (batch - state.mean) / state.std


def denormalize(
    state: RunningStatisticsState, batch: jax.Array
) -> jax.Array:
  return batch * state.std + state.mean
