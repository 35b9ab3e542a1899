"""On-device uniform-sampling ring replay buffer.

Native equivalent of the brax UniformSamplingQueue the reference SAC loop
relies on (SURVEY §3.3: on-device uniform replay, min 100k / max 1M).
Stored as a pytree of (capacity, ...) arrays so insert/sample are pure
scatter/gather ops that live entirely in device memory; per-device buffers
shard the env axis naturally under the training mesh.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayBufferState:
  data: Any  # pytree of (capacity, ...) arrays
  insert_position: jax.Array  # ()
  size: jax.Array  # ()
  key: jax.Array


def init(capacity: int, dummy_item: Any, key: jax.Array) -> ReplayBufferState:
  """Allocate a buffer shaped like ``dummy_item`` (no leading axis)."""
  data = jax.tree.map(
      lambda x: jnp.zeros((capacity,) + jnp.shape(x), jnp.asarray(x).dtype),
      dummy_item,
  )
  return ReplayBufferState(
      data=data,
      insert_position=jnp.zeros((), jnp.int32),
      size=jnp.zeros((), jnp.int32),
      key=key,
  )


def insert(state: ReplayBufferState, batch: Any) -> ReplayBufferState:
  """Insert a batch (leading axis B) circularly."""
  leaves = jax.tree.leaves(batch)
  b = leaves[0].shape[0]
  capacity = jax.tree.leaves(state.data)[0].shape[0]
  idx = (state.insert_position + jnp.arange(b)) % capacity
  data = jax.tree.map(
      lambda buf, x: buf.at[idx].set(x), state.data, batch
  )
  return state.replace(
      data=data,
      insert_position=(state.insert_position + b) % capacity,
      size=jnp.minimum(state.size + b, capacity),
  )


def sample(
    state: ReplayBufferState, num_samples: int
) -> Tuple[ReplayBufferState, Any]:
  """Uniform sample with replacement from the filled region."""
  key, sample_key = jax.random.split(state.key)
  idx = jax.random.randint(
      sample_key, (num_samples,), 0, jnp.maximum(state.size, 1)
  )
  batch = jax.tree.map(lambda buf: buf[idx], state.data)
  return state.replace(key=key), batch
