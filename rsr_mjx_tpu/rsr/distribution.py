"""Distribution-matching primitives for the RSR objective.

Math follows the reference semantics exactly (RSR/dataset_processor.py:17-43):
Gaussian-kernel KDE evaluated in log space with a logsumexp followed by a
softmax normalization over the grid (the log-space path avoids the underflow
NaNs the reference documents for high-dimensional transition vectors), a
discrete KL divergence, and a 1-D Wasserstein distance via cumulative sums.

TPU notes: evaluate_kde is one (M, N, D) broadcast reduced to (M, N) — for
the RSR workload (M=10 grid points, N≤50+batch transitions, D≈51) this is a
single fused elementwise+reduction kernel under XLA, evaluated inside the
actor loss.  The pairwise term is expanded as ‖g‖² − 2·g·xᵀ + ‖x‖² so the
cross term is a (M, D)×(D, N) matmul on the MXU instead of an (M, N, D)
broadcast through HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def evaluate_kde(
    data: jax.Array, grid: jax.Array, bandwidth: float = 0.1
) -> jax.Array:
  """Normalized KDE probabilities of ``data`` (N, D) on ``grid`` (M, D)."""
  # squared distances via the matmul expansion (MXU-friendly)
  g2 = jnp.sum(grid * grid, axis=-1, keepdims=True)  # (M, 1)
  x2 = jnp.sum(data * data, axis=-1)[None, :]  # (1, N)
  cross = grid @ data.T  # (M, N) matmul
  sq = g2 - 2.0 * cross + x2
  log_kernel_vals = -sq / (2.0 * bandwidth**2)
  log_pdf = jax.scipy.special.logsumexp(log_kernel_vals, axis=-1) - jnp.log(
      data.shape[0]
  )
  return jax.nn.softmax(log_pdf)


def kl_divergence(p: jax.Array, q: jax.Array) -> jax.Array:
  """Discrete KL divergence (reference: dataset_processor.py:37-39)."""
  return jnp.sum(p * jnp.log((p + 1e-10) / (q + 1e-10)))


def wasserstein_distance(p: jax.Array, q: jax.Array) -> jax.Array:
  """1-D Wasserstein via |cumsum(p) − cumsum(q)| (dataset_processor.py:41-43)."""
  return jnp.sum(jnp.abs(jnp.cumsum(p) - jnp.cumsum(q)))


def load_dataset_from_path(path):
  """npz loader returning (states, actions, next_states)
  (dataset_processor.py:10-14)."""
  loaded = np.load(path, allow_pickle=True)
  return (
      np.array(loaded['states']),
      np.array(loaded['actions']),
      np.array(loaded['next_states']),
  )
