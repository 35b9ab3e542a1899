"""RSR transition-distribution penalty.

Implements the distribution-matching objective of the reference
(capability parity with RSR/rsr_loss.py): a fixed gain — the KL
divergence between the real and previous-sim transition densities —
multiplied by the 1-D Wasserstein distance between the current-sim
transition density and the density of that same data *augmented with the
online policy transitions*, all densities being grid-evaluated Gaussian
KDEs (rsr_mjx_tpu.rsr.distribution).

Redesign notes (round 5 — this file is a from-scratch restructure):

- The reference re-evaluates the full anchor-vs-grid kernel matrix inside
  every actor-loss call.  Here everything that depends only on the fixed
  datasets is folded into :class:`RSRData` at build time: the per-grid
  log-sum of the anchor kernels (``anchor_logsum``) and the target CDF of
  the anchor density (``target_cdf``).  The online evaluation then only
  computes the (grid × batch) kernel block and merges it with a single
  ``logaddexp`` — the softmax is shift-invariant, so dropping the
  ``-log(N)`` normalizer changes nothing.  Mathematically identical to
  evaluating the KDE of the concatenated (anchors + online) set, at
  O(M·B) instead of O(M·(N+B)) per loss evaluation.
- The reference's legacy 3-tuple ``past_data`` format is not supported:
  this framework's only producer of penalty state is
  :func:`build_rsr_data` (via ``rsr.pipeline.build_policy_rsr_data``).

The online actions MUST be produced by the policy being optimized:
actions replayed from a rollout/replay buffer make the penalty constant
w.r.t. the actor parameters and the policy gradient vanishes (the
property the reference documents, RSR/rsr_loss.py:1-7; regression-tested
in tests/test_train_ppo.py::test_rsr_loss_gradient_flows_through_actions).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rsr_mjx_tpu.rsr import distribution as dp


class RSRData(NamedTuple):
  """Everything the penalty needs that does not depend on online data."""

  weight: jax.Array        # KL(real ‖ previous-sim): fixed penalty gain
  grid: jax.Array          # (M, D) KDE evaluation points
  grid_sq: jax.Array       # (M,) ‖grid‖² rows, reused by the online block
  anchor_logsum: jax.Array  # (M,) logsumexp of current-sim anchor kernels
  target_cdf: jax.Array    # (M,) CDF of the current-sim anchor density
  n_anchors: int           # static anchor count
  width: int               # static transition width: obs + act + next_obs
  bandwidth: float         # Gaussian kernel bandwidth


def make_grid(
    num_samples: int,
    dimension: int,
    min_value: float = -3.0,
    max_value: float = 3.0,
    seed: int = 0,
) -> jax.Array:
  """Seed-deterministic uniform KDE evaluation grid.

  A random uniform grid over the (standardized) transition box is the
  reference's density support (RSR/rsr_loss.py make_grid) and is kept as
  the capability contract: the grid must be identical between the build
  phase and every loss evaluation, hence the fixed PRNGKey.
  """
  return jax.random.uniform(
      jax.random.PRNGKey(seed),
      (num_samples, dimension),
      minval=min_value,
      maxval=max_value,
  )


def _log_kernel_block(
    grid: jax.Array, grid_sq: jax.Array, points: jax.Array, bandwidth: float
) -> jax.Array:
  """(M, B) Gaussian log-kernels between grid rows and point rows.

  Squared distances use the ‖g‖² − 2 g·xᵀ + ‖x‖² expansion so the cross
  term is one MXU matmul (same layout as distribution.evaluate_kde).
  """
  pts_sq = jnp.sum(points * points, axis=-1)
  sq = grid_sq[:, None] - 2.0 * (grid @ points.T) + pts_sq[None, :]
  return -0.5 * sq / (bandwidth * bandwidth)


def _require_matrix(name: str, arr: jax.Array, like: Optional[jax.Array]):
  if arr.ndim != 2:
    raise ValueError(f'{name}: expected a (transitions, width) matrix, '
                     f'got shape {arr.shape}')
  if like is not None and arr.shape != like.shape:
    raise ValueError(f'{name}: shape {arr.shape} does not match the real '
                     f'dataset shape {like.shape}')


def build_rsr_data(
    real_data: jax.Array,
    previous_sim_data: jax.Array,
    current_sim_data: jax.Array,
    *,
    num_samples: int = 10,
    min_value: float = -3.0,
    max_value: float = 3.0,
    bandwidth: float = 0.1,
    seed: int = 0,
) -> RSRData:
  """Precompute the penalty state from the three fixed transition sets.

  ``real_data`` / ``previous_sim_data`` fix the KL gain; the
  ``current_sim_data`` rows become the KDE anchors the online transitions
  are merged into.  All three are (N, obs+act+obs') matrices of matching
  shape.
  """
  real_data = jnp.asarray(real_data)
  previous_sim_data = jnp.asarray(previous_sim_data)
  current_sim_data = jnp.asarray(current_sim_data)
  _require_matrix('real_data', real_data, None)
  _require_matrix('previous_sim_data', previous_sim_data, real_data)
  _require_matrix('current_sim_data', current_sim_data, real_data)
  if num_samples <= 0:
    raise ValueError(f'num_samples must be positive, got {num_samples}')
  if bandwidth <= 0:
    raise ValueError(f'bandwidth must be positive, got {bandwidth}')

  n_anchors, width = current_sim_data.shape
  grid = make_grid(num_samples, width, min_value=min_value,
                   max_value=max_value, seed=seed)
  grid_sq = jnp.sum(grid * grid, axis=-1)

  weight = dp.kl_divergence(
      dp.evaluate_kde(real_data, grid, bandwidth),
      dp.evaluate_kde(previous_sim_data, grid, bandwidth),
  )
  anchor_density = dp.evaluate_kde(current_sim_data, grid, bandwidth)
  anchor_logsum = jax.scipy.special.logsumexp(
      _log_kernel_block(grid, grid_sq, current_sim_data, bandwidth), axis=-1
  )
  return RSRData(
      weight=weight,
      grid=grid,
      grid_sq=grid_sq,
      anchor_logsum=anchor_logsum,
      target_cdf=jnp.cumsum(anchor_density),
      n_anchors=int(n_anchors),
      width=int(width),
      bandwidth=bandwidth,
  )


def compute_rsr_loss(
    observations: jax.Array,
    policy_actions: jax.Array,
    next_observations: jax.Array,
    past_data: Optional[RSRData],
    *,
    loss_scale: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
  """Penalty = loss_scale · KL(real‖prev-sim) · W(anchors+online, anchors).

  The three online tensors may carry any leading batch/time dims; rows
  are flattened into one transition batch.  ``past_data=None`` or
  ``loss_scale == 0`` short-circuits to zeros so trainers can keep the
  penalty as an always-present term.  Returns
  ``(scaled_loss, distribution_distance)``.
  """
  if past_data is None or loss_scale == 0.0:
    zero = jnp.zeros((), dtype=observations.dtype)
    return zero, zero
  if not isinstance(past_data, RSRData):
    raise TypeError(
        f'past_data must be RSRData or None, got {type(past_data)!r}; '
        'build it with rsr.build_rsr_data / rsr.pipeline.build_policy_rsr_data'
    )

  online = jnp.concatenate(
      [jnp.reshape(x, (-1, x.shape[-1]))
       for x in (observations, policy_actions, next_observations)],
      axis=-1,
  )
  if online.shape[-1] != past_data.width:
    raise ValueError(
        f'online transitions are {online.shape[-1]}-wide but the RSR '
        f'anchors were built {past_data.width}-wide — the policy obs/act '
        'layout must match the datasets the penalty was built from'
    )

  online_logsum = jax.scipy.special.logsumexp(
      _log_kernel_block(
          past_data.grid, past_data.grid_sq, online, past_data.bandwidth
      ),
      axis=-1,
  )
  # density of the anchor∪online set on the grid; softmax is invariant to
  # the dropped −log(n_anchors + B) normalizer
  density = jax.nn.softmax(
      jnp.logaddexp(past_data.anchor_logsum, online_logsum)
  )
  distance = jnp.sum(jnp.abs(jnp.cumsum(density) - past_data.target_cdf))
  penalty = jnp.asarray(loss_scale, distance.dtype) * past_data.weight
  return penalty * distance, distance
