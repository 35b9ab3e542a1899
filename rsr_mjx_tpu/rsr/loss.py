"""RSR transition-distribution penalty (reference: RSR/rsr_loss.py).

``RSRData`` precomputes the fixed statistics once on the host; the penalty
itself is evaluated on-device inside the actor loss.  The online actions
MUST come from the policy being optimized — actions from a rollout buffer
make the term constant w.r.t. the actor parameters and kill the gradient
(reference docstring, rsr_loss.py:1-7).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rsr_mjx_tpu.rsr import distribution as dp


class RSRData(NamedTuple):
  """Precomputed real/sim distribution statistics (rsr_loss.py:17-24)."""

  divergence: jnp.ndarray  # KL(real ‖ previous-sim), a fixed scalar weight
  reference_density: jnp.ndarray  # KDE of current-sim data on the grid
  reference_data: jnp.ndarray  # current-sim transitions (N, D)
  grid: jnp.ndarray  # (M, D) random evaluation grid
  bandwidth: float


def make_grid(
    num_samples: int,
    dimension: int,
    min_value: float = -3.0,
    max_value: float = 3.0,
    seed: int = 0,
) -> jnp.ndarray:
  """Deterministic uniform random grid (rsr_loss.py:27-40)."""
  return jax.random.uniform(
      jax.random.PRNGKey(seed),
      (num_samples, dimension),
      minval=min_value,
      maxval=max_value,
  )


def build_rsr_data(
    real_data: jnp.ndarray,
    previous_sim_data: jnp.ndarray,
    current_sim_data: jnp.ndarray,
    *,
    num_samples: int = 10,
    min_value: float = -3.0,
    max_value: float = 3.0,
    bandwidth: float = 0.1,
    seed: int = 0,
) -> RSRData:
  """Precompute the fixed part of the objective (rsr_loss.py:43-91)."""
  if real_data.ndim != 2:
    raise ValueError(f'real_data must be rank 2, got shape {real_data.shape}')
  if previous_sim_data.shape != real_data.shape:
    raise ValueError(
        'previous_sim_data must match real_data: '
        f'{previous_sim_data.shape} != {real_data.shape}'
    )
  if current_sim_data.shape != real_data.shape:
    raise ValueError(
        'current_sim_data must match real_data: '
        f'{current_sim_data.shape} != {real_data.shape}'
    )
  if num_samples <= 0:
    raise ValueError(f'num_samples must be positive, got {num_samples}')
  if bandwidth <= 0:
    raise ValueError(f'bandwidth must be positive, got {bandwidth}')

  grid = make_grid(
      num_samples,
      real_data.shape[-1],
      min_value=min_value,
      max_value=max_value,
      seed=seed,
  )
  real_density = dp.evaluate_kde(real_data, grid, bandwidth)
  previous_sim_density = dp.evaluate_kde(previous_sim_data, grid, bandwidth)
  reference_density = dp.evaluate_kde(current_sim_data, grid, bandwidth)
  divergence = dp.kl_divergence(real_density, previous_sim_density)
  return RSRData(
      divergence=divergence,
      reference_density=reference_density,
      reference_data=current_sim_data,
      grid=grid,
      bandwidth=bandwidth,
  )


def _as_rsr_data(past_data: Any) -> RSRData:
  """Accept RSRData, a 5-tuple, or the legacy 3-tuple (rsr_loss.py:94-119)."""
  if isinstance(past_data, RSRData):
    return past_data
  if not isinstance(past_data, (tuple, list)):
    raise TypeError('past_data must be RSRData or a tuple/list')
  if len(past_data) == 5:
    return RSRData(*past_data)
  if len(past_data) != 3:
    raise ValueError(
        'legacy past_data must contain (KLD, density, reference_data)'
    )
  divergence, reference_density, reference_data = past_data
  grid = make_grid(
      int(reference_density.shape[0]), int(reference_data.shape[-1])
  )
  return RSRData(
      divergence=divergence,
      reference_density=reference_density,
      reference_data=reference_data,
      grid=grid,
      bandwidth=0.1,
  )


def compute_rsr_loss(
    observations: jnp.ndarray,
    policy_actions: jnp.ndarray,
    next_observations: jnp.ndarray,
    past_data: Any,
    *,
    loss_scale: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """RSR penalty = loss_scale · KL(real‖prev-sim) · W(current, reference)
  over the augmented (reference + online) transition KDE
  (rsr_loss.py:122-175).  Returns (scaled_loss, distribution_distance)."""
  if past_data is None or loss_scale == 0.0:
    zero = jnp.asarray(0.0, dtype=observations.dtype)
    return zero, zero

  rsr_data = _as_rsr_data(past_data)
  obs_size = observations.shape[-1]
  act_size = policy_actions.shape[-1]
  nobs_size = next_observations.shape[-1]

  current_data = jnp.concatenate(
      [
          jnp.reshape(observations, (-1, obs_size)),
          jnp.reshape(policy_actions, (-1, act_size)),
          jnp.reshape(next_observations, (-1, nobs_size)),
      ],
      axis=-1,
  )
  if current_data.shape[-1] != rsr_data.reference_data.shape[-1]:
    raise ValueError(
        'online transition width does not match RSR reference data: '
        f'{current_data.shape[-1]} != {rsr_data.reference_data.shape[-1]}'
    )

  augmented = jnp.concatenate(
      [rsr_data.reference_data, current_data], axis=0
  )
  current_density = dp.evaluate_kde(
      augmented, rsr_data.grid, rsr_data.bandwidth
  )
  distance = dp.wasserstein_distance(
      current_density, rsr_data.reference_density
  )
  loss = jnp.asarray(loss_scale, dtype=distance.dtype)
  loss *= rsr_data.divergence * distance
  return loss, distance
