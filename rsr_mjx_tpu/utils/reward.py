"""Shaped-reward utilities: dm_control-style ``tolerance``.

Native equivalent of the vendored playground port
(mujoco_playground/_src/reward.py:5-91): eight sigmoid shapes, 1.0 inside
the bounds, sigmoid falloff parameterized by (margin, value_at_margin).
"""

from __future__ import annotations

import jax.numpy as jp

_DEFAULT_VALUE_AT_MARGIN = 0.1


def _sigmoids(x, value_at_1, sigmoid):
  if sigmoid in ('cosine', 'linear', 'quadratic'):
    if not 0 <= value_at_1 < 1:
      raise ValueError(
          '`value_at_1` must be nonnegative and smaller than 1, got '
          f'{value_at_1}.'
      )
  else:
    if not 0 < value_at_1 < 1:
      raise ValueError(
          f'`value_at_1` must be strictly between 0 and 1, got '
          f'{value_at_1}.'
      )
  if sigmoid == 'gaussian':
    scale = jp.sqrt(-2 * jp.log(value_at_1))
    return jp.exp(-0.5 * (x * scale) ** 2)
  if sigmoid == 'hyperbolic':
    scale = jp.arccosh(1 / value_at_1)
    return 1 / jp.cosh(x * scale)
  if sigmoid == 'long_tail':
    scale = jp.sqrt(1 / value_at_1 - 1)
    return 1 / ((x * scale) ** 2 + 1)
  if sigmoid == 'reciprocal':
    scale = 1 / value_at_1 - 1
    return 1 / (abs(x) * scale + 1)
  if sigmoid == 'cosine':
    scale = jp.arccos(2 * value_at_1 - 1) / jp.pi
    scaled_x = x * scale
    return jp.where(
        abs(scaled_x) < 1, (1 + jp.cos(jp.pi * scaled_x)) / 2, 0.0
    )
  if sigmoid == 'linear':
    scaled_x = x * (1 - value_at_1)
    return jp.where(abs(scaled_x) < 1, 1 - scaled_x, 0.0)
  if sigmoid == 'quadratic':
    scaled_x = x * jp.sqrt(1 - value_at_1)
    return jp.where(abs(scaled_x) < 1, 1 - scaled_x**2, 0.0)
  if sigmoid == 'tanh_squared':
    scale = jp.arctanh(jp.sqrt(1 - value_at_1))
    return 1 - jp.tanh(x * scale) ** 2
  raise ValueError(f'Unknown sigmoid type {sigmoid!r}.')


def tolerance(
    x,
    bounds=(0.0, 0.0),
    margin: float = 0.0,
    sigmoid: str = 'gaussian',
    value_at_margin: float = _DEFAULT_VALUE_AT_MARGIN,
):
  """1.0 inside ``bounds``, sigmoid falloff outside (reward.py:51-91)."""
  lower, upper = bounds
  if lower > upper:
    raise ValueError('Lower bound must be <= upper bound.')
  if margin < 0:
    raise ValueError('`margin` must be non-negative.')
  in_bounds = jp.logical_and(lower <= x, x <= upper)
  if margin == 0:
    return jp.where(in_bounds, 1.0, 0.0)
  d = jp.where(x < lower, lower - x, x - upper) / margin
  return jp.where(in_bounds, 1.0, _sigmoids(d, value_at_margin, sigmoid))
