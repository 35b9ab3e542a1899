"""Quadruped gait utilities (reference: mujoco_playground/_src/gait.py).

Cubic-bezier swing-height profile and canonical gait phase offsets
(trot/walk/pace/bound/pronk) for gait-tracking rewards.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jp
import numpy as np


def get_rz(
    phi: Union[jax.Array, float],
    swing_height: Union[jax.Array, float] = 0.08,
) -> jax.Array:
  """Desired foot height at gait phase ``phi`` (gait.py:12-22)."""

  def cubic_bezier_interpolation(y_start, y_end, x):
    y_diff = y_end - y_start
    bezier = x**3 + 3 * (x**2 * (1 - x))
    return y_start + y_diff * bezier

  x = (phi + jp.pi) / (2 * jp.pi)
  stance = cubic_bezier_interpolation(0, swing_height, 2 * x)
  swing = cubic_bezier_interpolation(swing_height, 0, 2 * x - 1)
  return jp.where(x <= 0.5, stance, swing)


# foot phase offsets (FR, FL, RR, RL): trot, walk, pace, bound, pronk
GAIT_PHASES = {
    0: np.array([0, np.pi, np.pi, 0]),
    1: np.array([0, 0.5 * np.pi, np.pi, 1.5 * np.pi]),
    2: np.array([0, np.pi, 0, np.pi]),
    3: np.array([0, 0, np.pi, np.pi]),
    4: np.array([0, 0, 0, 0]),
}
