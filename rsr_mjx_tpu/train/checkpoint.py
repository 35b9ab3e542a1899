"""Orbax checkpointing helpers.

Mirrors the reference's save/restore surface: per-eval saves of
``(normalizer_params, params)`` via a PyTree checkpointer and
target-structured restore (RSR/train.py:410-422,
test/rsr_policy_training.py:230-234).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
from orbax import checkpoint as ocp


def save(path: str, params: Any) -> None:
  """Save a pytree checkpoint at ``path`` (overwrites)."""
  path = os.path.abspath(path)
  checkpointer = ocp.PyTreeCheckpointer()
  checkpointer.save(path, params, force=True)


def restore(path: str, target: Optional[Any] = None) -> Any:
  """Restore a pytree checkpoint; ``target`` supplies structure/dtypes."""
  path = os.path.abspath(path)
  checkpointer = ocp.PyTreeCheckpointer()
  if target is not None:
    return checkpointer.restore(path, item=target)
  return checkpointer.restore(path)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
  """Find the newest step-numbered checkpoint directory
  (train_jax_ppo.py:195-206 discovery semantics)."""
  if not os.path.isdir(ckpt_dir):
    return None
  candidates = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
  if not candidates:
    return None
  latest = max(candidates, key=int)
  return os.path.join(ckpt_dir, latest)
