"""Opt-in TPU-backend test lane (round-4 VERDICT item 2).

The main suite (tests/) pins JAX to CPU for speed and portability, which
means the fused Pallas Newton kernel and the rest of the real TPU path had
zero automated coverage — a TPU-only solver regression could ship green.
This lane runs ON THE REAL CHIP and is opt-in:

    RSR_TPU_TESTS=1 python -m pytest tests_tpu/ -q

Collection is skipped entirely unless RSR_TPU_TESTS=1 and a TPU backend is
actually available (so `pytest` from the repo root stays CPU-only and
fast).  First run compiles for a few minutes; compiles are cached.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest


def pytest_collection_modifyitems(config, items):
  if os.environ.get('RSR_TPU_TESTS', '0') != '1':
    skip = pytest.mark.skip(reason='TPU lane is opt-in: set RSR_TPU_TESTS=1')
    for item in items:
      item.add_marker(skip)
    return
  import jax

  if jax.default_backend() not in ('tpu', 'axon'):
    skip = pytest.mark.skip(
        reason=f'no TPU backend (got {jax.default_backend()})'
    )
    for item in items:
      item.add_marker(skip)
