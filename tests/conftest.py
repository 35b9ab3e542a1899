"""Test config: run on CPU with 8 virtual devices so multi-chip sharding
tests run anywhere (SURVEY §4: spoofed multi-device testing)."""

import os

# Force CPU: the ambient environment may point JAX at a remote TPU tunnel
# (JAX_PLATFORMS=axon), which makes per-op dispatch and compiles orders of
# magnitude slower — tests must run on local CPU devices.  A sitecustomize
# module may import jax before this file runs, freezing the env-var config,
# so update the live jax config as well.
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'host_platform_device_count' not in _flags:
  os.environ['XLA_FLAGS'] = (
      _flags + ' --xla_force_host_platform_device_count=8'
  )

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')
assert jax.default_backend() == 'cpu', jax.default_backend()

# Persistent compilation cache: the suite's dominant cost is XLA compiles
# (grad-through-physics in test_rsr_pipeline alone compiles for ~20 min
# cold); repeat runs hit the disk cache and the suite drops to minutes.
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.jax_compile_cache'))
jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)


import pytest


@pytest.fixture(autouse=True)
def _reset_x64():
  """Restore the default-precision config after every test so x64-enabling
  test modules (physics parity, solver gradients) cannot leak f64 into the
  rest of the suite (round-1 VERDICT weak #2)."""
  yield
  jax.config.update('jax_enable_x64', False)
