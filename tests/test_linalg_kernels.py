"""Parity tests for the Pallas TPU kernels (interpret mode on CPU).

The fused Newton kernel and the batched SPD solve are the TPU hot path
(physics/linalg_kernels.py); on CPU CI they never execute natively, so
these tests run them through the Pallas interpreter and compare against
the XLA base path (physics/solver.py's while-loop Newton) — the same
comparison the round-2 on-chip validation did manually.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsr_mjx_tpu.physics import constraint as C
from rsr_mjx_tpu.physics import linalg_kernels as lk
from rsr_mjx_tpu.physics import solver as S


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
  monkeypatch.setattr(lk, '_INTERPRET', True)


def _problem(seed, B=4, nv=6, R=17):
  rng = np.random.RandomState(seed)
  kind = np.array(
      [C.EQUALITY] * 2 + [C.FRICTION] * 4 + [C.LIMIT] * 3 + [C.CONTACT] * 8,
      np.int32,
  )
  assert len(kind) == R
  A = rng.randn(B, nv, nv).astype(np.float32)
  M = np.einsum('bij,bkj->bik', A, A) + 3 * np.eye(nv, dtype=np.float32)
  a0 = rng.randn(B, nv).astype(np.float32)
  x0 = np.zeros((B, nv), np.float32)
  J = rng.randn(B, R, nv).astype(np.float32)
  aref = rng.randn(B, R).astype(np.float32)
  D = (np.abs(rng.randn(B, R)) * 2).astype(np.float32)
  fl = np.where(
      kind == C.FRICTION, np.abs(rng.randn(B, R)), 0.0
  ).astype(np.float32)
  return kind, M, a0, x0, J, aref, D, fl


def test_newton_kernel_matches_xla_path():
  kind, M, a0, x0, J, aref, D, fl = _problem(0)
  args = tuple(map(jnp.asarray, (M, a0, x0, J, aref, D, fl)))
  xk, fk, qk = lk.newton_solve_batched(kind, 8, 6, *args)

  def base(M_, a0_, x0_, J_, aref_, D_, fl_):
    x = S._newton_forward(kind, 8, 6, 0.0, M_, a0_, x0_, J_, aref_, D_, fl_)
    f, q = S._forces_at(kind, M_, a0_, J_, aref_, D_, fl_, x)
    return x, f, q

  xb, fb, qb = jax.vmap(base)(*args)
  for a, b in ((xk, xb), (fk, fb), (qk, qb)):
    scale = float(jnp.max(jnp.abs(b))) + 1e-9
    assert float(jnp.max(jnp.abs(a - b))) / scale < 2e-4


def test_spd_solve_batched_matches_dense():
  rng = np.random.RandomState(1)
  B, n = 5, 9
  A = rng.randn(B, n, n).astype(np.float32)
  A = np.einsum('bij,bkj->bik', A, A) + 2 * np.eye(n, dtype=np.float32)
  b = rng.randn(B, n).astype(np.float32)
  x = lk.spd_solve_batched(jnp.asarray(A), jnp.asarray(b))
  ref = np.stack([np.linalg.solve(A[i], b[i]) for i in range(B)])
  np.testing.assert_allclose(np.asarray(x), ref, rtol=2e-3, atol=2e-4)
