"""Microbenchmark: batched 20x20 SPD solve strategies on the accelerator.

Informs the Newton-solver design: XLA's built-in Cholesky vs a trace-time
unrolled Cholesky vs LU solve, batched over 1024 envs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def chol_unrolled(A):
  """Cholesky via trace-time unrolled outer-product algorithm.

  A: (..., n, n) SPD.  Returns lower L.  n static and small (<=32): the
  Python loop unrolls to n fused vector steps, avoiding XLA's serial
  while-loop expansion of lax.linalg.cholesky for tiny batched matrices.
  """
  n = A.shape[-1]
  L = jnp.zeros_like(A)
  for j in range(n):
    # column j below/at diagonal, minus contributions of previous columns
    c = A[..., j:, j] - jnp.einsum(
        '...ik,...k->...i', L[..., j:, :j], L[..., j, :j]
    )
    diag = jnp.sqrt(jnp.maximum(c[..., 0], 1e-12))
    col = c / diag[..., None]
    L = L.at[..., j:, j].set(col)
  return L


def solve_tri_unrolled(L, b, lower=True):
  """Triangular solve unrolled at trace time; L (..., n, n), b (..., n)."""
  n = L.shape[-1]
  x = [None] * n
  idx = range(n) if lower else range(n - 1, -1, -1)
  for i in idx:
    s = b[..., i]
    if lower:
      for j in range(i):
        s = s - L[..., i, j] * x[j]
    else:
      for j in range(i + 1, n):
        s = s - L[..., j, i] * x[j]
    x[i] = s / L[..., i, i]
  return jnp.stack(x, axis=-1)


def cho_solve_unrolled(L, b):
  y = solve_tri_unrolled(L, b, lower=True)
  return solve_tri_unrolled(L, y, lower=False)


def bench(name, fn, *args, n=50):
  out = jax.block_until_ready(fn(*args))
  t0 = time.time()
  for _ in range(n):
    out = fn(*args)
  jax.block_until_ready(out)
  dt = (time.time() - t0) / n
  print(f'{name:32s} {dt * 1e6:10.1f} us')


def main():
  B, n = 4096, 20
  key = jax.random.PRNGKey(0)
  X = jax.random.normal(key, (B, n, n))
  A = X @ jnp.swapaxes(X, -1, -2) + 10 * jnp.eye(n)
  b = jax.random.normal(key, (B, n))

  f_xla = jax.jit(lambda A, b: jax.scipy.linalg.cho_solve(
      (jax.scipy.linalg.cholesky(A, lower=True), True), b[..., None]
  )[..., 0])
  f_unroll = jax.jit(lambda A, b: cho_solve_unrolled(chol_unrolled(A), b))
  f_lu = jax.jit(lambda A, b: jnp.linalg.solve(A, b[..., None])[..., 0])
  f_pos = jax.jit(
      lambda A, b: jax.scipy.linalg.solve(A, b[..., None], assume_a='pos')[
          ..., 0
      ]
  )

  # correctness
  r1 = f_xla(A, b)
  r2 = f_unroll(A, b)
  err = jnp.max(jnp.abs(r1 - r2))
  print('unrolled vs xla max err:', float(err))

  bench('xla cholesky+cho_solve', f_xla, A, b)
  bench('unrolled cholesky+solves', f_unroll, A, b)
  bench('lu solve', f_lu, A, b)
  bench('solve assume_a=pos', f_pos, A, b)


if __name__ == '__main__':
  main()
