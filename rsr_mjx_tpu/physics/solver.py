"""Primal Newton solver for the soft-constraint forward dynamics.

Minimizes, over joint accelerations x:

    Φ(x) = ½ (x − a₀)ᵀ M (x − a₀) + Σᵢ sᵢ(Jᵢ x − arefᵢ)

with per-row penalty sᵢ: two-sided quadratic (equality), Huber with force
bound (dof friction loss), one-sided quadratic (limits, contact pyramid
edges — force only when the row accelerates into violation).  This is the
MuJoCo/MJX Newton formulation; dense nv×nv Cholesky per iteration, which
under ``vmap`` becomes batched small matrix ops that XLA maps onto the MXU.

TPU-native design choices (vs. a fixed unrolled scan):

- **Adaptive termination**: the Newton loop is a ``lax.while_loop`` bounded
  by ``opt.iterations`` that exits when the cost improvement drops below
  ``opt.tolerance`` — a standing contact solve converges in 2-4 iterations,
  so this is ~5x cheaper than the reference XML's fixed 20.  Under vmap the
  loop runs until every env in the batch converges.

- **Implicit differentiation**: gradients do not flow through the Newton
  iterations.  A ``jax.custom_vjp`` applies the implicit function theorem
  at the solution: x* satisfies g(x*) = M(x*−a₀) + Jᵀ ŝ(Jx*−aref) = 0, so
  cotangents need one extra Cholesky solve with H = M + JᵀCJ.  This is both
  exact (up to active-set kinks), O(1) in iteration count, and makes the
  while_loop legal under reverse-mode AD — the property env_params_tuning
  depends on (reference differentiates through all MJX solver iterations,
  SURVEY §3.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rsr_mjx_tpu.physics import constraint as _constraint
from rsr_mjx_tpu.physics.types import Data, Model


def _penalty_terms(kind: np.ndarray, D, floss, r):
  """Per-row (dΦ/dr, d²Φ/dr²) for the piecewise penalties."""
  kind = jnp.asarray(kind)
  onesided = (kind == _constraint.LIMIT) | (kind == _constraint.CONTACT)
  friction = kind == _constraint.FRICTION

  grad_q = D * r
  curv_q = D

  # one-sided: active only when r < 0
  active = jnp.where(onesided, r < 0, True)

  # friction loss (Huber): clamp |D r| at floss, zero curvature beyond
  lim = jnp.where(friction, floss, jnp.inf)
  in_quad = jnp.abs(grad_q) <= lim
  grad = jnp.where(in_quad, grad_q, jnp.sign(r) * lim)
  curv = jnp.where(in_quad, curv_q, 0.0)

  grad = jnp.where(active, grad, 0.0)
  curv = jnp.where(active, curv, 0.0)
  inert = friction & (floss <= 0)
  grad = jnp.where(inert, 0.0, grad)
  curv = jnp.where(inert, 0.0, curv)
  return grad, curv


def _penalty_cost(kind: np.ndarray, D, floss, r):
  """Σᵢ sᵢ(rᵢ) for the termination test."""
  kind = jnp.asarray(kind)
  onesided = (kind == _constraint.LIMIT) | (kind == _constraint.CONTACT)
  friction = kind == _constraint.FRICTION
  active = jnp.where(onesided, r < 0, True)

  quad = 0.5 * D * r * r
  # Huber tail: floss·|r| − floss²/(2D)
  lim = jnp.where(friction, floss, jnp.inf)
  in_quad = jnp.abs(D * r) <= lim
  safe_D = jnp.maximum(D, 1e-12)
  tail = floss * jnp.abs(r) - 0.5 * floss * floss / safe_D
  cost = jnp.where(in_quad, quad, tail)
  cost = jnp.where(active, cost, 0.0)
  cost = jnp.where(friction & (floss <= 0), 0.0, cost)
  return jnp.sum(cost)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _newton_solve(kind, iterations, ls_iterations, tolerance,
                  M, a0, J, aref, D, floss):
  """Solve the soft-constraint problem; returns qacc x*."""
  return _newton_forward(
      kind, iterations, ls_iterations, tolerance, M, a0, J, aref, D, floss
  )


def _newton_forward(kind, iterations, ls_iterations, tolerance,
                    M, a0, J, aref, D, floss):
  eye = jnp.eye(M.shape[0], dtype=M.dtype) * 1e-9

  def total_cost(x):
    r = J @ x - aref
    return 0.5 * jnp.dot(x - a0, M @ (x - a0)) + _penalty_cost(
        kind, D, floss, r
    )

  def newton_iter(x):
    r = J @ x - aref
    s_grad, s_curv = _penalty_terms(kind, D, floss, r)
    grad = M @ (x - a0) + J.T @ s_grad
    H = M + (J.T * s_curv) @ J
    chol = jax.scipy.linalg.cholesky(H + eye, lower=True)
    dx = -jax.scipy.linalg.cho_solve((chol, True), grad)

    # 1-D Newton line search over the piecewise-quadratic φ(t)
    mdx = M @ dx
    jdx = J @ dx
    g0 = jnp.dot(x - a0, mdx)
    h0 = jnp.dot(dx, mdx)

    def ls_iter(t, _):
      rt = r + t * jdx
      sg, sc = _penalty_terms(kind, D, floss, rt)
      dphi = g0 + t * h0 + jnp.dot(sg, jdx)
      ddphi = h0 + jnp.dot(sc * jdx, jdx)
      t_new = t - dphi / jnp.maximum(ddphi, 1e-12)
      return jnp.clip(t_new, 0.0, 4.0), None

    t, _ = jax.lax.scan(
        ls_iter,
        jnp.ones((), dtype=x.dtype),
        None,
        length=max(min(ls_iterations, 8), 1),
    )
    return x + t * dx

  def cond(carry):
    x, cost, i, improvement = carry
    return (i < iterations) & (
        improvement > tolerance * jnp.maximum(jnp.abs(cost), 1e-10)
    )

  def body(carry):
    x, cost, i, _ = carry
    x_new = newton_iter(x)
    cost_new = total_cost(x_new)
    return x_new, cost_new, i + 1, cost - cost_new

  x0 = a0
  carry0 = (x0, total_cost(x0), jnp.zeros((), jnp.int32),
            jnp.asarray(jnp.inf, M.dtype))
  x, _, _, _ = jax.lax.while_loop(cond, body, carry0)
  return x


def _newton_fwd(kind, iterations, ls_iterations, tolerance,
                M, a0, J, aref, D, floss):
  x = _newton_forward(
      kind, iterations, ls_iterations, tolerance, M, a0, J, aref, D, floss
  )
  return x, (M, a0, J, aref, D, floss, x)


def _newton_bwd(kind, iterations, ls_iterations, tolerance, res, x_bar):
  """Implicit-function-theorem cotangents.

  At the solution, g(x*, θ) = M(x*−a₀) + Jᵀ ŝ(Jx*−aref) = 0 with
  ∂g/∂x = H = M + JᵀCJ (C = diag s_curv ≥ 0, H ≻ 0).  For any input θ:
  θ̄ = −(∂g/∂θ)ᵀ H⁻¹ x̄.
  """
  M, a0, J, aref, D, floss, x = res
  r = J @ x - aref
  s_grad, s_curv = _penalty_terms(kind, D, floss, r)

  eye = jnp.eye(M.shape[0], dtype=M.dtype) * 1e-9
  H = M + (J.T * s_curv) @ J
  chol = jax.scipy.linalg.cholesky(H + eye, lower=True)
  w = jax.scipy.linalg.cho_solve((chol, True), x_bar)  # H⁻¹ x̄ (H sym)

  Jw = J @ w  # (nefc,)
  xa = x - a0

  M_bar = -jnp.outer(w, xa)
  a0_bar = M @ w
  aref_bar = s_curv * Jw
  J_bar = -(jnp.outer(s_grad, w) + jnp.outer(s_curv * Jw, x))

  # D enters ŝ only in the quadratic zone: ∂ŝ/∂D = r there
  kind_arr = jnp.asarray(kind)
  onesided = (kind_arr == _constraint.LIMIT) | (
      kind_arr == _constraint.CONTACT
  )
  friction = kind_arr == _constraint.FRICTION
  active = jnp.where(onesided, r < 0, True)
  in_quad = jnp.abs(D * r) <= jnp.where(friction, floss, jnp.inf)
  D_bar = -Jw * jnp.where(active & in_quad, r, 0.0)
  # saturated friction rows: ŝ = sign(r)·floss
  floss_bar = -Jw * jnp.where(
      friction & active & ~in_quad, jnp.sign(r), 0.0
  )
  return M_bar, a0_bar, J_bar, aref_bar, D_bar, floss_bar


_newton_solve.defvjp(_newton_fwd, _newton_bwd)


def solve(m: Model, d: Data, efc: _constraint.Efc) -> Data:
  """Newton solve; fills qacc, qfrc_constraint, efc_force."""
  nefc = efc.J.shape[0]
  if nefc == 0:
    return d.replace(
        qacc=d.qacc_smooth,
        qfrc_constraint=jnp.zeros(m.nv, dtype=d.qpos.dtype),
    )

  kind = np.asarray(efc.kind)
  tolerance = getattr(m.opt, 'tolerance', 1e-8)
  x = _newton_solve(
      kind,
      max(m.opt.iterations, 1),
      max(m.opt.ls_iterations, 1),
      tolerance,
      d.qM,
      d.qacc_smooth,
      efc.J,
      efc.aref,
      efc.D,
      efc.floss,
  )

  r = efc.J @ x - efc.aref
  s_grad, _ = _penalty_terms(kind, efc.D, efc.floss, r)
  force = -s_grad
  qfrc_constraint = efc.J.T @ force
  return d.replace(
      qacc=x, qfrc_constraint=qfrc_constraint, efc_force=force
  )
