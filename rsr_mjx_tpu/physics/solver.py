"""Primal Newton solver for the soft-constraint forward dynamics.

Minimizes, over joint accelerations x:

    Φ(x) = ½ (x − a₀)ᵀ M (x − a₀) + Σᵢ sᵢ(Jᵢ x − arefᵢ)

with per-row penalty sᵢ: two-sided quadratic (equality), Huber with force
bound (dof friction loss), one-sided quadratic (limits, contact pyramid
edges — force only when the row accelerates into violation).  This is the
MuJoCo/MJX Newton formulation; dense nv×nv Cholesky per iteration, which
under ``vmap`` becomes batched small matrix ops that XLA maps onto the MXU.
The solver is the per-step hot loop of the whole framework (reference role:
MJX solver inside env.step, SURVEY §3.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rsr_mjx_tpu.physics import constraint as _constraint
from rsr_mjx_tpu.physics.types import Data, Model


def _penalty_terms(efc: _constraint.Efc, r: jax.Array):
  """Per-row (dΦ/dr, d²Φ/dr²) for the piecewise penalties."""
  kind = jnp.asarray(efc.kind)
  D, floss = efc.D, efc.floss

  onesided = (kind == _constraint.LIMIT) | (kind == _constraint.CONTACT)
  friction = kind == _constraint.FRICTION

  # quadratic zone gradient/curvature
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
  # friction rows with zero bound are inert
  grad = jnp.where(friction & (floss <= 0), 0.0, grad)
  curv = jnp.where(friction & (floss <= 0), 0.0, curv)
  return grad, curv


def solve(m: Model, d: Data, efc: _constraint.Efc) -> Data:
  """Newton iterations + 1-D Newton line search; fills qacc,
  qfrc_constraint, efc_force."""
  nefc = efc.J.shape[0]
  if nefc == 0:
    return d.replace(
        qacc=d.qacc_smooth,
        qfrc_constraint=jnp.zeros(m.nv, dtype=d.qpos.dtype),
    )

  M = d.qM
  a0 = d.qacc_smooth
  J, aref = efc.J, efc.aref
  eye = jnp.eye(m.nv, dtype=M.dtype) * 1e-9

  def newton_iter(x, _):
    r = J @ x - aref
    s_grad, s_curv = _penalty_terms(efc, r)
    grad = M @ (x - a0) + J.T @ s_grad
    H = M + (J.T * s_curv) @ J
    chol = jax.scipy.linalg.cholesky(H + eye, lower=True)
    dx = -jax.scipy.linalg.cho_solve((chol, True), grad)

    # exact-ish line search: Newton on t over the piecewise-quadratic φ(t)
    mdx = M @ dx
    jdx = J @ dx
    g0 = jnp.dot(x - a0, mdx)
    h0 = jnp.dot(dx, mdx)

    def ls_iter(t, _):
      rt = r + t * jdx
      sg, sc = _penalty_terms(efc, rt)
      dphi = g0 + t * h0 + jnp.dot(sg, jdx)
      ddphi = h0 + jnp.dot(sc * jdx, jdx)
      t_new = t - dphi / jnp.maximum(ddphi, 1e-12)
      return jnp.clip(t_new, 0.0, 4.0), None

    # The 1-D Newton line search on the piecewise-quadratic φ(t) is a
    # contraction that converges in a handful of iterations; MuJoCo's
    # ls_iterations default (50) is sized for its bracketing search and
    # would multiply the hot loop's cost ~6x for nothing under a static
    # scan, so cap it.
    t, _ = jax.lax.scan(ls_iter, jnp.ones((), dtype=x.dtype),
                        None, length=max(min(m.opt.ls_iterations, 8), 1))
    return x + t * dx, None

  x, _ = jax.lax.scan(
      newton_iter, a0, None, length=max(m.opt.iterations, 1)
  )

  r = J @ x - aref
  s_grad, _ = _penalty_terms(efc, r)
  force = -s_grad
  qfrc_constraint = J.T @ force
  # re-derive qacc from forces for exact force/acceleration consistency
  qacc = x
  return d.replace(
      qacc=qacc, qfrc_constraint=qfrc_constraint, efc_force=force
  )
