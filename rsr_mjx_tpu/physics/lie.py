"""Quaternion / rotation / spatial-vector math for the TPU physics engine.

Conventions follow MuJoCo: quaternions are (w, x, y, z); spatial motion
vectors are 6-vectors ``(angular, linear)``; spatial force vectors are
``(torque, force)``.  Everything here is shape-polymorphic pure jnp so it
vmaps/jits cleanly and lowers to VPU-friendly elementwise code on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------


def quat_mul(u: jax.Array, v: jax.Array) -> jax.Array:
  """Hamilton product u ⊗ v."""
  w1, x1, y1, z1 = u[..., 0], u[..., 1], u[..., 2], u[..., 3]
  w2, x2, y2, z2 = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
  return jnp.stack(
      [
          w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
          w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
          w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
          w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
      ],
      axis=-1,
  )


def quat_inv(q: jax.Array) -> jax.Array:
  """Conjugate (== inverse for unit quaternions)."""
  return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rot(q: jax.Array, v: jax.Array) -> jax.Array:
  """Rotate vector v by unit quaternion q."""
  qv = q[..., 1:]
  w = q[..., :1]
  t = 2.0 * jnp.cross(qv, v)
  return v + w * t + jnp.cross(qv, t)


def quat_rot_inv(q: jax.Array, v: jax.Array) -> jax.Array:
  """Rotate vector v by the inverse of unit quaternion q."""
  return quat_rot(quat_inv(q), v)


def quat_to_mat(q: jax.Array) -> jax.Array:
  """Unit quaternion -> 3x3 rotation matrix (row-major, acts on columns)."""
  w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  xx, yy, zz = x * x, y * y, z * z
  xy, xz, yz = x * y, x * z, y * z
  wx, wy, wz = w * x, w * y, w * z
  m = jnp.stack(
      [
          1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
          2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
          2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
      ],
      axis=-1,
  )
  return m.reshape(q.shape[:-1] + (3, 3))


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
  half = angle * 0.5
  s = jnp.sin(half)
  return jnp.concatenate(
      [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
  )


def quat_integrate(q: jax.Array, omega_local: jax.Array, dt) -> jax.Array:
  """Integrate unit quaternion by angular velocity expressed in the local
  (child body) frame, matching MuJoCo free/ball joint semantics."""
  angle = jnp.linalg.norm(omega_local, axis=-1)
  # Guard against 0/0; sinc-style safe normalisation.
  safe = jnp.where(angle < 1e-12, 1.0, angle)
  axis = omega_local / safe[..., None]
  dq = axis_angle_to_quat(axis, angle * dt)
  out = quat_mul(q, dq)
  return normalize_quat(out)


def normalize_quat(q: jax.Array) -> jax.Array:
  return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_sub(qa: jax.Array, qb: jax.Array) -> jax.Array:
  """3D velocity-space difference between two quaternions (qa - qb),
  expressed in qb's local frame (matches mju_subQuat)."""
  qd = quat_mul(quat_inv(qb), qa)
  qd = qd * jnp.sign(qd[..., :1] + jnp.where(qd[..., :1] == 0, 1.0, 0.0))
  axis = qd[..., 1:]
  sin_half = jnp.linalg.norm(axis, axis=-1)
  safe = jnp.where(sin_half < 1e-12, 1.0, sin_half)
  angle = 2.0 * jnp.arctan2(sin_half, qd[..., 0])
  return axis / safe[..., None] * angle[..., None]


# ---------------------------------------------------------------------------
# Spatial (Plücker) vectors: mv = (ang[3], lin[3]); fv = (torque[3], force[3])
# ---------------------------------------------------------------------------


def motion_cross(v: jax.Array, u: jax.Array) -> jax.Array:
  """Spatial motion cross product v ×ₘ u (both motion vectors)."""
  vang, vlin = v[..., :3], v[..., 3:]
  uang, ulin = u[..., :3], u[..., 3:]
  ang = jnp.cross(vang, uang)
  lin = jnp.cross(vang, ulin) + jnp.cross(vlin, uang)
  return jnp.concatenate([ang, lin], axis=-1)


def motion_cross_force(v: jax.Array, f: jax.Array) -> jax.Array:
  """Spatial motion-force cross product v ×f* f (v motion, f force)."""
  vang, vlin = v[..., :3], v[..., 3:]
  ftrq, ffrc = f[..., :3], f[..., 3:]
  trq = jnp.cross(vang, ftrq) + jnp.cross(vlin, ffrc)
  frc = jnp.cross(vang, ffrc)
  return jnp.concatenate([trq, frc], axis=-1)


def inert_mul(inert: tuple[jax.Array, jax.Array, jax.Array],
              mv: jax.Array) -> jax.Array:
  """Multiply spatial inertia by a motion vector -> force vector.

  ``inert`` is (I, h, m): I is the 3x3 rotational inertia about the anchor,
  h = m * (com - anchor), m the mass.  For motion (w, v):
     torque = I w + h × v
     force  = m v - h × w
  """
  I, h, m = inert
  w, v = mv[..., :3], mv[..., 3:]
  trq = jnp.einsum('...ij,...j->...i', I, w) + jnp.cross(h, v)
  frc = m[..., None] * v - jnp.cross(h, w)
  return jnp.concatenate([trq, frc], axis=-1)


def transform_inertia(
    mass: jax.Array, diag_inertia: jax.Array, imat: jax.Array,
    com: jax.Array, anchor: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
  """Build spatial inertia (I, h, m) about ``anchor`` in world orientation.

  ``diag_inertia`` is the body's principal-axis inertia, ``imat`` the world
  rotation of the principal frame, ``com`` the world CoM position.
  """
  # Rotate principal inertia into world frame: R diag(I) R^T
  I_c = jnp.einsum(
      '...ik,...k,...jk->...ij', imat, diag_inertia, imat
  )
  d = com - anchor
  # Parallel axis: I_a = I_c + m (|d|^2 E - d dᵀ)
  d2 = jnp.sum(d * d, axis=-1)
  eye = jnp.eye(3, dtype=I_c.dtype)
  I_a = I_c + mass[..., None, None] * (
      d2[..., None, None] * eye - d[..., :, None] * d[..., None, :]
  )
  h = mass[..., None] * d
  return I_a, h, mass
