"""Batch-in-lanes forward kinematics (round-5 perf work, PROFILE item #2).

The per-env kinematics chain (physics/kinematics.py) is tiny quaternion
math — (3,)/(4,) vectors per body — that the vmapped batch-major path lays
out with the component axis in the TPU's 128-lane minor dimension, wasting
>95% of each vector register (the same lane-wasting disease every other
round-3..5 lanes rewrite fixed).  This module computes the identical
quantities with the **batch in the trailing (lane) dimension**: every
quaternion a ``(4, B)`` array, every position ``(3, B)``, cdof
``(nv, 6, B)`` feeding the smooth/assembly lanes stages without a
transpose.  The kinematic tree unrolls at trace time exactly like the
per-env code, so semantics match op-for-op; parity is pinned by
tests/test_lanes_kinematics.py against ``vmap`` of the per-env chain.

Reference role: the kinematics stage of ``mjx.step``
(mujoco_playground/_src/mjx_env.py:55-65).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rsr_mjx_tpu.physics.types import Data, JointType, Model


def _cross(a, b):
  """Cross product over component axis -2 (batch trailing)."""
  ax, ay, az = a[..., 0, :], a[..., 1, :], a[..., 2, :]
  bx, by, bz = b[..., 0, :], b[..., 1, :], b[..., 2, :]
  return jnp.stack(
      [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-2
  )


def _qmul(u, v):
  """Hamilton product over component axis -2; (…, 4, B)."""
  w1, x1, y1, z1 = u[..., 0, :], u[..., 1, :], u[..., 2, :], u[..., 3, :]
  w2, x2, y2, z2 = v[..., 0, :], v[..., 1, :], v[..., 2, :], v[..., 3, :]
  return jnp.stack(
      [
          w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
          w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
          w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
          w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
      ],
      axis=-2,
  )


def _qrot(q, v):
  """Rotate v (…, 3, B) by unit quaternion q (…, 4, B)."""
  qv = q[..., 1:, :]
  w = q[..., 0:1, :]
  t = 2.0 * _cross(qv, v)
  return v + w * t + _cross(qv, t)


def _qnormalize(q):
  return q / jnp.sqrt(jnp.sum(q * q, axis=-2, keepdims=True))


def _qmat(q):
  """Unit quaternion (…, 4, B) → rotation matrix (…, 3, 3, B)."""
  w, x, y, z = q[..., 0, :], q[..., 1, :], q[..., 2, :], q[..., 3, :]
  xx, yy, zz = x * x, y * y, z * z
  xy, xz, yz = x * y, x * z, y * z
  wx, wy, wz = w * x, w * y, w * z
  m = jnp.stack(
      [
          1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
          2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
          2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
      ],
      axis=-2,
  )
  return m.reshape(m.shape[:-2] + (3, 3) + m.shape[-1:])


def _aaq(axis, angle):
  """axis (…, 3, B), angle (…, B) → quaternion (…, 4, B)."""
  half = angle * 0.5
  s = jnp.sin(half)
  return jnp.concatenate(
      [jnp.cos(half)[..., None, :], axis * s[..., None, :]], axis=-2
  )


class KinLeaves(NamedTuple):
  """Traced inputs of the kinematics stage (DR may batch model leaves)."""

  qpos: jax.Array
  qpos0: jax.Array
  body_pos: jax.Array
  body_quat: jax.Array
  body_ipos: jax.Array
  body_iquat: jax.Array
  body_mass: jax.Array
  jnt_pos: jax.Array
  jnt_axis: jax.Array
  geom_pos: jax.Array
  geom_quat: jax.Array
  site_pos: jax.Array
  site_quat: jax.Array


def gather_kin(m: Model, d: Data) -> KinLeaves:
  return KinLeaves(
      d.qpos, m.qpos0, m.body_pos, m.body_quat, m.body_ipos, m.body_iquat,
      m.body_mass, m.jnt_pos, m.jnt_axis, m.geom_pos, m.geom_quat,
      m.site_pos, m.site_quat,
  )


class KinOut(NamedTuple):
  xpos: jax.Array        # (nbody, 3, B)
  xquat: jax.Array       # (nbody, 4, B)
  xmat: jax.Array        # (nbody, 3, 3, B)
  xipos: jax.Array       # (nbody, 3, B)
  ximat: jax.Array       # (nbody, 3, 3, B)
  geom_xpos: jax.Array   # (ngeom, 3, B)
  geom_xmat: jax.Array   # (ngeom, 3, 3, B)
  site_xpos: jax.Array   # (nsite, 3, B)
  site_xmat: jax.Array   # (nsite, 3, 3, B)
  subtree_com: jax.Array  # (nbody, 3, B)
  cdof: jax.Array        # (nv, 6, B)
  cdof_anchor: jax.Array  # (nv, 3, B)


def kinematics_lanes(m: Model, kl: KinLeaves) -> KinOut:
  """All-lanes forward kinematics; every ``kl`` leaf carries a trailing
  batch axis of size B or 1 (model leaves broadcast)."""
  nb = m.nbody
  qpos = kl.qpos  # (nq, B)
  B = qpos.shape[-1]
  dtype = qpos.dtype
  z3 = jnp.zeros((3, 1), dtype=dtype)

  xpos = [None] * nb
  xquat = [None] * nb
  xpos[0] = z3
  xquat[0] = jnp.asarray([1.0, 0, 0, 0], dtype=dtype)[:, None]

  jnt_xanchor = [None] * m.njnt
  jnt_xaxis = [None] * m.njnt

  for b in range(1, nb):
    p = int(m.body_parentid[b])
    pos = xpos[p] + _qrot(xquat[p], kl.body_pos[b])
    quat = _qmul(xquat[p], kl.body_quat[b])
    jadr, jnum = int(m.body_jntadr[b]), int(m.body_jntnum[b])
    for ji in range(jadr, jadr + jnum):
      jtype = int(m.jnt_type[ji])
      qadr = int(m.jnt_qposadr[ji])
      if jtype == JointType.FREE:
        pos = qpos[qadr : qadr + 3]
        quat = _qnormalize(qpos[qadr + 3 : qadr + 7])
        jnt_xanchor[ji] = pos
        jnt_xaxis[ji] = _qrot(quat, kl.jnt_axis[ji])
      else:
        anchor = pos + _qrot(quat, kl.jnt_pos[ji])
        axis = _qrot(quat, kl.jnt_axis[ji])
        jnt_xanchor[ji] = anchor
        jnt_xaxis[ji] = axis
        if jtype == JointType.SLIDE:
          pos = pos + axis * (qpos[qadr] - kl.qpos0[qadr])[..., None, :]
        elif jtype == JointType.HINGE:
          angle = qpos[qadr] - kl.qpos0[qadr]  # (B,)
          qloc = _aaq(kl.jnt_axis[ji], angle)
          quat = _qmul(quat, qloc)
          # re-anchor: rotation about the joint anchor point
          pos = anchor - _qrot(quat, kl.jnt_pos[ji])
          axis = _qrot(quat, kl.jnt_axis[ji])
          jnt_xaxis[ji] = axis
        elif jtype == JointType.BALL:
          qloc = _qnormalize(qpos[qadr : qadr + 4])
          quat = _qmul(quat, qloc)
          pos = anchor - _qrot(quat, kl.jnt_pos[ji])
        else:
          raise NotImplementedError(f'joint type {jtype}')
    xpos[b] = pos
    xquat[b] = quat

  bc = lambda a, n: jnp.broadcast_to(a, (n, B))
  xpos_s = jnp.stack([bc(x, 3) for x in xpos])  # (nbody, 3, B)
  xquat_s = jnp.stack([bc(q, 4) for q in xquat])  # (nbody, 4, B)
  xmat = _qmat(xquat_s)

  xipos = xpos_s + _qrot(xquat_s, kl.body_ipos)
  ximat = _qmat(_qmul(xquat_s, kl.body_iquat))

  geom_bodyid = m.geom_bodyid.arr
  geom_xpos = xpos_s[geom_bodyid] + _qrot(xquat_s[geom_bodyid], kl.geom_pos)
  geom_xmat = _qmat(_qmul(xquat_s[geom_bodyid], kl.geom_quat))

  site_bodyid = m.site_bodyid.arr
  site_xpos = xpos_s[site_bodyid] + _qrot(xquat_s[site_bodyid], kl.site_pos)
  site_xmat = _qmat(_qmul(xquat_s[site_bodyid], kl.site_quat))

  # subtree CoM (mass-weighted, accumulated leaf->root)
  mass_x = kl.body_mass[:, None, :] * xipos  # (nbody, 3, B)
  sub_mass = [kl.body_mass[b] for b in range(nb)]
  sub_mx = [mass_x[b] for b in range(nb)]
  for b in range(nb - 1, 0, -1):
    p = int(m.body_parentid[b])
    sub_mass[p] = sub_mass[p] + sub_mass[b]
    sub_mx[p] = sub_mx[p] + sub_mx[b]
  sub_mass = jnp.stack([jnp.broadcast_to(s, (B,)) for s in sub_mass])
  sub_mx = jnp.stack([bc(x, 3) for x in sub_mx])
  subtree_com = sub_mx / jnp.maximum(sub_mass, 1e-12)[:, None, :]

  # cdof: dof motion axes anchored at the root subtree CoM (see the
  # per-env kinematics for the com-frame rationale)
  cdof = [None] * m.nv
  cdof_anchor = [None] * m.nv
  z3B = jnp.zeros((3, B), dtype=dtype)
  for ji in range(m.njnt):
    jtype = int(m.jnt_type[ji])
    b = int(m.jnt_bodyid[ji])
    vadr = int(m.jnt_dofadr[ji])
    root = int(m.body_rootid[b])
    anchor = subtree_com[root]  # (3, B)
    if jtype == JointType.FREE:
      for k in range(3):
        e = np.zeros((3, 1), np.float32)
        e[k, 0] = 1.0
        cdof[vadr + k] = jnp.concatenate(
            [z3B, jnp.broadcast_to(jnp.asarray(e, dtype), (3, B))], axis=0
        )
        cdof_anchor[vadr + k] = anchor
      # rotational dofs: body-frame axes in world coords (xmat columns);
      # rotation is about the body frame origin
      for k in range(3):
        w = xmat[b][:, k, :]  # (3, B)
        lin = _cross(w, anchor - xpos_s[b])
        cdof[vadr + 3 + k] = jnp.concatenate([w, lin], axis=0)
        cdof_anchor[vadr + 3 + k] = anchor
    elif jtype == JointType.HINGE:
      a = jnp.broadcast_to(jnt_xaxis[ji], (3, B))
      p = jnt_xanchor[ji]
      cdof[vadr] = jnp.concatenate([a, _cross(a, anchor - p)], axis=0)
      cdof_anchor[vadr] = anchor
    elif jtype == JointType.SLIDE:
      a = jnp.broadcast_to(jnt_xaxis[ji], (3, B))
      cdof[vadr] = jnp.concatenate([z3B, a], axis=0)
      cdof_anchor[vadr] = anchor
    elif jtype == JointType.BALL:
      for k in range(3):
        w = xmat[b][:, k, :]
        p = jnt_xanchor[ji]
        cdof[vadr + k] = jnp.concatenate(
            [w, _cross(w, anchor - p)], axis=0
        )
        cdof_anchor[vadr + k] = anchor
  cdof_s = jnp.stack(cdof)  # (nv, 6, B)
  cdof_anchor_s = jnp.stack(
      [jnp.broadcast_to(a, (3, B)) for a in cdof_anchor]
  )

  return KinOut(
      xpos=xpos_s, xquat=xquat_s, xmat=xmat, xipos=xipos, ximat=ximat,
      geom_xpos=geom_xpos, geom_xmat=geom_xmat,
      site_xpos=site_xpos, site_xmat=site_xmat,
      subtree_com=subtree_com, cdof=cdof_s, cdof_anchor=cdof_anchor_s,
  )
