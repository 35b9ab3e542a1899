"""Forward kinematics and velocity propagation.

The kinematic tree is unrolled at trace time (nbody is tiny — ≤ 20 for all
RSR-MJX tasks) so XLA sees a flat chain of fused gathers/rotations; batching
comes from ``vmap`` over envs, which turns every op here into a wide
VPU-friendly batched op.  Equivalent role to MJX's kinematics inside
``mjx.step`` (reference call path: mujoco_playground/_src/mjx_env.py:55-65).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rsr_mjx_tpu.physics import lie
from rsr_mjx_tpu.physics.types import Data, JointType, Model


def kinematics(m: Model, d: Data) -> Data:
  """Compute body/geom/site poses, subtree CoM, dof axes (cdof)."""
  nb = m.nbody
  xpos = [None] * nb
  xquat = [None] * nb
  dtype = d.qpos.dtype
  xpos[0] = jnp.zeros(3, dtype=dtype)
  xquat[0] = jnp.array([1.0, 0, 0, 0], dtype=dtype)

  jnt_xanchor = [None] * m.njnt
  jnt_xaxis = [None] * m.njnt

  for b in range(1, nb):
    p = int(m.body_parentid[b])
    pos = xpos[p] + lie.quat_rot(xquat[p], m.body_pos[b])
    quat = lie.quat_mul(xquat[p], m.body_quat[b])
    jadr, jnum = int(m.body_jntadr[b]), int(m.body_jntnum[b])
    for ji in range(jadr, jadr + jnum):
      jtype = int(m.jnt_type[ji])
      qadr = int(m.jnt_qposadr[ji])
      if jtype == JointType.FREE:
        pos = d.qpos[qadr : qadr + 3]
        quat = lie.normalize_quat(d.qpos[qadr + 3 : qadr + 7])
        jnt_xanchor[ji] = pos
        jnt_xaxis[ji] = lie.quat_rot(quat, m.jnt_axis[ji])
      else:
        anchor = pos + lie.quat_rot(quat, m.jnt_pos[ji])
        axis = lie.quat_rot(quat, m.jnt_axis[ji])
        jnt_xanchor[ji] = anchor
        jnt_xaxis[ji] = axis
        if jtype == JointType.SLIDE:
          pos = pos + axis * (d.qpos[qadr] - m.qpos0[qadr])
        elif jtype == JointType.HINGE:
          angle = d.qpos[qadr] - m.qpos0[qadr]
          qloc = lie.axis_angle_to_quat(m.jnt_axis[ji], angle)
          quat = lie.quat_mul(quat, qloc)
          # re-anchor: rotation about the joint anchor point
          pos = anchor - lie.quat_rot(quat, m.jnt_pos[ji])
          axis = lie.quat_rot(quat, m.jnt_axis[ji])
          jnt_xaxis[ji] = axis
        elif jtype == JointType.BALL:
          qloc = lie.normalize_quat(d.qpos[qadr : qadr + 4])
          quat = lie.quat_mul(quat, qloc)
          pos = anchor - lie.quat_rot(quat, m.jnt_pos[ji])
        else:
          raise NotImplementedError(f'joint type {jtype}')
    xpos[b] = pos
    xquat[b] = quat

  xpos = jnp.stack(xpos)
  xquat = jnp.stack(xquat)
  xmat = lie.quat_to_mat(xquat)

  xipos = xpos + lie.quat_rot(xquat, m.body_ipos)
  ximat = lie.quat_to_mat(lie.quat_mul(xquat, m.body_iquat))

  geom_bodyid = m.geom_bodyid.arr
  geom_xpos = xpos[geom_bodyid] + lie.quat_rot(
      xquat[geom_bodyid], m.geom_pos
  )
  geom_xmat = lie.quat_to_mat(lie.quat_mul(xquat[geom_bodyid], m.geom_quat))

  site_bodyid = m.site_bodyid.arr
  site_xpos = xpos[site_bodyid] + lie.quat_rot(
      xquat[site_bodyid], m.site_pos
  )
  site_xmat = lie.quat_to_mat(lie.quat_mul(xquat[site_bodyid], m.site_quat))

  # subtree CoM (mass-weighted, accumulated leaf->root)
  mass_x = m.body_mass[:, None] * xipos
  sub_mass = [m.body_mass[b] for b in range(nb)]
  sub_mx = [mass_x[b] for b in range(nb)]
  for b in range(nb - 1, 0, -1):
    p = int(m.body_parentid[b])
    sub_mass[p] = sub_mass[p] + sub_mass[b]
    sub_mx[p] = sub_mx[p] + sub_mx[b]
  sub_mass = jnp.stack(sub_mass)
  sub_mx = jnp.stack(sub_mx)
  subtree_com = sub_mx / jnp.maximum(sub_mass, 1e-12)[:, None]

  # cdof: dof motion axes in world frame, anchored at the root subtree CoM
  # of each dof's kinematic tree (matches MuJoCo's com-based frame for
  # numerical conditioning of the CRB mass matrix).
  cdof = [None] * m.nv
  cdof_anchor = [None] * m.nv
  for ji in range(m.njnt):
    jtype = int(m.jnt_type[ji])
    b = int(m.jnt_bodyid[ji])
    vadr = int(m.jnt_dofadr[ji])
    root = int(m.body_rootid[b])
    anchor = subtree_com[root]
    if jtype == JointType.FREE:
      for k in range(3):
        e = jnp.zeros(3, dtype=dtype).at[k].set(1.0)
        cdof[vadr + k] = jnp.concatenate([jnp.zeros(3, dtype=dtype), e])
        cdof_anchor[vadr + k] = anchor
      # rotational dofs: axes are the BODY-frame axes expressed in world
      # coordinates (xmat columns) — MuJoCo free/ball joints store angular
      # velocity in the child body frame (matches lie.quat_integrate).
      # Rotation is about the body frame origin, so the velocity of the
      # body-fixed point at `anchor` is w × (anchor − xpos).
      for k in range(3):
        w = xmat[b][:, k]
        lin = jnp.cross(w, anchor - xpos[b])
        cdof[vadr + 3 + k] = jnp.concatenate([w, lin])
        cdof_anchor[vadr + 3 + k] = anchor
    elif jtype == JointType.HINGE:
      a = jnt_xaxis[ji]
      p = jnt_xanchor[ji]
      cdof[vadr] = jnp.concatenate([a, jnp.cross(a, anchor - p)])
      cdof_anchor[vadr] = anchor
    elif jtype == JointType.SLIDE:
      a = jnt_xaxis[ji]
      cdof[vadr] = jnp.concatenate([jnp.zeros(3, dtype=dtype), a])
      cdof_anchor[vadr] = anchor
    elif jtype == JointType.BALL:
      for k in range(3):
        w = xmat[b][:, k]  # ball: local axes
        p = jnt_xanchor[ji]
        cdof[vadr + k] = jnp.concatenate([w, jnp.cross(w, anchor - p)])
        cdof_anchor[vadr + k] = anchor
  cdof = jnp.stack(cdof)
  cdof_anchor = jnp.stack(cdof_anchor)

  return d.replace(
      xpos=xpos,
      xquat=xquat,
      xmat=xmat,
      xipos=xipos,
      ximat=ximat,
      geom_xpos=geom_xpos,
      geom_xmat=geom_xmat,
      site_xpos=site_xpos,
      site_xmat=site_xmat,
      subtree_com=subtree_com,
      cdof=cdof,
      cdof_anchor=cdof_anchor,
  )


def com_vel(m: Model, d: Data) -> Data:
  """Body spatial velocities cvel[b] = Σ_{ancestor dofs j} cdof[j] qvel[j]."""
  # anc_mask (nbody, nv) @ (cdof * qvel) -> (nbody, 6): one small matmul.
  weighted = d.cdof * d.qvel[:, None]
  cvel = jnp.asarray(m.anc_mask.arr, dtype=weighted.dtype) @ weighted
  return d.replace(cvel=cvel)


def jac_point(m: Model, d: Data, point: jax.Array, body: int):
  """Translational & rotational Jacobian of a world point on ``body``.

  Returns (jacp, jacr), each (nv, 3): rows are per-dof velocity
  contributions.  Dense einsum over the static ancestor mask — batched
  matmul under vmap, no gather/scatter.
  """
  mask = jnp.asarray(m.anc_mask.arr[body], dtype=point.dtype)  # (nv,)
  ang = d.cdof[:, :3]
  lin = d.cdof[:, 3:]
  # velocity of `point`: lin + ang × (point − anchor)
  jacp = (lin + jnp.cross(ang, point - d.cdof_anchor)) * mask[:, None]
  jacr = ang * mask[:, None]
  return jacp, jacr
