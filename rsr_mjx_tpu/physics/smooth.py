"""Smooth (unconstrained) dynamics: CRB mass matrix, RNE bias forces,
passive forces, actuation.

All tree recursions unroll at trace time over the (tiny, static) body count;
the per-dof math is expressed as dense masked matmuls so that under
``vmap`` everything becomes large batched GEMMs that tile onto the TPU MXU.
Role-equivalent to the smooth-dynamics stage inside ``mjx.step`` used by the
reference (mujoco_playground/_src/mjx_env.py:55-65).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rsr_mjx_tpu.physics import lie
from rsr_mjx_tpu.physics.types import (
    BiasType,
    Data,
    DynType,
    GainType,
    JointType,
    Model,
    TrnType,
)


def _body_inertias(m: Model, d: Data):
  """Spatial inertia (I, h, mass) of each body about its root subtree CoM."""
  anchors = d.subtree_com[m.body_rootid.arr]
  return lie.transform_inertia(
      m.body_mass, m.body_inertia, d.ximat, d.xipos, anchors
  )


def crb(m: Model, d: Data) -> Data:
  """Composite-rigid-body mass matrix, dense (nv, nv)."""
  I, h, mass = _body_inertias(m, d)

  # composite inertia: accumulate children into parents (leaf -> root)
  Ic = [I[b] for b in range(m.nbody)]
  hc = [h[b] for b in range(m.nbody)]
  mc = [mass[b] for b in range(m.nbody)]
  for b in range(m.nbody - 1, 0, -1):
    p = int(m.body_parentid[b])
    if p == 0:
      continue
    Ic[p] = Ic[p] + Ic[b]
    hc[p] = hc[p] + hc[b]
    mc[p] = mc[p] + mc[b]

  # F[i] = crb_inertia(body(dof i)) * cdof[i]  -> (nv, 6)
  dof_body = m.dof_bodyid.arr
  Icrb = jnp.stack([Ic[int(b)] for b in dof_body])
  hcrb = jnp.stack([hc[int(b)] for b in dof_body])
  mcrb = jnp.stack([mc[int(b)] for b in dof_body])
  F = lie.inert_mul((Icrb, hcrb, mcrb), d.cdof)  # (nv, 6)

  # M[i, j] = F[i] · cdof[j] for j ∈ ancestor dofs of i.  Ancestor dofs have
  # lower indices (topological order), so the valid entries live in the
  # masked lower triangle; mirror to get the full symmetric matrix.
  M_full = F @ d.cdof.T  # (nv, nv)
  mask = jnp.asarray(m.dof_anc.arr, dtype=M_full.dtype)
  L = jnp.tril(M_full * mask)
  Msym = L + L.T - jnp.diag(jnp.diag(L))
  # armature on the diagonal
  Msym = Msym + jnp.diag(m.dof_armature)
  # qLD stays empty: factorizations happen inside the batched SPD /
  # Newton kernels (linalg_kernels.py), not as per-env XLA Cholesky ops
  # (which serialize badly for batched tiny matrices — VERDICT r1 item 1e).
  return d.replace(qM=Msym)


def solve_m(d: Data, x: jax.Array) -> jax.Array:
  """Solve qM y = x (batched Pallas SPD kernel under vmap on TPU)."""
  from rsr_mjx_tpu.physics import linalg_kernels as _lk

  return _lk.spd_solve(d.qM, x)


def rne(m: Model, d: Data) -> Data:
  """Bias force qfrc_bias = C(q, v)·v − g-term via recursive Newton-Euler."""
  I, h, mass = _body_inertias(m, d)
  dtype = d.qpos.dtype

  # velocity-product + gravity accelerations, root -> leaf.  cdof_dot for a
  # dof block uses the velocity accumulated BEFORE that block (MuJoCo
  # mj_comVel: free-joint rotation sees parent + own translation; ball sees
  # parent; 1-dof joints are insensitive since v ×ₘ v = 0).
  grav = jnp.concatenate([jnp.zeros(3, dtype=dtype), -m.opt.gravity])
  cacc = [None] * m.nbody
  cacc[0] = grav
  cvel = [None] * m.nbody
  cvel[0] = jnp.zeros(6, dtype=dtype)
  for b in range(1, m.nbody):
    p = int(m.body_parentid[b])
    acc = cacc[p]
    v = cvel[p]
    jadr, jnum = int(m.body_jntadr[b]), int(m.body_jntnum[b])
    for ji in range(jadr, jadr + jnum):
      jt = int(m.jnt_type[ji])
      vadr = int(m.jnt_dofadr[ji])
      if jt == JointType.FREE:
        t = d.cdof[vadr : vadr + 3].T @ d.qvel[vadr : vadr + 3]
        v = v + t
        r = d.cdof[vadr + 3 : vadr + 6].T @ d.qvel[vadr + 3 : vadr + 6]
        acc = acc + lie.motion_cross(v, r)
        v = v + r
      elif jt == JointType.BALL:
        r = d.cdof[vadr : vadr + 3].T @ d.qvel[vadr : vadr + 3]
        acc = acc + lie.motion_cross(v, r)
        v = v + r
      else:
        s = d.cdof[vadr] * d.qvel[vadr]
        acc = acc + lie.motion_cross(v, s)
        v = v + s
    cacc[b] = acc
    cvel[b] = v
  cvel = d.cvel

  # body forces: f = I·a + v ×f* (I·v)
  cfrc = []
  for b in range(m.nbody):
    Iv = lie.inert_mul((I[b], h[b], mass[b]), cvel[b])
    f = lie.inert_mul((I[b], h[b], mass[b]), cacc[b]) + lie.motion_cross_force(
        cvel[b], Iv
    )
    cfrc.append(f)

  # accumulate child forces into parents (leaf -> root)
  for b in range(m.nbody - 1, 0, -1):
    p = int(m.body_parentid[b])
    if p != 0:
      cfrc[p] = cfrc[p] + cfrc[b]
  cfrc = jnp.stack(cfrc)

  # qfrc_bias[j] = cdof[j] · cfrc(body(j))
  qfrc_bias = jnp.sum(d.cdof * cfrc[m.dof_bodyid.arr], axis=-1)
  return d.replace(qfrc_bias=qfrc_bias)


def xfrc_accumulate(m: Model, d: Data) -> jax.Array:
  """Project xfrc_applied (per-body CoM wrench, world frame) to qfrc.

  Layout follows MuJoCo: ``xfrc_applied[:, :3]`` is force, ``[:, 3:]``
  torque.  Used by the Go2 joystick perturbation kicks (reference:
  go2/joystick.py:594-644 sets xfrc_applied[torso, :3]).
  """
  # spatial force of body b about dof j's anchor:
  # torque' = torque + (xipos_b − anchor_j) × force
  frc = d.xfrc_applied[:, :3]
  trq = d.xfrc_applied[:, 3:]
  # for each (body, dof): arm = xipos[b] − cdof_anchor[j]
  arm = d.xipos[:, None, :] - d.cdof_anchor[None, :, :]  # (nbody, nv, 3)
  trq_at = trq[:, None, :] + jnp.cross(arm, frc[:, None, :])
  dot = jnp.sum(
      d.cdof[None, :, :3] * trq_at + d.cdof[None, :, 3:] * frc[:, None, :],
      axis=-1,
  )  # (nbody, nv)
  mask = jnp.asarray(m.anc_mask.arr, dtype=dot.dtype)
  return jnp.sum(dot * mask, axis=0)


def passive(m: Model, d: Data) -> Data:
  """Passive forces: joint damping + joint spring stiffness."""
  qfrc = -m.dof_damping * d.qvel
  # joint springs: -stiffness * (qpos - qpos0) per joint dof (hinge/slide)
  spring = jnp.zeros(m.nv, dtype=d.qpos.dtype)
  for ji in range(m.njnt):
    jt = int(m.jnt_type[ji])
    if jt in (JointType.HINGE, JointType.SLIDE):
      qadr, vadr = int(m.jnt_qposadr[ji]), int(m.jnt_dofadr[ji])
      spring = spring.at[vadr].add(
          -m.jnt_stiffness[ji] * (d.qpos[qadr] - m.qpos0[qadr])
      )
  return d.replace(qfrc_passive=qfrc + spring)


def actuator_moment(m: Model, d: Data) -> jax.Array:
  """Transmission moment matrix (nu, nv): qfrc_actuator = momentᵀ force."""
  rows = []
  dtype = d.qpos.dtype
  for u in range(m.nu):
    trn = int(m.actuator_trntype[u])
    if trn in (TrnType.JOINT, TrnType.JOINTINPARENT):
      ji = int(m.actuator_trnid[u][0])
      vadr = int(m.jnt_dofadr[ji])
      jt = int(m.jnt_type[ji])
      gear = m.actuator_gear[u]
      row = jnp.zeros(m.nv, dtype=dtype)
      if jt in (JointType.HINGE, JointType.SLIDE):
        row = row.at[vadr].set(gear[0])
      elif jt == JointType.FREE:
        for k in range(6):
          row = row.at[vadr + k].set(gear[k])
      else:
        raise NotImplementedError('ball joint transmission')
      rows.append(row)
    else:
      raise NotImplementedError(f'actuator transmission {trn}')
  return jnp.stack(rows) if rows else jnp.zeros((0, m.nv), dtype=dtype)


def actuation(m: Model, d: Data) -> Data:
  """Actuator forces.  Supports FIXED/AFFINE gain, NONE/AFFINE bias,
  joint transmissions — covers <position>/<motor>/<velocity> actuators used
  by all RSR-MJX models (cube.xml:173-180, go2_mjx XMLs)."""
  if m.nu == 0:
    return d.replace(
        qfrc_actuator=jnp.zeros(m.nv, dtype=d.qpos.dtype),
        actuator_force=jnp.zeros(0, dtype=d.qpos.dtype),
    )
  moment = actuator_moment(m, d)  # (nu, nv)

  ctrl = d.ctrl
  limited = jnp.asarray(m.actuator_ctrllimited.arr.astype(bool))
  ctrl = jnp.where(
      limited,
      jnp.clip(ctrl, m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]),
      ctrl,
  )

  # actuator length/velocity via transmission
  # length for joint transmission: gear * qpos[jnt]
  lengths = []
  for u in range(m.nu):
    ji = int(m.actuator_trnid[u][0])
    jt = int(m.jnt_type[ji])
    if jt in (JointType.HINGE, JointType.SLIDE):
      qadr = int(m.jnt_qposadr[ji])
      lengths.append(m.actuator_gear[u][0] * d.qpos[qadr])
    else:
      lengths.append(jnp.zeros((), dtype=d.qpos.dtype))
  length = jnp.stack(lengths)
  velocity = moment @ d.qvel  # (nu,)

  # activation dynamics: only DynType.NONE supported (none of the reference
  # models use filters/muscles)
  inp = ctrl

  gain = jnp.where(
      jnp.asarray(m.actuator_gaintype.arr) == GainType.AFFINE,
      m.actuator_gainprm[:, 0]
      + m.actuator_gainprm[:, 1] * length
      + m.actuator_gainprm[:, 2] * velocity,
      m.actuator_gainprm[:, 0],
  )
  bias = jnp.where(
      jnp.asarray(m.actuator_biastype.arr) == BiasType.AFFINE,
      m.actuator_biasprm[:, 0]
      + m.actuator_biasprm[:, 1] * length
      + m.actuator_biasprm[:, 2] * velocity,
      0.0,
  )
  force = gain * inp + bias
  flimited = jnp.asarray(m.actuator_forcelimited.arr.astype(bool))
  force = jnp.where(
      flimited,
      jnp.clip(
          force, m.actuator_forcerange[:, 0], m.actuator_forcerange[:, 1]
      ),
      force,
  )
  qfrc = moment.T @ force

  # per-joint actuator force clamp (jnt_actfrcrange)
  jl = m.jnt_actfrclimited.arr
  if jl.any():
    for ji in range(m.njnt):
      if jl[ji]:
        vadr = int(m.jnt_dofadr[ji])
        lo, hi = np.asarray(m.jnt_actfrcrange[ji], qfrc.dtype)
        qfrc = qfrc.at[vadr].set(jnp.clip(qfrc[vadr], lo, hi))
  return d.replace(qfrc_actuator=qfrc, actuator_force=force)


def fwd_velocity(m: Model, d: Data) -> Data:
  """Sum smooth forces and the unconstrained acceleration."""
  qfrc_applied = d.qfrc_applied + xfrc_accumulate(m, d)
  qfrc_smooth = (
      d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator + qfrc_applied
  )
  qacc_smooth = solve_m(d, qfrc_smooth)
  return d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)
