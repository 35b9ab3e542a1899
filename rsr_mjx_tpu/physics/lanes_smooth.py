"""Batch-in-lanes smooth dynamics (round-5 perf work).

The smooth stages (CRB mass matrix, RNE bias, passive/actuator forces,
unconstrained acceleration) are per-env chains of *tiny* ops — spatial
6-vectors, 3x3 inertia products — that the vmapped batch-major path lays
out with the 3/6-long component axes in the TPU's 128-lane minor
dimension, wasting >95% of each vector register (the same lane-wasting
disease the round-3 collision and round-4 assembly rewrites fixed; round-4
profile: crb 0.26 ms + rne/passive/actuation/fwd_velocity 0.44 ms of the
2.0 ms substep at B=1024, PROFILE.md).

This module computes the identical quantities with the **batch in the
trailing (lane) dimension**: every per-body 3-vector is a ``(3, B)``
array, every spatial vector ``(6, B)``, the mass matrix ``(nv, nv, B)``
feeding the Pallas SPD solve without a transpose.  The tree recursions
unroll at trace time exactly like the per-env code (physics/smooth.py),
so semantics match op-for-op; parity is pinned by
tests/test_lanes_smooth.py against ``vmap`` of the per-env chain.

The fusion boundary (``smooth_fused``) follows the solver.py pattern:
``custom_vjp(custom_vmap(base))`` where the base path is the existing
per-env chain (single source of truth, reference role: the smooth stages
inside ``mjx.step``, mujoco_playground/_src/mjx_env.py:55-65), the
batched-TPU vmap rule dispatches here, and the backward pass re-runs the
per-env chain under ``jax.vjp`` (differentiability for env_params_tuning,
reference RSR/rsr_pipeline.py:125-174).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.custom_batching import custom_vmap

from rsr_mjx_tpu.physics.types import Data, GainType, BiasType, JointType, Model, TrnType


def _cross(a, b):
  """Cross product over component axis -2 (batch trailing)."""
  ax, ay, az = a[..., 0, :], a[..., 1, :], a[..., 2, :]
  bx, by, bz = b[..., 0, :], b[..., 1, :], b[..., 2, :]
  return jnp.stack(
      [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-2
  )


def _mc(v, u):
  """Spatial motion cross v ×ₘ u; (…, 6, B)."""
  vang, vlin = v[..., :3, :], v[..., 3:, :]
  uang, ulin = u[..., :3, :], u[..., 3:, :]
  return jnp.concatenate(
      [_cross(vang, uang), _cross(vang, ulin) + _cross(vlin, uang)], axis=-2
  )


def _mcf(v, f):
  """Spatial motion-force cross v ×f* f; (…, 6, B)."""
  vang, vlin = v[..., :3, :], v[..., 3:, :]
  ftrq, ffrc = f[..., :3, :], f[..., 3:, :]
  return jnp.concatenate(
      [_cross(vang, ftrq) + _cross(vlin, ffrc), _cross(vang, ffrc)], axis=-2
  )


def _imul(I, h, mass, mv):
  """Spatial inertia × motion vector; I (3,3,B), h (3,B), mv (6,B)."""
  w, v = mv[:3], mv[3:]
  trq = sum(I[:, j] * w[j][None] for j in range(3)) + _cross(h, v)
  frc = mass[None] * v - _cross(h, w)
  return jnp.concatenate([trq, frc], axis=0)


class SmoothLeaves(NamedTuple):
  """Traced inputs of the smooth-dynamics stages (kinematics outputs +
  the model leaves the chain reads; DR may batch the model leaves)."""

  qpos: jax.Array
  qvel: jax.Array
  ctrl: jax.Array
  qfrc_applied: jax.Array
  xfrc_applied: jax.Array
  cdof: jax.Array
  cdof_anchor: jax.Array
  ximat: jax.Array
  xipos: jax.Array
  subtree_com: jax.Array
  body_mass: jax.Array
  body_inertia: jax.Array
  dof_armature: jax.Array
  dof_damping: jax.Array
  jnt_stiffness: jax.Array
  qpos0: jax.Array
  gravity: jax.Array
  gainprm: jax.Array
  biasprm: jax.Array
  gear: jax.Array
  ctrlrange: jax.Array
  forcerange: jax.Array


def gather_smooth(m: Model, d: Data) -> SmoothLeaves:
  return SmoothLeaves(
      d.qpos, d.qvel, d.ctrl, d.qfrc_applied, d.xfrc_applied,
      d.cdof, d.cdof_anchor, d.ximat, d.xipos, d.subtree_com,
      m.body_mass, m.body_inertia, m.dof_armature, m.dof_damping,
      m.jnt_stiffness, m.qpos0, m.opt.gravity,
      m.actuator_gainprm, m.actuator_biasprm, m.actuator_gear,
      m.actuator_ctrlrange, m.actuator_forcerange,
  )


def lanes_supported(m: Model) -> bool:
  """Static guard: the lanes actuation covers the model families in use
  (joint transmissions on hinge/slide dofs only)."""
  for u in range(m.nu):
    if int(m.actuator_trntype[u]) not in (TrnType.JOINT, TrnType.JOINTINPARENT):
      return False
    ji = int(m.actuator_trnid[u][0])
    if int(m.jnt_type[ji]) not in (JointType.HINGE, JointType.SLIDE):
      return False
  return True


def smooth_lanes(m: Model, sl: SmoothLeaves):
  """All-lanes smooth dynamics.

  Every ``sl`` leaf carries a trailing batch axis of size B or 1 (model
  leaves broadcast); returns lanes outputs
  (qM (nv, nv, B), cvel (nbody, 6, B), qfrc_bias (nv, B),
  qfrc_passive (nv, B), actuator_force (nu, B), qfrc_actuator (nv, B),
  qfrc_smooth (nv, B), qacc_smooth (nv, B)).
  """
  from rsr_mjx_tpu.physics import linalg_kernels as _lk

  nv, nbody, nu = m.nv, m.nbody, m.nu
  qpos, qvel, cdof = sl.qpos, sl.qvel, sl.cdof
  B = qvel.shape[-1]
  dtype = qvel.dtype
  eye3 = np.eye(3, dtype=np.float32)[:, :, None]

  # ---- spatial body inertias about the root subtree CoM (lie.transform_
  # inertia): I = R diag(I) Rᵀ + parallel axis, h = m (com − anchor)
  rootid = m.body_rootid.arr
  anchors = sl.subtree_com[rootid]  # (nbody, 3, B)
  ximat, diag = sl.ximat, sl.body_inertia
  I_c = sum(
      ximat[:, :, k, None, :] * ximat[:, None, :, k, :]
      * diag[:, k, None, None, :]
      for k in range(3)
  )  # (nbody, 3, 3, B)
  dvec = sl.xipos - anchors
  d2 = jnp.sum(dvec * dvec, axis=1)  # (nbody, B)
  mass4 = sl.body_mass[:, None, None, :]
  I_a = I_c + mass4 * (
      d2[:, None, None, :] * eye3[None]
      - dvec[:, :, None, :] * dvec[:, None, :, :]
  )
  h_a = sl.body_mass[:, None, :] * dvec  # (nbody, 3, B)

  # ---- CRB: accumulate composite inertias leaf → root
  parent = m.body_parentid
  Ic = [I_a[b] for b in range(nbody)]
  hc = [h_a[b] for b in range(nbody)]
  mc = [sl.body_mass[b] for b in range(nbody)]
  for b in range(nbody - 1, 0, -1):
    p = int(parent[b])
    if p == 0:
      continue
    Ic[p] = Ic[p] + Ic[b]
    hc[p] = hc[p] + hc[b]
    mc[p] = mc[p] + mc[b]

  dof_body = m.dof_bodyid.arr
  F_rows = []
  for v in range(nv):
    b = int(dof_body[v])
    F_rows.append(_imul(Ic[b], hc[b], mc[b], cdof[v]))
  F = jnp.stack(F_rows)  # (nv, 6, B)

  M_full = sum(
      F[:, k, None, :] * cdof[None, :, k, :] for k in range(6)
  )  # (nv, nv, B)
  mask = np.asarray(m.dof_anc.arr, np.float32)[:, :, None]
  tril = np.tril(np.ones((nv, nv), np.float32))[:, :, None]
  eyev = np.eye(nv, dtype=np.float32)[:, :, None]
  L = M_full * mask * tril
  qM = L + jnp.swapaxes(L, 0, 1) - L * eyev
  qM = qM + eyev * sl.dof_armature[:, None, :]
  qM = jnp.broadcast_to(qM, (nv, nv, B))

  # ---- com_vel
  weighted = cdof * qvel[:, None, :]  # (nv, 6, B)
  anc = jnp.asarray(m.anc_mask.arr, dtype=dtype)
  cvel = jnp.tensordot(anc, weighted, axes=1)  # (nbody, 6, B)

  # ---- RNE velocity-product + gravity accelerations (root → leaf),
  # replicating smooth.rne's per-joint-block sequence exactly
  grav6 = jnp.concatenate(
      [jnp.zeros_like(sl.gravity), -sl.gravity], axis=0
  )  # (6, Bg)
  cacc = [None] * nbody
  cacc[0] = grav6
  vrec = [None] * nbody
  vrec[0] = jnp.zeros((6, 1), dtype=dtype)
  for b in range(1, nbody):
    p = int(parent[b])
    acc = cacc[p]
    v = vrec[p]
    jadr, jnum = int(m.body_jntadr[b]), int(m.body_jntnum[b])
    for ji in range(jadr, jadr + jnum):
      jt = int(m.jnt_type[ji])
      vadr = int(m.jnt_dofadr[ji])
      if jt == JointType.FREE:
        t = sum(cdof[vadr + k] * qvel[vadr + k][None] for k in range(3))
        v = v + t
        r = sum(
            cdof[vadr + 3 + k] * qvel[vadr + 3 + k][None] for k in range(3)
        )
        acc = acc + _mc(v, r)
        v = v + r
      elif jt == JointType.BALL:
        r = sum(cdof[vadr + k] * qvel[vadr + k][None] for k in range(3))
        acc = acc + _mc(v, r)
        v = v + r
      else:
        s = cdof[vadr] * qvel[vadr][None]
        acc = acc + _mc(v, s)
        v = v + s
    cacc[b] = acc
    vrec[b] = v

  # body forces f = I·a + v ×f* (I·v) at the com_vel velocities
  cfrc = []
  for b in range(nbody):
    cv = cvel[b]
    Iv = _imul(I_a[b], h_a[b], sl.body_mass[b], cv)
    f = _imul(I_a[b], h_a[b], sl.body_mass[b],
              jnp.broadcast_to(cacc[b], (6, B))) + _mcf(cv, Iv)
    cfrc.append(f)
  for b in range(nbody - 1, 0, -1):
    p = int(parent[b])
    if p != 0:
      cfrc[p] = cfrc[p] + cfrc[b]
  qfrc_bias = jnp.stack(
      [jnp.sum(cdof[v] * cfrc[int(dof_body[v])], axis=0) for v in range(nv)]
  )  # (nv, B)

  # ---- passive: damping + joint springs
  qfrc_passive = -sl.dof_damping * qvel
  spring = jnp.zeros((nv, B), dtype=dtype)
  for ji in range(m.njnt):
    jt = int(m.jnt_type[ji])
    if jt in (JointType.HINGE, JointType.SLIDE):
      qadr, vadr = int(m.jnt_qposadr[ji]), int(m.jnt_dofadr[ji])
      spring = spring.at[vadr].add(
          -sl.jnt_stiffness[ji] * (qpos[qadr] - sl.qpos0[qadr])
      )
  qfrc_passive = jnp.broadcast_to(qfrc_passive, (nv, B)) + spring

  # ---- actuation (hinge/slide joint transmissions; lanes_supported guard)
  if nu:
    qadr_u = np.array(
        [int(m.jnt_qposadr[int(m.actuator_trnid[u][0])]) for u in range(nu)]
    )
    vadr_u = np.array(
        [int(m.jnt_dofadr[int(m.actuator_trnid[u][0])]) for u in range(nu)]
    )
    gear0 = sl.gear[:, 0]  # (nu, ·)
    length = gear0 * qpos[qadr_u]
    velocity = gear0 * qvel[vadr_u]
    limited = m.actuator_ctrllimited.arr.astype(bool)[:, None]
    ctrl = jnp.where(
        limited,
        jnp.clip(sl.ctrl, sl.ctrlrange[:, 0], sl.ctrlrange[:, 1]),
        sl.ctrl,
    )
    aff_g = (np.asarray(m.actuator_gaintype.arr) == GainType.AFFINE)[:, None]
    gain = jnp.where(
        aff_g,
        sl.gainprm[:, 0] + sl.gainprm[:, 1] * length
        + sl.gainprm[:, 2] * velocity,
        sl.gainprm[:, 0],
    )
    aff_b = (np.asarray(m.actuator_biastype.arr) == BiasType.AFFINE)[:, None]
    bias = jnp.where(
        aff_b,
        sl.biasprm[:, 0] + sl.biasprm[:, 1] * length
        + sl.biasprm[:, 2] * velocity,
        0.0,
    )
    force = gain * ctrl + bias
    flimited = m.actuator_forcelimited.arr.astype(bool)[:, None]
    force = jnp.where(
        flimited,
        jnp.clip(force, sl.forcerange[:, 0], sl.forcerange[:, 1]),
        force,
    )
    force = jnp.broadcast_to(force, (nu, B))
    onehot_vu = np.zeros((nv, nu), np.float32)
    for u in range(nu):
      onehot_vu[vadr_u[u], u] = 1.0
    qfrc_actuator = jnp.tensordot(
        jnp.asarray(onehot_vu, dtype), gear0 * force, axes=1
    )  # (nv, B)
    # per-joint actuator force clamp (jnt_actfrcrange is static)
    jl = m.jnt_actfrclimited.arr
    if jl.any():
      for ji in range(m.njnt):
        if jl[ji]:
          vadr = int(m.jnt_dofadr[ji])
          lo, hi = np.asarray(m.jnt_actfrcrange[ji], np.float32)
          qfrc_actuator = qfrc_actuator.at[vadr].set(
              jnp.clip(qfrc_actuator[vadr], lo, hi)
          )
    actuator_force = force
  else:
    actuator_force = jnp.zeros((0, B), dtype=dtype)
    qfrc_actuator = jnp.zeros((nv, B), dtype=dtype)

  # ---- xfrc_applied projection (smooth.xfrc_accumulate): with the
  # ancestor-mask sums taken per dof first, the (nbody, nv, 3, B)
  # intermediates of the batch-major path collapse to (nv, 3, B):
  #   qx[j] = ang_j·(T_j − anchor_j×F_j + X_j) + lin_j·F_j
  # where T/F/X are mask-weighted sums of torque / force / xipos×force.
  frc = sl.xfrc_applied[:, :3, :]  # (nbody, 3, B)
  trq = sl.xfrc_applied[:, 3:, :]
  mask_nv = jnp.asarray(m.anc_mask.arr.T, dtype=dtype)  # (nv, nbody)
  T = jnp.tensordot(mask_nv, trq, axes=1)  # (nv, 3, B)
  F1 = jnp.tensordot(mask_nv, frc, axes=1)
  X = jnp.tensordot(mask_nv, _cross(sl.xipos, frc), axes=1)
  ang = cdof[:, :3, :]
  lin = cdof[:, 3:, :]
  qx = jnp.sum(
      ang * (T - _cross(sl.cdof_anchor, F1) + X), axis=1
  ) + jnp.sum(lin * F1, axis=1)  # (nv, B)

  qfrc_smooth = (
      qfrc_passive - qfrc_bias + qfrc_actuator
      + jnp.broadcast_to(sl.qfrc_applied, (nv, B)) + qx
  )
  qacc_smooth = _lk.spd_solve_lanes(qM, qfrc_smooth)
  return (
      qM, cvel, qfrc_bias, qfrc_passive, actuator_force, qfrc_actuator,
      qfrc_smooth, qacc_smooth,
  )


# ---------------------------------------------------------------------------
# Fusion boundary.
# ---------------------------------------------------------------------------

_SMOOTH_CACHE: dict = {}


def _smooth_key(m: Model):
  return (
      m.nbody, m.nv, m.nq, m.nu, m.njnt,
      m.body_parentid, m.body_rootid, m.body_jntadr, m.body_jntnum,
      m.jnt_type, m.jnt_qposadr, m.jnt_dofadr, m.dof_bodyid,
      m.anc_mask, m.dof_anc,
      m.actuator_trntype, m.actuator_trnid, m.actuator_gaintype,
      m.actuator_biastype, m.actuator_ctrllimited, m.actuator_forcelimited,
      m.jnt_actfrclimited,
      m.opt.integrator, m.opt.disableflags,
  )


def _build_smooth(m: Model):
  """Build the cached custom_vjp(custom_vmap(chain)).  Reads only static
  fields of m — every traced leaf travels through SmoothLeaves."""
  import importlib

  # the physics package __init__ rebinds the attribute `forward` to the
  # function, so fetch the module through importlib
  _forward = importlib.import_module('rsr_mjx_tpu.physics.forward')
  from rsr_mjx_tpu.physics import kinematics as _kin
  from rsr_mjx_tpu.physics import linalg_kernels as _lk
  from rsr_mjx_tpu.physics import smooth as _smooth

  supported = lanes_supported(m)

  def base(sl: SmoothLeaves):
    # Reconstruct (m2, d2) with every traced leaf the chain reads replaced
    # from sl, so nothing traced is captured from the build-time m.
    m2 = m.replace(
        body_mass=sl.body_mass, body_inertia=sl.body_inertia,
        dof_armature=sl.dof_armature, dof_damping=sl.dof_damping,
        jnt_stiffness=sl.jnt_stiffness, qpos0=sl.qpos0,
        actuator_gainprm=sl.gainprm, actuator_biasprm=sl.biasprm,
        actuator_gear=sl.gear, actuator_ctrlrange=sl.ctrlrange,
        actuator_forcerange=sl.forcerange,
        opt=m.opt.replace(
            gravity=sl.gravity,
            timestep=jnp.zeros((), dtype=sl.qpos.dtype),
        ),
    )
    d2 = _forward.make_data(m2, dtype=sl.qpos.dtype).replace(
        qpos=sl.qpos, qvel=sl.qvel, ctrl=sl.ctrl,
        qfrc_applied=sl.qfrc_applied, xfrc_applied=sl.xfrc_applied,
        cdof=sl.cdof, cdof_anchor=sl.cdof_anchor,
        ximat=sl.ximat, xipos=sl.xipos, subtree_com=sl.subtree_com,
    )
    d2 = _kin.com_vel(m2, d2)
    d2 = _smooth.crb(m2, d2)
    d2 = _smooth.rne(m2, d2)
    d2 = _smooth.passive(m2, d2)
    d2 = _smooth.actuation(m2, d2)
    d2 = _smooth.fwd_velocity(m2, d2)
    return (
        d2.qM, d2.cvel, d2.qfrc_bias, d2.qfrc_passive, d2.actuator_force,
        d2.qfrc_actuator, d2.qfrc_smooth, d2.qacc_smooth,
    )

  @custom_vmap
  def primal(sl):
    return base(sl)

  @primal.def_vmap
  def _primal_vmap(axis_size, in_batched, sl):
    (sl_b,) = in_batched
    use_lanes = (
        supported and _lk._use_tpu_kernels() and sl.qpos.dtype == jnp.float32
        and sl.qpos.ndim == 2  # no nested vmap in lanes
    )
    if use_lanes:
      lanes = SmoothLeaves(*(
          jnp.moveaxis(a, 0, -1) if b else a[..., None]
          for a, b in zip(sl, sl_b)
      ))
      out = smooth_lanes(m, lanes)
      out = tuple(jnp.moveaxis(o, -1, 0) for o in out)
    else:
      axes = SmoothLeaves(*(0 if b else None for b in sl_b))
      out = jax.vmap(base, in_axes=(axes,))(sl)
    return out, tuple(True for _ in out)

  @jax.custom_vjp
  def fused(sl):
    return primal(sl)

  def fused_fwd(sl):
    return primal(sl), sl

  def fused_bwd(sl, cts):
    with jax.default_matmul_precision('highest'):
      _, vjp = jax.vjp(base, sl)
      return vjp(cts)

  fused.defvjp(fused_fwd, fused_bwd)
  return fused


def smooth_fused(m: Model, d: Data) -> Data:
  """com_vel + crb + rne + passive + actuation + fwd_velocity, with the
  batched TPU path running entirely in lanes layout."""
  key = _smooth_key(m)
  fused = _SMOOTH_CACHE.get(key)
  if fused is None:
    fused = _build_smooth(m)
    _SMOOTH_CACHE[key] = fused
  (qM, cvel, qfrc_bias, qfrc_passive, actuator_force, qfrc_actuator,
   qfrc_smooth, qacc_smooth) = fused(gather_smooth(m, d))
  return d.replace(
      qM=qM, cvel=cvel, qfrc_bias=qfrc_bias, qfrc_passive=qfrc_passive,
      actuator_force=actuator_force, qfrc_actuator=qfrc_actuator,
      qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth,
  )
