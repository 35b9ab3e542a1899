"""Single fused forward region: smooth dynamics + narrow phase + constraint
assembly + Newton solve + implicit-damping integration solve (round-5 perf
work, PROFILE.md bottleneck #3).

Before this module the hot path ran TWO fused custom_vmap boundaries
(lanes_smooth.smooth_fused and solver.solve_fused) plus a third lanes
round-trip inside ``integrate`` (the implicit-damping SPD solve): qM
crossed lanes→batch-major at the smooth exit, batch-major→lanes at the
Newton kernel entry, and batch-major→lanes AGAIN at the implicit solve —
three relayouts of a (nv, nv, B) array per substep, plus batch-major
crossings for qacc_smooth/qfrc_smooth/x0 that the next stage immediately
transposed back.

Here the whole chain

  com_vel → crb → rne → passive → actuation → fwd_velocity
  → narrow phase → assembly → Newton solve → (M + h·D)⁻¹ implicit solve

runs inside ONE ``custom_vjp(custom_vmap(chain))`` region whose batched
TPU path stays in lanes layout end-to-end; qM crosses once, as an output.
The per-env base ``chain`` composes the existing per-env stage functions
(physics/smooth.py, constraint.assemble_from_leaves, the IFT-differentiable
solver, forward._implicit_qacc) — single source of truth, and the region
is differentiable through every inner ``custom_vjp`` for the RSR
``env_params_tuning`` property (reference RSR/rsr_pipeline.py:125-174).

Reference role: the fused region spans what MJX runs as separate
``mjx.step`` stages (mujoco_playground/_src/mjx_env.py:55-65).
"""

from __future__ import annotations

import importlib

import jax
import jax.numpy as jnp
import numpy as np
from jax.custom_batching import custom_vmap

from rsr_mjx_tpu.physics import constraint as _constraint
from rsr_mjx_tpu.physics import lanes_kinematics as _lkin
from rsr_mjx_tpu.physics import lanes_smooth as _ls
from rsr_mjx_tpu.physics import linalg_kernels as _lk
from rsr_mjx_tpu.physics import solver as _solver
from rsr_mjx_tpu.physics.types import Data, IntegratorType, Model

# mjDSBL_EULERDAMP — <flag eulerdamp="disable"/> makes Euler fully explicit
_DSBL_EULERDAMP = 32768


def supported(m: Model) -> bool:
  """Static guard for the merged fused step path."""
  if m.opt.integrator not in (
      IntegratorType.EULER,
      IntegratorType.IMPLICIT,
      IntegratorType.IMPLICITFAST,
  ):
    return False
  return _constraint.layout_cached(m).nefc > 0


_CACHE: dict = {}


def _key(m: Model):
  return (
      _ls._smooth_key(m) + _solver._fused_key(m)
      + (m.ngeom, m.nsite, m.geom_bodyid, m.site_bodyid, m.jnt_bodyid)
  )


def _build(m: Model):
  _forward = importlib.import_module('rsr_mjx_tpu.physics.forward')
  _kin = importlib.import_module('rsr_mjx_tpu.physics.kinematics')
  _smooth = importlib.import_module('rsr_mjx_tpu.physics.smooth')
  _lanes = importlib.import_module('rsr_mjx_tpu.physics.lanes_assembly')

  lay = _constraint.layout_cached(m)
  kind = lay.kind
  iterations = max(m.opt.iterations, 1)
  ls_iterations = max(m.opt.ls_iterations, 1)
  tolerance = float(getattr(m.opt, 'tolerance', 1e-8))
  ls_eff = max(min(ls_iterations, 6), 1)
  kernel_iters = max(min(iterations, 6), 1)  # see solver._get_solver note
  nv, nu, ncon = m.nv, m.nu, m.ncon
  smooth_supported = _ls.lanes_supported(m)
  euler_nodamp = m.opt.integrator == IntegratorType.EULER and bool(
      m.opt.disableflags & _DSBL_EULERDAMP
  )
  implicitfast = m.opt.integrator == IntegratorType.IMPLICITFAST
  # IFT-differentiable per-env solve (while_loop forward, custom_vjp bwd)
  solve3 = _solver._get_solver(
      _solver._KindKey(kind), iterations, ls_iterations, tolerance
  )

  import os

  _use_basis = bool(
      ncon
      and _constraint._selection_size(m)
      and int(_constraint._condims_static(m)[0]) >= 2
      and os.environ.get('RSR_DISABLE_BASIS_KERNEL', '0') != '1'
  )
  n_struct = lay.n_eq + lay.n_fri + lay.n_lim
  kind_s = lay.kind[:n_struct]

  def narrow(lv):
    if ncon:
      return _constraint.narrowphase_leaves(m, lv)
    z = jnp.zeros((0,), lv.qpos.dtype)
    return z, z.reshape(0, 3), z.reshape(0, 3, 3)

  def chain(kl: _lkin.KinLeaves, sl: _ls.SmoothLeaves, lv, x0, h):
    """Per-env kinematics + forward + implicit solve; every piece
    differentiable.  The kin-output fields of ``sl``/``lv`` (cdof,
    cdof_anchor, ximat, xipos, subtree_com, geom_xpos, geom_xmat) are
    IGNORED — they are recomputed here from ``kl`` (dead inputs, DCE'd);
    they stay in the leaf structs so gather_smooth/gather_leaves keep a
    single shape for both the merged and the standalone fused regions."""
    m2 = m.replace(
        body_mass=sl.body_mass, body_inertia=sl.body_inertia,
        dof_armature=sl.dof_armature, dof_damping=sl.dof_damping,
        jnt_stiffness=sl.jnt_stiffness, qpos0=sl.qpos0,
        actuator_gainprm=sl.gainprm, actuator_biasprm=sl.biasprm,
        actuator_gear=sl.gear, actuator_ctrlrange=sl.ctrlrange,
        actuator_forcerange=sl.forcerange,
        body_pos=kl.body_pos, body_quat=kl.body_quat,
        body_ipos=kl.body_ipos, body_iquat=kl.body_iquat,
        jnt_pos=kl.jnt_pos, jnt_axis=kl.jnt_axis,
        geom_pos=kl.geom_pos, geom_quat=kl.geom_quat,
        site_pos=kl.site_pos, site_quat=kl.site_quat,
        opt=m.opt.replace(gravity=sl.gravity, timestep=h),
    )
    d2 = _forward.make_data(m2, dtype=sl.qpos.dtype).replace(
        qpos=sl.qpos, qvel=sl.qvel, ctrl=sl.ctrl,
        qfrc_applied=sl.qfrc_applied, xfrc_applied=sl.xfrc_applied,
    )
    d2 = _kin.kinematics(m2, d2)
    d2 = _kin.com_vel(m2, d2)
    d2 = _smooth.crb(m2, d2)
    d2 = _smooth.rne(m2, d2)
    d2 = _smooth.passive(m2, d2)
    d2 = _smooth.actuation(m2, d2)
    d2 = _smooth.fwd_velocity(m2, d2)

    lv2 = lv._replace(
        cdof=d2.cdof, cdof_anchor=d2.cdof_anchor,
        geom_xpos=d2.geom_xpos, geom_xmat=d2.geom_xmat,
    )
    dist, pos, frame = narrow(lv2)
    efc = _constraint.assemble_from_leaves(m, lv2, contact=(dist, pos, frame))
    x, force, qfrc_con = solve3(
        d2.qM, d2.qacc_smooth, x0, efc.J, efc.aref, efc.D, efc.floss
    )
    # containment (parity with solver.solve_fused / solve)
    ok = jnp.all(jnp.isfinite(x)) & jnp.all(jnp.isfinite(qfrc_con))
    x = jnp.where(ok, x, d2.qacc_smooth)
    force = jnp.where(ok, force, jnp.zeros_like(force))
    qfrc_con = jnp.where(ok, qfrc_con, jnp.zeros_like(qfrc_con))

    if euler_nodamp:
      qacc_i = x
    else:
      d2i = d2.replace(qacc=x, qfrc_constraint=qfrc_con)
      qacc_i = _forward._implicit_qacc(m2, d2i)
    return (
        d2.xpos, d2.xquat, d2.xmat, d2.xipos, d2.ximat,
        d2.geom_xpos, d2.geom_xmat, d2.site_xpos, d2.site_xmat,
        d2.subtree_com, d2.cdof, d2.cdof_anchor,
        d2.qM, d2.cvel, d2.qfrc_bias, d2.qfrc_passive, d2.actuator_force,
        d2.qfrc_actuator, d2.qfrc_smooth, d2.qacc_smooth,
        x, force, qfrc_con, dist, qacc_i,
    )

  # same non-broadcast rules as solver._build_fused
  NO_BCAST = frozenset(
      ('hfield_data', 'geom_size', 'con_friction', 'con_solref',
       'con_solimp', 'con_invweight')
  )
  FIELDS = _constraint.AssembleLeaves._fields

  # static actuation layout for the lanes implicit-damping diagonal
  if nu and smooth_supported:
    vadr_u = np.array(
        [int(m.jnt_dofadr[int(m.actuator_trnid[u][0])]) for u in range(nu)]
    )
    onehot_vu = np.zeros((nv, nu), np.float32)
    for u in range(nu):
      onehot_vu[vadr_u[u], u] = 1.0
  eyev = np.eye(nv, dtype=np.float32)[:, :, None]

  def lanes_solve(lv, qM_l, a0_l, x0t):
    """Lanes-layout narrow+assembly+Newton; qM_l (nv, nv, B), a0/x0 (nv, B).
    ``lv``'s dynamic leaves are already lanes (dyn_lanes contract)."""
    if _use_basis:
      (J_s, aref_s, D_s, fl_s, dist_bm, U, arefU, D_c, naxes) = (
          _lanes.assemble_lanes(m, lv, basis=True, dyn_lanes=True)
      )
      xt, force_l, qft_l = _lk.newton_lanes_pyr_t(
          kernel_iters, ls_eff, kind_s, qM_l, a0_l, x0t,
          J_s, aref_s, D_s, fl_s, U, arefU, D_c, naxes,
      )
      return xt, force_l, qft_l, dist_bm
    J_l, aref_l, D_l, floss_l, dist_bm = _lanes.assemble_lanes(
        m, lv, dyn_lanes=True
    )
    xt, force_l, qft_l = _lk._newton_lanes_core(
        kind, kernel_iters, ls_eff, qM_l, a0_l, x0t, J_l, aref_l, D_l,
        floss_l,
    )
    return xt, force_l, qft_l, dist_bm

  @custom_vmap
  def primal(kl, sl, lv, x0, h):
    return chain(kl, sl, lv, x0, h)

  @primal.def_vmap
  def _primal_vmap(axis_size, in_batched, kl, sl, lv, x0, h):
    kl_b, sl_b, lv_b, x0_b, h_b = in_batched
    use_lanes = (
        smooth_supported
        and _lk._use_tpu_kernels()
        and _lk.newton_kernel_fits(nv, lay.nefc)
        and sl.qpos.dtype == jnp.float32
        and sl.qpos.ndim == 2  # no nested vmap in lanes
        and sl_b.qpos  # lanes layout takes B from the batched state
        and not h_b
        and not lv_b.hfield_data  # batched terrain: lanes unsupported
    )
    if use_lanes:
      B = axis_size
      to_lanes = lambda a, b: jnp.moveaxis(a, 0, -1) if b else a[..., None]
      kl_l = _lkin.KinLeaves(*(to_lanes(a, b) for a, b in zip(kl, kl_b)))
      kout = _lkin.kinematics_lanes(m, kl_l)
      sl_l = _ls.SmoothLeaves(*(
          to_lanes(a, b) for a, b in zip(sl, sl_b)
      ))._replace(
          cdof=kout.cdof, cdof_anchor=kout.cdof_anchor,
          ximat=kout.ximat, xipos=kout.xipos, subtree_com=kout.subtree_com,
      )
      (qM_l, cvel_l, bias_l, pass_l, af_l, qact_l, qsm_l, qaccsm_l) = (
          _ls.smooth_lanes(m, sl_l)
      )
      bcast = lambda a, b: (
          a if b else jnp.broadcast_to(a, (B,) + a.shape)
      )
      # dyn_lanes contract: the six dynamic leaves travel in LANES layout
      # (straight from the lanes kinematics — no batch-major round trip);
      # model leaves keep the batch-major/no-bcast contract.
      lv2 = _constraint.AssembleLeaves(*(
          a if (not b and f in NO_BCAST) else bcast(a, b)
          for f, a, b in zip(FIELDS, lv, lv_b)
      ))._replace(
          qpos=sl_l.qpos, qvel=sl_l.qvel,
          cdof=kout.cdof, cdof_anchor=kout.cdof_anchor,
          geom_xpos=kout.geom_xpos, geom_xmat=kout.geom_xmat,
      )
      x0t = jnp.moveaxis(bcast(x0, x0_b), 0, -1)
      xt, force_l, qft_l, dist_bm = lanes_solve(lv2, qM_l, qaccsm_l, x0t)
      # containment (per-env over the component axis)
      ok = jnp.all(jnp.isfinite(xt), axis=0) & jnp.all(
          jnp.isfinite(qft_l), axis=0
      )
      xt = jnp.where(ok[None], xt, qaccsm_l)
      force_l = jnp.where(ok[None], force_l, jnp.zeros_like(force_l))
      qft_l = jnp.where(ok[None], qft_l, jnp.zeros_like(qft_l))

      if euler_nodamp:
        qit = xt
      else:
        # MhD = qM + h·(diag(damping) − momentᵀ·dgain·moment); for the
        # joint hinge/slide transmissions the guard admits, the actuator
        # term is diagonal: gear²·dgain at each actuated dof
        # (forward._implicit_qacc semantics, op-for-op).
        diag = jnp.broadcast_to(sl_l.dof_damping, (nv, B))
        if implicitfast and nu:
          dgain = sl_l.gainprm[:, 2] * sl_l.ctrl + sl_l.biasprm[:, 2]
          gear0 = sl_l.gear[:, 0]
          diag = diag - jnp.tensordot(
              jnp.asarray(onehot_vu, diag.dtype), gear0 * (dgain * gear0),
              axes=1,
          )
        MhD = qM_l + jnp.asarray(eyev, qM_l.dtype) * (h * diag)[:, None, :]
        qit = _lk.spd_solve_lanes(MhD, qsm_l + qft_l)

      mv = lambda a: jnp.moveaxis(a, -1, 0)
      out = (
          mv(kout.xpos), mv(kout.xquat), mv(kout.xmat), mv(kout.xipos),
          mv(kout.ximat), mv(kout.geom_xpos), mv(kout.geom_xmat),
          mv(kout.site_xpos), mv(kout.site_xmat), mv(kout.subtree_com),
          mv(kout.cdof), mv(kout.cdof_anchor),
          mv(qM_l), mv(cvel_l), mv(bias_l), mv(pass_l), mv(af_l),
          mv(qact_l), mv(qsm_l), mv(qaccsm_l),
          mv(xt), mv(force_l), mv(qft_l), dist_bm, mv(qit),
      )
    else:
      kl_ax = _lkin.KinLeaves(*(0 if b else None for b in kl_b))
      sl_ax = _ls.SmoothLeaves(*(0 if b else None for b in sl_b))
      lv_ax = _constraint.AssembleLeaves(*(0 if b else None for b in lv_b))
      out = jax.vmap(
          chain,
          in_axes=(kl_ax, sl_ax, lv_ax, 0 if x0_b else None,
                   0 if h_b else None),
      )(kl, sl, lv, x0, h)
    return out, tuple(True for _ in out)

  @jax.custom_vjp
  def fused(kl, sl, lv, x0, h):
    return primal(kl, sl, lv, x0, h)

  def fused_fwd(kl, sl, lv, x0, h):
    return primal(kl, sl, lv, x0, h), (kl, sl, lv, x0, h)

  def fused_bwd(res, cts):
    kl, sl, lv, x0, h = res
    with jax.default_matmul_precision('highest'):
      _, vjp = jax.vjp(chain, kl, sl, lv, x0, h)
      return vjp(cts)

  fused.defvjp(fused_fwd, fused_bwd)
  return fused


def forward_implicit_fused(m: Model, d: Data):
  """Run the merged region (kinematics → … → implicit solve); returns
  (d_filled, qacc_implicit).

  ``d_filled`` carries the same fields kinematics() + forward() fill —
  qacc is the raw constrained acceleration (what the sensor stage reads);
  the caller integrates with ``qacc_implicit`` (integrate() semantics,
  op-for-op).
  """
  key = _key(m)
  fused = _CACHE.get(key)
  if fused is None:
    # _build reads only static fields of m — all traced model leaves
    # travel through KinLeaves/SmoothLeaves/AssembleLeaves, so the built
    # fn is shared by every model with the same static signature.
    fused = _build(m)
    _CACHE[key] = fused

  kl = _lkin.gather_kin(m, d)
  sl = _ls.gather_smooth(m, d)
  lv = _constraint.gather_leaves(m, d)
  x0 = jax.lax.stop_gradient(d.qacc)
  (xpos, xquat, xmat, xipos, ximat, geom_xpos, geom_xmat, site_xpos,
   site_xmat, subtree_com, cdof, cdof_anchor,
   qM, cvel, qfrc_bias, qfrc_passive, actuator_force, qfrc_actuator,
   qfrc_smooth, qacc_smooth, x, force, qfrc_con, dist, qacc_i) = fused(
       kl, sl, lv, x0, m.opt.timestep
   )
  contact = d.contact.replace(dist=dist) if m.ncon else d.contact
  d = d.replace(
      xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
      geom_xpos=geom_xpos, geom_xmat=geom_xmat,
      site_xpos=site_xpos, site_xmat=site_xmat,
      subtree_com=subtree_com, cdof=cdof, cdof_anchor=cdof_anchor,
      qM=qM, cvel=cvel, qfrc_bias=qfrc_bias, qfrc_passive=qfrc_passive,
      actuator_force=actuator_force, qfrc_actuator=qfrc_actuator,
      qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth,
      qacc=x, qfrc_constraint=qfrc_con, efc_force=force, contact=contact,
  )
  return d, qacc_i
