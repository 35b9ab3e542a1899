"""Forward dynamics pipeline and integrators.

``step(m, d)`` is the hot path of the whole framework — it is what runs a
few thousand times per second per env under jit/vmap (reference role:
``mjx.step`` inside the env substep scan, mujoco_playground/_src/
mjx_env.py:55-65).  Pipeline stages:

  kinematics → com_vel → crb → rne → passive → actuation → fwd_velocity
  → collision → constraint assembly → Newton solve → integrate

Everything is static-shape, pure, and differentiable (the RSR
``env_params_tuning`` differentiates straight through this function;
reference: RSR/rsr_pipeline.py:125-174).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rsr_mjx_tpu.physics import collision as _collision
from rsr_mjx_tpu.physics import constraint as _constraint
from rsr_mjx_tpu.physics import kinematics as _kin
from rsr_mjx_tpu.physics import lanes_smooth as _lanes_smooth
from rsr_mjx_tpu.physics import lie
from rsr_mjx_tpu.physics import sensors as _sensors
from rsr_mjx_tpu.physics import smooth as _smooth
from rsr_mjx_tpu.physics import solver as _solver
from rsr_mjx_tpu.physics.types import (
    Contact,
    Data,
    IntegratorType,
    JointType,
    Model,
)


def make_data(m: Model, dtype=jnp.float32) -> Data:
  """Fresh Data at qpos0 with zero velocity (equiv. mjx.make_data)."""
  z = lambda *shape: jnp.zeros(shape, dtype=dtype)
  nefc = _constraint.count_rows(m)
  if m.ncon:
    con_g1, con_g2, con_cd = _collision.contact_static_ids(m)
  else:
    con_g1 = con_g2 = con_cd = None
  d = Data(
      qpos=jnp.asarray(m.qpos0, dtype=dtype),
      qvel=z(m.nv),
      ctrl=z(m.nu),
      act=z(m.na),
      time=jnp.zeros((), dtype=dtype),
      xfrc_applied=z(m.nbody, 6),
      xpos=z(m.nbody, 3),
      xquat=z(m.nbody, 4),
      xmat=z(m.nbody, 3, 3),
      xipos=z(m.nbody, 3),
      ximat=z(m.nbody, 3, 3),
      geom_xpos=z(m.ngeom, 3),
      geom_xmat=z(m.ngeom, 3, 3),
      site_xpos=z(m.nsite, 3),
      site_xmat=z(m.nsite, 3, 3),
      subtree_com=z(m.nbody, 3),
      cdof=z(m.nv, 6),
      cdof_anchor=z(m.nv, 3),
      cvel=z(m.nbody, 6),
      qM=z(m.nv, m.nv),
      qLD=z(m.nv, m.nv),
      qfrc_bias=z(m.nv),
      qfrc_passive=z(m.nv),
      qfrc_actuator=z(m.nv),
      qfrc_applied=z(m.nv),
      actuator_force=z(m.nu),
      qfrc_smooth=z(m.nv),
      qacc_smooth=z(m.nv),
      qfrc_constraint=z(m.nv),
      qacc=z(m.nv),
      # Slim hot-path Contact: only ``dist`` is dynamic (filled by the
      # fused solver); pos/frame/solparams are not materialized on the hot
      # path any more (round-5 fusion) and would otherwise ride every
      # substep-scan carry and AutoReset where() at (B, ncon, 3, 3) size.
      # collision() builds the full Contact for standalone/diagnostic use.
      contact=Contact(
          dist=jnp.full((m.ncon,), 1e10, dtype=dtype),
          pos=None,
          frame=None,
          friction=None,
          solref=None,
          solimp=None,
          geom1=con_g1,
          geom2=con_g2,
          condim=con_cd,
      ),
      efc_force=z(nefc),
      sensordata=z(m.nsensordata),
  )
  return d


def fwd_position(m: Model, d: Data, collision: bool = True) -> Data:
  """Position-dependent stages.  ``collision=True`` materializes the full
  Contact set (standalone/diagnostic use); the hot path passes False —
  solve_fused runs the narrow phase internally, in lanes layout, and
  writes back contact.dist only."""
  with jax.default_matmul_precision('highest'):
    d = _kin.kinematics(m, d)
    d = _kin.com_vel(m, d)
    d = _smooth.crb(m, d)
    if collision:
      d = _collision.collision(m, d)
  return d


def forward(m: Model, d: Data, sensors: bool = True) -> Data:
  """Full forward dynamics: fills qacc (and everything before it).

  ``sensors=False`` skips the sensordata fill (round-5 perf): sensor
  values are pure outputs — nothing inside the pipeline reads them — so a
  multi-substep control step only needs them on its LAST substep (0.13 ms
  × 3 wasted substeps at B=1024 otherwise; the final sensordata is
  bitwise identical either way).

  The whole pipeline runs under matmul precision 'highest': on TPU the
  default lowers dot/einsum inputs to bf16 (8-bit mantissa ⇒ ~8 mm
  position error at the 1 m scene scale), which corrupts contact geometry
  and the one-hot selection gather — a full PPO run NaN'd from step 0
  before this was scoped.  'highest' uses the 3-pass bf16 decomposition,
  f32-exact for these magnitudes; policy/value network matmuls outside
  the physics step keep the fast default.
  """
  with jax.default_matmul_precision('highest'):
    d = _kin.kinematics(m, d)
    # smooth dynamics (com_vel..fwd_velocity) fused: the batched TPU path
    # runs entirely in lanes layout (physics/lanes_smooth.py)
    d = _lanes_smooth.smooth_fused(m, d)
    # fused narrow phase + assembly + Newton solve: the batched TPU path
    # keeps contact features and J in lanes end-to-end (no batch-major J)
    d = _solver.solve_fused(m, d)
    if sensors:
      d = _sensors.sensordata(m, d)
  return d


def _integrate_pos(m: Model, qpos: jax.Array, qvel: jax.Array, dt) -> jax.Array:
  """Integrate qpos by qvel (free-joint quaternions on the manifold)."""
  out = qpos
  for ji in range(m.njnt):
    jt = int(m.jnt_type[ji])
    qadr = int(m.jnt_qposadr[ji])
    vadr = int(m.jnt_dofadr[ji])
    if jt == JointType.FREE:
      out = out.at[qadr : qadr + 3].add(dt * qvel[vadr : vadr + 3])
      quat = lie.quat_integrate(
          qpos[qadr + 3 : qadr + 7], qvel[vadr + 3 : vadr + 6], dt
      )
      out = out.at[qadr + 3 : qadr + 7].set(quat)
    elif jt == JointType.BALL:
      quat = lie.quat_integrate(
          qpos[qadr : qadr + 4], qvel[vadr : vadr + 3], dt
      )
      out = out.at[qadr : qadr + 4].set(quat)
    else:
      out = out.at[qadr].add(dt * qvel[vadr])
  return out


def _implicit_qacc(m: Model, d: Data) -> jax.Array:
  """(M − h ∂f/∂v)⁻¹ f_total for Euler-implicit damping / implicitfast.

  Euler integrates joint damping implicitly (MuJoCo mj_Euler semantics);
  implicitfast additionally treats the actuator velocity gain/bias
  implicitly (affine-bias kv of <position> actuators, cube.xml:173-180).
  """
  h = m.opt.timestep
  qfrc = d.qfrc_smooth + d.qfrc_constraint
  D = jnp.diag(m.dof_damping)
  if m.opt.integrator == IntegratorType.IMPLICITFAST and m.nu > 0:
    moment = _smooth.actuator_moment(m, d)  # (nu, nv)
    dgain = (
        m.actuator_gainprm[:, 2] * d.ctrl + m.actuator_biasprm[:, 2]
    )  # d force_u / d vel_u
    # zero the rows where force is clamped? (approximation: keep)
    D = D - moment.T @ (dgain[:, None] * moment)
  MhD = d.qM + h * D
  from rsr_mjx_tpu.physics import linalg_kernels as _lk

  return _lk.spd_solve(MhD, qfrc)


def integrate(m: Model, d: Data) -> Data:
  h = m.opt.timestep
  integ = m.opt.integrator
  if integ not in (
      IntegratorType.EULER,
      IntegratorType.IMPLICIT,
      IntegratorType.IMPLICITFAST,
  ):
    raise NotImplementedError(f'integrator {integ}')
  # Euler integrates damping implicitly; implicitfast also folds in the
  # actuator velocity-derivative.  With zero damping this equals explicit.
  # <flag eulerdamp="disable"/> (Go2 XMLs) makes Euler fully explicit.
  _DSBL_EULERDAMP = 32768  # mujoco.mjtDisableBit.mjDSBL_EULERDAMP
  if integ == IntegratorType.EULER and (
      m.opt.disableflags & _DSBL_EULERDAMP
  ):
    qacc = d.qacc
  else:
    qacc = _implicit_qacc(m, d)
  qvel = d.qvel + h * qacc
  qpos = _integrate_pos(m, d.qpos, qvel, h)
  return d.replace(qpos=qpos, qvel=qvel, qacc=qacc, time=d.time + h)


def step(m: Model, d: Data, sensors: bool = True) -> Data:
  """One physics step: forward dynamics + integration.

  When the model admits it, the whole forward-plus-implicit-solve chain
  runs as ONE fused region (physics/fwd_fused.py) whose batched TPU path
  stays in lanes layout end-to-end — qM/qacc_smooth/qfrc_smooth no longer
  round-trip through batch-major between the smooth, solver, and
  integrator stages.  Semantics are identical to forward() + integrate()
  (the fused base path composes the same per-env stage functions)."""
  import os

  from rsr_mjx_tpu.physics import fwd_fused as _ff

  if _ff.supported(m) and os.environ.get('RSR_DISABLE_FWD_FUSED', '0') != '1':
    with jax.default_matmul_precision('highest'):
      d, qacc_i = _ff.forward_implicit_fused(m, d)
      if sensors:
        d = _sensors.sensordata(m, d)
      h = m.opt.timestep
      qvel = d.qvel + h * qacc_i
      qpos = _integrate_pos(m, d.qpos, qvel, h)
      return d.replace(qpos=qpos, qvel=qvel, qacc=qacc_i, time=d.time + h)
  d = forward(m, d, sensors=sensors)
  with jax.default_matmul_precision('highest'):
    return integrate(m, d)
