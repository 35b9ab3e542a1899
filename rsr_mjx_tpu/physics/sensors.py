"""Sensor evaluation (subset used by the Go2 suite: IMU gyro /
accelerometer / velocimeter, frame pos/quat/axes, frame lin/ang velocity,
upvector via framezaxis; reference sensor list go2_mjx.xml:214-232 and
accessors mujoco_playground _src/mjx_env.py:213-252)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rsr_mjx_tpu.physics.types import Data, Model, SensorType

# mjtObj values
OBJ_BODY = 1
OBJ_XBODY = 2
OBJ_GEOM = 5
OBJ_SITE = 6


def _frame(m: Model, d: Data, objtype: int, objid: int):
  """(pos, mat, bodyid) of the referenced frame."""
  if objtype == OBJ_SITE:
    return d.site_xpos[objid], d.site_xmat[objid], int(m.site_bodyid[objid])
  if objtype == OBJ_XBODY:
    return d.xpos[objid], d.xmat[objid], objid
  if objtype == OBJ_BODY:
    return d.xipos[objid], d.ximat[objid], objid
  if objtype == OBJ_GEOM:
    return (
        d.geom_xpos[objid],
        d.geom_xmat[objid],
        int(m.geom_bodyid[objid]),
    )
  raise NotImplementedError(f'sensor objtype {objtype}')


def _point_vel(m: Model, d: Data, body: int, point: jax.Array):
  """World-frame (angvel, linvel) of a body-fixed point."""
  root = int(m.body_rootid[body])
  anchor = d.subtree_com[root]
  ang = d.cvel[body, :3]
  lin = d.cvel[body, 3:] + jnp.cross(ang, point - anchor)
  return ang, lin


def sensordata(m: Model, d: Data) -> Data:
  if m.nsensor == 0:
    return d

  out = jnp.zeros(m.nsensordata, dtype=d.qpos.dtype)
  for s in range(m.nsensor):
    stype = int(m.sensor_type[s])
    objid = int(m.sensor_objid[s])
    objtype = int(m.sensor_objtype[s])
    adr = int(m.sensor_adr[s])
    pos, mat, body = _frame(m, d, objtype, objid)
    # optional reference frame (e.g. Go2 foot positions relative to the imu
    # site, go2_mjx_feetonly.xml framepos reftype/refname)
    refid = int(m.sensor_refid[s]) if m.sensor_refid is not None else -1
    ref = None
    if refid >= 0:
      reftype = int(m.sensor_reftype[s])
      ref = _frame(m, d, reftype, refid)

    if stype == SensorType.FRAMEPOS:
      val = pos if ref is None else ref[1].T @ (pos - ref[0])
    elif stype == SensorType.FRAMEQUAT:
      # reconstruct quat from body quat and local offset (sites/geoms share
      # the body quat composed with their local quat; use mat→quat-free path
      # by reading xquat for bodies and converting mat otherwise)
      val = _mat_to_quat(mat)
    elif stype == SensorType.FRAMEXAXIS:
      val = mat[:, 0] if ref is None else ref[1].T @ mat[:, 0]
    elif stype == SensorType.FRAMEYAXIS:
      val = mat[:, 1] if ref is None else ref[1].T @ mat[:, 1]
    elif stype == SensorType.FRAMEZAXIS:
      val = mat[:, 2] if ref is None else ref[1].T @ mat[:, 2]
    elif stype == SensorType.FRAMELINVEL:
      _, lin = _point_vel(m, d, body, pos)
      if ref is not None:
        _, ref_lin = _point_vel(m, d, ref[2], ref[0])
        lin = ref[1].T @ (lin - ref_lin)
      val = lin
    elif stype == SensorType.FRAMEANGVEL:
      ang, _ = _point_vel(m, d, body, pos)
      val = ang
    elif stype == SensorType.GYRO:
      ang, _ = _point_vel(m, d, body, pos)
      val = mat.T @ ang
    elif stype == SensorType.VELOCIMETER:
      _, lin = _point_vel(m, d, body, pos)
      val = mat.T @ lin
    elif stype == SensorType.ACCELEROMETER:
      val = _accelerometer(m, d, body, pos, mat)
    elif stype == SensorType.SUBTREELINVEL:
      val = _subtree_linvel(m, d, objid)
    else:
      raise NotImplementedError(f'sensor type {stype}')
    dim = int(m.sensor_dim[s])
    out = jax.lax.dynamic_update_slice(out, val.reshape(-1)[:dim], (adr,))
  return d.replace(sensordata=out)


def _mat_to_quat(mat: jax.Array) -> jax.Array:
  """Rotation matrix -> quaternion (w, x, y, z), branch-free."""
  m00, m01, m02 = mat[0, 0], mat[0, 1], mat[0, 2]
  m10, m11, m12 = mat[1, 0], mat[1, 1], mat[1, 2]
  m20, m21, m22 = mat[2, 0], mat[2, 1], mat[2, 2]
  tr = m00 + m11 + m22
  # four candidate constructions; pick the numerically best
  qw = jnp.stack([
      1.0 + tr, m21 - m12, m02 - m20, m10 - m01,
  ])
  qx = jnp.stack([
      m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20,
  ])
  qy = jnp.stack([
      m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21,
  ])
  qz = jnp.stack([
      m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22,
  ])
  cands = jnp.stack([qw, qx, qy, qz])  # (4 variants, 4 components)
  mags = jnp.stack([tr, m00, m11, m22])
  best = jnp.argmax(mags)
  q = cands[best]
  q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
  q = q * jnp.sign(q[0] + jnp.where(q[0] == 0, 1.0, 0.0))
  return q


def _accelerometer(m: Model, d: Data, body: int, pos, mat):
  """Specific force at a site: linear acceleration of the site point minus
  gravity, in the site frame.  Uses qacc + velocity-product propagation."""
  # spatial acceleration of the body: sum over ancestor dofs of
  # cdof * qacc + cvel ×ₘ cdof * qvel  (same recursion as RNE)
  mask = jnp.asarray(m.anc_mask.arr[body], dtype=pos.dtype)
  from rsr_mjx_tpu.physics import lie

  cd_dot = lie.motion_cross(
      jnp.broadcast_to(d.cvel[body], d.cdof.shape), d.cdof
  )
  cacc = jnp.sum(
      (d.cdof * d.qacc[:, None] + cd_dot * d.qvel[:, None])
      * mask[:, None],
      axis=0,
  )
  root = int(m.body_rootid[body])
  anchor = d.subtree_com[root]
  ang_acc = cacc[:3]
  lin_acc = cacc[3:] + jnp.cross(ang_acc, pos - anchor)
  angvel, linvel = _point_vel(m, d, body, pos)
  # convective term: a_point = a + ω × v_point
  a_point = lin_acc + jnp.cross(angvel, linvel)
  return mat.T @ (a_point - m.opt.gravity)


def _subtree_linvel(m: Model, d: Data, body: int):
  """Mass-weighted average linear velocity of the subtree rooted at body."""
  # collect subtree bodies statically
  subtree = [body]
  for b in range(body + 1, m.nbody):
    if int(m.body_parentid[b]) in subtree:
      subtree.append(b)
  mass = jnp.stack([m.body_mass[b] for b in subtree])
  vels = []
  for b in subtree:
    _, lin = _point_vel(m, d, b, d.xipos[b])
    vels.append(lin)
  vels = jnp.stack(vels)
  tot = jnp.maximum(jnp.sum(mass), 1e-12)
  return jnp.sum(vels * mass[:, None], axis=0) / tot
