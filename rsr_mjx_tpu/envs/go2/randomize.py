"""Go2 domain randomization (reference: locomotion/go2/randomize.py).

Returns (batched_model, in_axes) for the DomainRandomizationVmapWrapper:
floor friction 0.4–1.0, joint frictionloss ±10%, armature ×1.0–1.05,
Kp/Kd scale ±5% into actuator gain/bias, torso COM shift ±0.2 m, all-body
mass ±10% plus torso ±3 kg, qpos0 joint offsets ±0.05.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jp

FLOOR_GEOM_ID = 0
TORSO_BODY_ID = 1


def domain_randomize(model, rng: jax.Array):
  @jax.vmap
  def rand_dynamics(rng):
    rng, key = jax.random.split(rng)
    geom_friction = model.geom_friction.at[FLOOR_GEOM_ID, 0].set(
        jax.random.uniform(key, minval=0.4, maxval=1.0)
    )
    rng, key = jax.random.split(rng)
    frictionloss = model.dof_frictionloss[6:] * jax.random.uniform(
        key, shape=(12,), minval=0.9, maxval=1.1
    )
    dof_frictionloss = model.dof_frictionloss.at[6:].set(frictionloss)
    rng, key = jax.random.split(rng)
    armature = model.dof_armature[6:] * jax.random.uniform(
        key, shape=(12,), minval=1.0, maxval=1.05
    )
    dof_armature = model.dof_armature.at[6:].set(armature)
    rng, key = jax.random.split(rng)
    kp_scale = jax.random.uniform(key, shape=(12,), minval=0.95, maxval=1.05)
    actuator_gainprm = model.actuator_gainprm.at[:, 0].set(
        model.actuator_gainprm[:, 0] * kp_scale
    )
    actuator_biasprm = model.actuator_biasprm.at[:, 1].set(
        model.actuator_biasprm[:, 1] * kp_scale
    )
    rng, key = jax.random.split(rng)
    kd_scale = jax.random.uniform(key, shape=(12,), minval=0.95, maxval=1.05)
    dof_damping = model.dof_damping.at[6:].set(
        model.dof_damping[6:] * kd_scale
    )
    rng, key = jax.random.split(rng)
    dpos_x = jax.random.uniform(key, (), minval=-0.2, maxval=0.2)
    rng, key = jax.random.split(rng)
    dpos_yz = jax.random.uniform(key, (2,), minval=-0.2, maxval=0.2)
    dpos = jp.concatenate([jp.array([dpos_x]), dpos_yz])
    body_ipos = model.body_ipos.at[TORSO_BODY_ID].set(
        model.body_ipos[TORSO_BODY_ID] + dpos
    )
    rng, key = jax.random.split(rng)
    dmass = jax.random.uniform(
        key, shape=(model.nbody,), minval=0.9, maxval=1.1
    )
    body_mass = model.body_mass * dmass
    rng, key = jax.random.split(rng)
    dmass = jax.random.uniform(key, minval=-3.0, maxval=3.0)
    body_mass = body_mass.at[TORSO_BODY_ID].add(dmass)
    rng, key = jax.random.split(rng)
    qpos0 = model.qpos0.at[7:].set(
        model.qpos0[7:]
        + jax.random.uniform(key, shape=(12,), minval=-0.05, maxval=0.05)
    )
    return (
        geom_friction,
        body_ipos,
        body_mass,
        qpos0,
        dof_frictionloss,
        dof_armature,
        actuator_gainprm,
        actuator_biasprm,
        dof_damping,
    )

  (
      friction,
      body_ipos,
      body_mass,
      qpos0,
      dof_frictionloss,
      dof_armature,
      actuator_gainprm,
      actuator_biasprm,
      dof_damping,
  ) = rand_dynamics(rng)

  in_axes = jax.tree.map(lambda x: None, model)
  replaced = dict(
      geom_friction=friction,
      body_ipos=body_ipos,
      body_mass=body_mass,
      qpos0=qpos0,
      dof_frictionloss=dof_frictionloss,
      dof_armature=dof_armature,
      actuator_gainprm=actuator_gainprm,
      actuator_biasprm=actuator_biasprm,
      dof_damping=dof_damping,
  )
  in_axes = dataclasses.replace(in_axes, **{k: 0 for k in replaced})
  model = dataclasses.replace(model, **replaced)
  return model, in_axes
