"""Airbot domain randomization (reference:
ppo_train/airbot_training/domain_randomize.py).

Per-env scaling of table/cube/finger geom friction, cube mass, and arm dof
damping/frictionloss; returns (batched_model, in_axes).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rsr_mjx_tpu.physics.io import name2id

_FRICTION_TABLE_CUBE = (0.68, 1.32)
_MASS_CUBE = (0.84, 1.16)
_FRICTION_FINGER = (0.76, 1.24)
_JOINT_SCALE = (0.92, 1.08)

_ARM_DOF_SLICE = slice(0, 8)


def domain_randomize(model, rng: jax.Array):
  table_geom_id = name2id(model, 'geom', 'table-b')
  cube_geom_id = name2id(model, 'geom', 'geom_for_push')
  cube_body_id = name2id(model, 'body', 'cube_for_push')
  left_body = name2id(model, 'body', 'left')
  right_body = name2id(model, 'body', 'right')
  finger_geom_ids = jnp.asarray(
      [
          g
          for g in range(model.ngeom)
          if int(model.geom_bodyid.arr[g]) in (left_body, right_body)
      ],
      dtype=jnp.int32,
  )

  @jax.vmap
  def rand_dynamics(rng):
    rng, key = jax.random.split(rng)
    table_scale = jax.random.uniform(
        key, minval=_FRICTION_TABLE_CUBE[0], maxval=_FRICTION_TABLE_CUBE[1]
    )
    rng, key = jax.random.split(rng)
    cube_friction_scale = jax.random.uniform(
        key, minval=_FRICTION_TABLE_CUBE[0], maxval=_FRICTION_TABLE_CUBE[1]
    )
    rng, key = jax.random.split(rng)
    cube_mass_scale = jax.random.uniform(
        key, minval=_MASS_CUBE[0], maxval=_MASS_CUBE[1]
    )
    rng, key = jax.random.split(rng)
    finger_scale = jax.random.uniform(
        key, minval=_FRICTION_FINGER[0], maxval=_FRICTION_FINGER[1]
    )
    rng, key = jax.random.split(rng)
    damping_scale = jax.random.uniform(
        key, minval=_JOINT_SCALE[0], maxval=_JOINT_SCALE[1]
    )
    rng, key = jax.random.split(rng)
    frictionloss_scale = jax.random.uniform(
        key, minval=_JOINT_SCALE[0], maxval=_JOINT_SCALE[1]
    )

    geom_friction = model.geom_friction
    geom_friction = geom_friction.at[table_geom_id].multiply(table_scale)
    geom_friction = geom_friction.at[cube_geom_id].multiply(
        cube_friction_scale
    )
    geom_friction = geom_friction.at[finger_geom_ids].multiply(finger_scale)

    body_mass = model.body_mass.at[cube_body_id].multiply(cube_mass_scale)
    dof_damping = model.dof_damping.at[_ARM_DOF_SLICE].multiply(
        damping_scale
    )
    dof_frictionloss = model.dof_frictionloss.at[_ARM_DOF_SLICE].multiply(
        frictionloss_scale
    )
    return geom_friction, body_mass, dof_damping, dof_frictionloss

  geom_friction, body_mass, dof_damping, dof_frictionloss = rand_dynamics(rng)

  in_axes = jax.tree.map(lambda _: None, model)
  replaced = dict(
      geom_friction=geom_friction,
      body_mass=body_mass,
      dof_damping=dof_damping,
      dof_frictionloss=dof_frictionloss,
  )
  in_axes = dataclasses.replace(in_axes, **{k: 0 for k in replaced})
  model = dataclasses.replace(model, **replaced)
  return model, in_axes
