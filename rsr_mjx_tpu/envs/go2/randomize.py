"""Go2 domain randomization.

Capability parity with the reference randomizer
(locomotion/go2/randomize.py): the same model fields are perturbed over
the same ranges — the ranges are the task spec — but expressed natively:
one declarative draw table feeding a vmapped field builder, with the
floor geom and torso body resolved by name instead of hardcoded ids, and
leg-dof slices derived from the free-joint layout instead of literal 12s.

Randomized per env: floor tangential friction resampled in [0.4, 1.0];
leg-joint frictionloss ±10% and armature +0–5%; the PD gains ±5% (one
scale per actuator applied to both the gain and the position-bias term,
so Kp stays consistent across the two); joint damping (Kd) ±5%; torso
COM shifted ±0.2 m; every body mass ±10% plus an extra ±3 kg on the
torso; and the leg home pose ``qpos0`` offset ±0.05 rad.
"""

from __future__ import annotations

import dataclasses

import jax

from rsr_mjx_tpu.envs.go2 import base as go2_base
from rsr_mjx_tpu.physics.io import name2id

# the Go2 root is a free joint: 6 dofs / 7 qpos entries ahead of the legs
_FREE_NV = 6
_FREE_NQ = 7


def domain_randomize(model, rng: jax.Array):
  """Build (batched_model, in_axes) for DomainRandomizationVmapWrapper."""
  floor_gid = name2id(model, 'geom', 'floor')
  torso_bid = name2id(model, 'body', go2_base.ROOT_BODY)
  n_leg = model.nv - _FREE_NV

  # declarative draw table: name → (shape, low, high)
  draw_table = {
      'floor_friction': ((), 0.4, 1.0),
      'frictionloss_scale': ((n_leg,), 0.9, 1.1),
      'armature_scale': ((n_leg,), 1.0, 1.05),
      'kp_scale': ((model.nu,), 0.95, 1.05),
      'kd_scale': ((n_leg,), 0.95, 1.05),
      'com_shift': ((3,), -0.2, 0.2),
      'mass_scale': ((model.nbody,), 0.9, 1.1),
      'torso_extra_mass': ((), -3.0, 3.0),
      'pose_offset': ((n_leg,), -0.05, 0.05),
  }

  def randomized_fields(rng):
    keys = jax.random.split(rng, len(draw_table))
    d = {
        name: jax.random.uniform(k, shape, minval=lo, maxval=hi)
        for k, (name, (shape, lo, hi)) in zip(keys, draw_table.items())
    }
    return dict(
        geom_friction=model.geom_friction.at[floor_gid, 0].set(
            d['floor_friction']
        ),
        dof_frictionloss=model.dof_frictionloss.at[_FREE_NV:].multiply(
            d['frictionloss_scale']
        ),
        dof_armature=model.dof_armature.at[_FREE_NV:].multiply(
            d['armature_scale']
        ),
        # one scale per actuator for both gainprm[:, 0] and the position
        # feedback term biasprm[:, 1] (= -Kp): the PD gain stays coherent
        actuator_gainprm=model.actuator_gainprm.at[:, 0].multiply(
            d['kp_scale']
        ),
        actuator_biasprm=model.actuator_biasprm.at[:, 1].multiply(
            d['kp_scale']
        ),
        dof_damping=model.dof_damping.at[_FREE_NV:].multiply(d['kd_scale']),
        body_ipos=model.body_ipos.at[torso_bid].add(d['com_shift']),
        body_mass=(model.body_mass * d['mass_scale'])
        .at[torso_bid]
        .add(d['torso_extra_mass']),
        qpos0=model.qpos0.at[_FREE_NQ:].add(d['pose_offset']),
    )

  fields = jax.vmap(randomized_fields)(rng)
  in_axes = dataclasses.replace(
      jax.tree.map(lambda _: None, model), **{k: 0 for k in fields}
  )
  return dataclasses.replace(model, **fields), in_axes
