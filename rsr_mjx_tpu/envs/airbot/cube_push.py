"""Airbot Play cube-push environment (TPU-native).

Re-implements both reference variants on the unified Env substrate:
  - ``variant='rsr'``  → test/airbot.py (sf.xml scene, task-success done,
    joint6 bearing hysteresis via ``last_action``, task-complete bonus)
  - ``variant='train'`` → ppo_train/airbot_training/cube_env.py (cube.xml
    scene frictions, cube-fall done, no hysteresis)

RNG split order and all reward/termination formulas follow the reference
exactly so fixed-seed behavior is comparable (test/airbot.py:102-268,
cube_env.py:95-229).

Action contract (5-dim): delta position targets for actuators
(j1, j2, j3, j5, j6) scaled by [0.02, 0.02, 0.02, 0, 0]; the j5 target is
analytically slaved to keep the end-effector pointing down
(``-(1.57 + q2 + q3)``, test/airbot.py:170) and the j6 target points the
gripper along the cube→target bearing (test/airbot.py:178-182).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jp
import numpy as np

from rsr_mjx_tpu import physics
from rsr_mjx_tpu.envs import core
from rsr_mjx_tpu.envs.airbot.scene import build_cube_scene
from rsr_mjx_tpu.physics.io import name2id
from rsr_mjx_tpu.physics.types import Model


class AirbotCubePush(core.Env):
  """Cube-push manipulation task."""

  def __init__(
      self,
      variant: str = 'rsr',
      push_reward_weight: float = 6.0,
      siet_to_box_reward_weight: float = 3.0,
      healthy_reward: float = 1.0,
      endpoint_min_z_pos: float | None = None,
      noise_scale: float = 1e-2,
      decimation: int = 4,
      cube_min_x: float | None = None,
      cube_max_x: float | None = None,
      cube_min_y: float | None = None,
      cube_max_y: float | None = None,
      target_min_x: float | None = None,
      target_max_x: float | None = None,
      target_min_y: float | None = None,
      target_max_y: float | None = None,
      max_contacts: int = 24,
  ):
    assert variant in ('rsr', 'train'), variant
    self.variant = variant
    if variant == 'rsr':
      xml = build_cube_scene(table_friction=0.4, cube_friction=1.22)
      spawn = dict(
          cube_min_x=0.28, cube_max_x=0.29,
          cube_min_y=-0.005, cube_max_y=0.005,
          target_min_x=0.5, target_max_x=0.51,
          target_min_y=-0.005, target_max_y=0.005,
      )
      self._endpoint_min_z = (
          0.8 if endpoint_min_z_pos is None else endpoint_min_z_pos
      )
    else:
      xml = build_cube_scene(table_friction=1.0, cube_friction=1.0)
      spawn = dict(
          cube_min_x=0.29, cube_max_x=0.34,
          cube_min_y=-0.04, cube_max_y=0.01,
          target_min_x=0.4364427, target_max_x=0.4864427,
          target_min_y=0.07352592, target_max_y=0.12352592,
      )
      self._endpoint_min_z = (
          0.778 if endpoint_min_z_pos is None else endpoint_min_z_pos
      )
    overrides = dict(
        cube_min_x=cube_min_x, cube_max_x=cube_max_x,
        cube_min_y=cube_min_y, cube_max_y=cube_max_y,
        target_min_x=target_min_x, target_max_x=target_max_x,
        target_min_y=target_min_y, target_max_y=target_max_y,
    )
    for k, v in overrides.items():
      if v is not None:
        spawn[k] = v
    self._spawn = spawn

    # max_contacts > 0 enables top-k active-contact selection in the Newton
    # solver (exact as long as k ≥ simultaneously-touching contacts; the
    # cube scene has 480 pair slots but ≤ 12 ever penetrate even under an
    # end-effector slam — measured on the full model, see
    # test_contact_selection_parity_manipulation_regime in
    # tests/test_physics_contact.py; the round-5 default 24 keeps 2x
    # margin).  Pass max_contacts=0 for the full (no-selection) solve.
    self._model, self._mjm = physics.load_model_from_xml(
        xml, max_contacts=max_contacts
    )
    self._push_w = push_reward_weight
    self._site2box_w = siet_to_box_reward_weight
    self._healthy_w = healthy_reward
    self._noise = noise_scale
    self._decimation = decimation
    self._action_scale = jp.array([0.02, 0.02, 0.02, 0.0, 0.0])

    m = self._model
    self._cube_body = name2id(m, 'body', 'cube_for_push')
    self._target_body = name2id(m, 'body', 'target_pos')
    self._site_id = name2id(m, 'site', 'endpoint')
    jnames = ['joint1', 'joint2', 'joint3', 'joint4', 'joint5', 'joint6']
    self._joint_qadr = np.array(
        [m.jnt_qposadr.arr[name2id(m, 'joint', j)] for j in jnames]
    )
    self._finger_qadr = np.array(
        [m.jnt_qposadr.arr[name2id(m, 'joint', 'endleft')]]
    )
    self._box_qadr = int(
        m.jnt_qposadr.arr[m.body_jntadr.arr[self._cube_body]]
    )
    self._target_qadr = int(
        m.jnt_qposadr.arr[m.body_jntadr.arr[self._target_body]]
    )
    self._lowers = m.actuator_ctrlrange[:, 0]
    self._uppers = m.actuator_ctrlrange[:, 1]

  # -- Env interface ---------------------------------------------------

  @property
  def model(self) -> Model:
    return self._model

  def bind_model(self, model: Model):
    """Swap the traced model (domain-randomization vmap hook)."""
    self._model = model

  @property
  def action_size(self) -> int:
    return 5

  @property
  def ctrl_dt(self) -> float:
    return 0.0025 * self._decimation

  @property
  def sim_dt(self) -> float:
    return 0.0025

  @property
  def n_substeps(self) -> int:
    return self._decimation

  def reset(self, rng: jax.Array) -> core.State:
    m = self._model
    sp = self._spawn
    rng, rng1, rng2, rng3, rng4 = jax.random.split(rng, 5)
    low, hi = -self._noise, self._noise
    qpos = m.qpos0 + jax.random.uniform(rng1, (m.nq,), minval=low, maxval=hi)
    qpos = qpos.at[self._joint_qadr].add(
        jp.array([0, -0.5422302, 0.45173569, 1.5718, -1.4794435, 1.1731174])
    )
    qpos = qpos.at[self._finger_qadr].set(-0.033)
    qvel = jax.random.uniform(rng2, (m.nv,), minval=low, maxval=hi)
    joint_ctrl = jp.array(
        [0, -0.73151061, 0.455936904, -1.4794435, 1.1731174]
    ) + jax.random.uniform(rng3, (m.nu,), minval=low, maxval=hi)
    target_pos = jax.random.uniform(
        rng4, (3,),
        minval=jp.array([sp['target_min_x'], sp['target_min_y'], 0.82]),
        maxval=jp.array([sp['target_max_x'], sp['target_max_y'], 0.82]),
    )
    cube_pos = jax.random.uniform(
        rng, (3,),
        minval=jp.array([sp['cube_min_x'], sp['cube_min_y'], 0.82]),
        maxval=jp.array([sp['cube_max_x'], sp['cube_max_y'], 0.82]),
    )
    qpos = qpos.at[self._box_qadr : self._box_qadr + 3].set(cube_pos)
    qpos = qpos.at[self._target_qadr : self._target_qadr + 3].set(target_pos)

    data = core.init(m, qpos=qpos, qvel=qvel)
    data = data.replace(ctrl=jp.asarray(joint_ctrl, data.ctrl.dtype))

    new_cube_pos = jp.array([0.37342, -0.07989])
    reward, done, zero = jp.zeros(3)
    metrics = {
        'push_reward': zero,
        'ctrl_cost': zero,
        'siet_to_box_reward': zero,
    }
    info = {
        'target_pos': data.xpos[self._target_body],
        'new_cube_pos': new_cube_pos,
        'site_pos': data.site_xpos[self._site_id],
        'cube_pos': data.xpos[self._cube_body],
        'reached_box': 0.0,
        'last_action': zero,
    }
    obs = self._get_obs(data, info)
    return core.State(data, obs, reward, done, metrics, info)

  def step(self, state: core.State, action: jax.Array) -> core.State:
    m = self._model
    data0 = state.data
    j = self._joint_qadr

    delta = self._action_scale * action
    action = data0.ctrl + delta
    # analytic couplings (test/airbot.py:170-182): j5 target keeps the
    # end-effector vertical; j6 target tracks the cube→target bearing,
    # frozen near the target in the rsr variant (hysteresis).
    action = action.at[3].set(-(1.57 + data0.qpos[j[1]] + data0.qpos[j[2]]))

    cube_pos0 = data0.xpos[self._cube_body]
    target_xy = state.info['target_pos'][:2]
    delta_x = target_xy[0] - cube_pos0[0]
    delta_y = target_xy[1] - cube_pos0[1]
    angle_to_box = jp.arctan2(delta_y, delta_x + 0.00001)
    bearing = -angle_to_box + action[0] + 1.5708
    if self.variant == 'rsr':
      dis0 = jp.linalg.norm(state.info['target_pos'] - cube_pos0)
      bearing = jp.where(dis0 < 0.03, state.info['last_action'], bearing)
    action = action.at[4].set(bearing)
    state.info['last_action'] = action[4]

    action = jp.clip(action, self._lowers, self._uppers)
    data1 = core.step(m, data0, action, self._decimation)

    box_target_dis = jp.linalg.norm(
        state.info['target_pos'] - data1.xpos[self._cube_body]
    )
    succ_eps = 0.003 if self.variant == 'rsr' else 0.005
    box_target_dis = jp.where(box_target_dis < succ_eps, 0.0, box_target_dis)
    push_reward = 1 / (1 + 3 * box_target_dis) * self._push_w

    site_pos = data1.site_xpos[self._site_id]
    cube_pos = data1.xpos[self._cube_body]
    site_z_reward = jp.where(site_pos[2] < 0.82, 1.0, 0.0)

    # approach point one cube-length short of the target bearing
    # (test/airbot.py:210-218)
    delta_x = target_xy[0] - cube_pos[0]
    delta_y = target_xy[1] - cube_pos[1]
    angle_to_box = jp.arctan2(delta_y, delta_x + 0.00001)
    distance = jp.sqrt(delta_x**2 + delta_y**2) + 0.04
    x_ = distance * jp.cos(angle_to_box)
    y_ = distance * jp.sin(angle_to_box)
    ncp = state.info['new_cube_pos']
    ncp = ncp.at[0].set(delta_x - x_ + cube_pos[0])
    ncp = ncp.at[1].set(delta_y - y_ + cube_pos[1])
    state.info['new_cube_pos'] = ncp

    site2cube = jp.linalg.norm(site_pos[:2] - ncp)
    site2cube = jp.where(site2cube < 0.042, 0.0, site2cube - 0.042)
    site2cube_reward = (1 - jp.tanh(5 * site2cube)) * self._site2box_w
    site2cube_reward = jp.where(
        box_target_dis < 0.005, self._site2box_w, site2cube_reward
    )

    if self.variant == 'rsr':
      # health gate counts workspace violations (reward only; the final
      # done is success-only — test/airbot.py:227-237)
      viol = jp.where(site_pos[2] < self._endpoint_min_z, 1.0, 0.0)
      viol = jp.where(site_pos[0] > 1.0, 1.0, viol)
      viol = jp.where(site_pos[0] < -0.6, 1.0, viol)
      viol = jp.where(site_pos[1] > 0.3, 1.0, viol)
      viol = jp.where(site_pos[1] < -0.3, 1.0, viol)
      viol = jp.where(cube_pos[2] < 0.6, 1.0, viol)
      health_reward = self._healthy_w * jp.abs(viol - 1.0)
      task_complete = jp.where(box_target_dis < 0.003, 5.0, 0.0)
      reward = (
          push_reward + site2cube_reward + health_reward + task_complete
          + site_z_reward
      )
      done = jp.where(box_target_dis < 0.003, 1.0, 0.0)
    else:
      health_reward = self._healthy_w * jp.abs(
          jp.where(site_pos[2] < self._endpoint_min_z, 1.0, 0.0) - 1.0
      )
      reward = push_reward + site2cube_reward + health_reward + site_z_reward
      done = jp.where(cube_pos[2] < 0.6, 1.0, 0.0)

    reward = jp.clip(reward, -1e2, 1e2)
    obs = self._get_obs(data1, state.info)
    state.metrics.update(
        push_reward=push_reward,
        ctrl_cost=0.0 * reward,
        siet_to_box_reward=site2cube_reward,
    )
    state.info.update(site_pos=site_pos, cube_pos=cube_pos)
    return state.replace(data=data1, obs=obs, reward=reward, done=done)

  def _get_obs(self, data, info: Dict[str, Any]) -> jax.Array:
    """23-dim observation (test/airbot.py:254-268)."""
    return jp.concatenate([
        data.qpos[self._joint_qadr],
        data.site_xpos[self._site_id],
        info['target_pos'],
        data.xpos[self._cube_body],
        info['new_cube_pos'],
        info['target_pos'] - data.xpos[self._cube_body],
        data.xpos[self._cube_body] - data.site_xpos[self._site_id],
    ])
