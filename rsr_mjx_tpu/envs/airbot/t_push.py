"""Airbot Play T-shape push environment.

Re-implements ppo_train/airbot_training/T_shape_env.py on the unified
substrate: 16-dim obs (6 arm qpos, endpoint z, target−block deltas for
base/vertical geoms, orientation angle xita, approach vector), 5-dim delta
action with the same analytic j5/j6 couplings as cube-push, reward mixing
base/vertical position terms (0.1515 each) with the orientation term
(0.66) (T_shape_env.py:158-172).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jp
import numpy as np

from rsr_mjx_tpu import physics
from rsr_mjx_tpu.envs import core
from rsr_mjx_tpu.envs.airbot.scene import build_tshape_scene
from rsr_mjx_tpu.physics.io import name2id
from rsr_mjx_tpu.physics.types import Model


class AirbotTPush(core.Env):
  """T-shape push manipulation task."""

  def __init__(
      self,
      push_reward_weight: float = 10.0,
      siet_to_box_reward_weight: float = 3.0,
      healthy_reward: float = 1.0,
      endpoint_min_z_pos: float = 0.78,
      noise_scale: float = 1e-2,
      decimation: int = 4,
      max_contacts: int = 32,
  ):
    # top-k active-contact selection (see cube_push.py); 0 = full solve.
    self._model, self._mjm = physics.load_model_from_xml(
        build_tshape_scene(), max_contacts=max_contacts
    )
    self._push_w = push_reward_weight
    self._site2box_w = siet_to_box_reward_weight
    self._healthy_w = healthy_reward
    self._endpoint_min_z = endpoint_min_z_pos
    self._noise = noise_scale
    self._decimation = decimation
    self._action_scale = jp.array([0.02, 0.02, 0.02, 0.0, 0.0])

    m = self._model
    self._T_body = name2id(m, 'body', 'T_block')
    self._target_body = name2id(m, 'body', 'T_target')
    self._site_id = name2id(m, 'site', 'endpoint')
    self._T_tail = name2id(m, 'site', 'T_tail')
    self._T_target_tail = name2id(m, 'site', 'T_target_tail')
    self._base_geom = name2id(m, 'geom', 'base_block')
    self._vert_geom = name2id(m, 'geom', 'vertical_block')
    self._target_base_geom = name2id(m, 'geom', 'base_target')
    self._target_vert_geom = name2id(m, 'geom', 'vertical_target')
    jnames = ['joint1', 'joint2', 'joint3', 'joint4', 'joint5', 'joint6']
    self._joint_qadr = np.array(
        [m.jnt_qposadr.arr[name2id(m, 'joint', j)] for j in jnames]
    )
    self._lowers = m.actuator_ctrlrange[:, 0]
    self._uppers = m.actuator_ctrlrange[:, 1]

  @property
  def model(self) -> Model:
    return self._model

  def bind_model(self, model: Model):
    self._model = model

  @property
  def action_size(self) -> int:
    return 5

  @property
  def ctrl_dt(self) -> float:
    return 0.00025 * self._decimation

  @property
  def sim_dt(self) -> float:
    return 0.00025

  @property
  def n_substeps(self) -> int:
    return self._decimation

  def reset(self, rng: jax.Array) -> core.State:
    m = self._model
    rng, rng1, rng2, rng3, rng4 = jax.random.split(rng, 5)
    low, hi = -self._noise, self._noise
    qpos = m.qpos0 + jax.random.uniform(rng1, (m.nq,), minval=low, maxval=hi)
    qpos = qpos.at[self._joint_qadr].add(
        jp.array([0, -0.57303354, 0.381795, 1.5718, -1.3787, 1.1731174])
    )
    qvel = jax.random.uniform(rng2, (m.nv,), minval=low, maxval=hi)
    joint_ctrl = jp.array(
        [0, -0.57303354, 0.381795, -1.3787, 1.1731174]
    ) + jax.random.uniform(rng3, (m.nu,), minval=low, maxval=hi)

    data = core.init(m, qpos=qpos, qvel=qvel)
    data = data.replace(ctrl=jp.asarray(joint_ctrl, data.ctrl.dtype))

    new_T_pos = jp.array([0.24739072, -0.00496255])
    reward, done, zero = jp.zeros(3)
    metrics = {
        'push_reward': zero,
        'siet2cube_reward': zero,
        'health_reward': zero,
        'task_complete_reward': zero,
        'site_z_reward': zero,
    }
    target_quat = data.xquat[self._target_body]
    info = {
        'target_base_pos': data.geom_xpos[self._target_base_geom],
        'target_vertical_pos': data.geom_xpos[self._target_vert_geom],
        'target_w': target_quat[0] * 10,
        'new_T_pos': new_T_pos,
        'site_pos': data.site_xpos[self._site_id],
        'T_pos': data.xpos[self._T_body],
        'xita': jp.asarray(0.2876),
    }
    obs = self._get_obs(data, info)
    return core.State(data, obs, reward, done, metrics, info)

  def step(self, state: core.State, action: jax.Array) -> core.State:
    m = self._model
    data0 = state.data
    j = self._joint_qadr

    delta = self._action_scale * action
    action = data0.ctrl + delta
    action = action.at[3].set(-(1.57 + data0.qpos[j[1]] + data0.qpos[j[2]]))

    # j6 bearing towards the T tail (T_shape_env.py:146-153)
    site = data0.site_xpos[self._site_id]
    tail_xy = data0.site_xpos[self._T_tail][:2]
    delta_x = tail_xy[0] - site[0]
    delta_y = tail_xy[1] - site[1]
    angle_to_box = jp.arctan2(delta_y, delta_x + 0.00001)
    action = action.at[4].set(-angle_to_box + action[0] + 1.5708)

    action = jp.clip(action, self._lowers, self._uppers)
    data1 = core.step(m, data0, action, self._decimation)

    dis_base = jp.linalg.norm(
        state.info['target_base_pos'] - data1.geom_xpos[self._base_geom]
    )
    dis_base = jp.where(dis_base < 0.005, 0.0, dis_base)
    push_reward_base = 1.0 / (1 + 10.0 * dis_base)
    dis_vert = jp.linalg.norm(
        state.info['target_vertical_pos'] - data1.geom_xpos[self._vert_geom]
    )
    dis_vert = jp.where(dis_vert < 0.005, 0.0, dis_vert)
    push_reward_vert = 1.0 / (1 + 10.0 * dis_vert)

    box_array = (
        data1.geom_xpos[self._vert_geom] - data1.geom_xpos[self._base_geom]
    )
    target_array = (
        state.info['target_vertical_pos'] - state.info['target_base_pos']
    )
    xita = jp.arccos(
        jp.clip(
            jp.dot(box_array, target_array)
            / (jp.linalg.norm(box_array) * jp.linalg.norm(target_array)),
            -1,
            1,
        )
    )
    state.info['xita'] = xita
    push_w_reward = 1.0 / (1 + 6.0 * xita)
    push_reward = (
        0.1515 * push_reward_base
        + 0.1515 * push_reward_vert
        + 0.66 * push_w_reward
    ) * self._push_w

    site_pos = data1.site_xpos[self._site_id]
    T_tail_pos = data1.site_xpos[self._T_tail]

    site_z_reward = jp.where(site_pos[2] < 0.83, 1.0, 0.0)
    z_dis = jp.abs(site_pos[2] - 0.805)
    site_z_reward = site_z_reward + 4.0 / (1 + 3 * z_dis)

    # approach point one tail-length short of the target tail
    target_xy = data1.site_xpos[self._T_target_tail][:2]
    delta_x = target_xy[0] - T_tail_pos[0]
    delta_y = target_xy[1] - T_tail_pos[1]
    angle_to_box = jp.arctan2(delta_y, delta_x + 0.00001)
    distance = jp.sqrt(delta_x**2 + delta_y**2) + 0.025
    x_ = distance * jp.cos(angle_to_box)
    y_ = distance * jp.sin(angle_to_box)
    ncp = state.info['new_T_pos']
    ncp = ncp.at[0].set(delta_x - x_ + T_tail_pos[0])
    ncp = ncp.at[1].set(delta_y - y_ + T_tail_pos[1])
    state.info['new_T_pos'] = ncp

    site2cube = jp.linalg.norm(site_pos[:2] - state.info['new_T_pos'])
    site2cube = jp.where(site2cube < 0.02, 0.0, site2cube - 0.02)
    siet2cube_reward = (1 - jp.tanh(5 * site2cube)) * self._site2box_w

    health_reward = self._healthy_w * jp.abs(
        jp.where(site_pos[2] < self._endpoint_min_z, 1.0, 0.0) - 1.0
    )

    reward = push_reward + siet2cube_reward + health_reward + site_z_reward
    done = jp.where(data1.xpos[self._T_body][2] < 0.6, 1.0, 0.0)
    reward = jp.clip(reward, -1e2, 1e2)
    obs = self._get_obs(data1, state.info)
    state.metrics.update(
        push_reward=push_reward,
        siet2cube_reward=siet2cube_reward,
        health_reward=health_reward,
        site_z_reward=site_z_reward,
    )
    state.info.update(site_pos=site_pos, T_pos=data1.xpos[self._T_body])
    return state.replace(data=data1, obs=obs, reward=reward, done=done)

  def _get_obs(self, data, info: Dict[str, Any]) -> jax.Array:
    """16-dim observation (T_shape_env.py:226-237)."""
    return jp.concatenate([
        data.qpos[self._joint_qadr],
        jp.array([data.site_xpos[self._site_id][2]]),
        info['target_base_pos'] - data.geom_xpos[self._base_geom],
        info['target_vertical_pos'] - data.geom_xpos[self._vert_geom],
        jp.reshape(info['xita'], (1,)),
        info['new_T_pos'] - data.site_xpos[self._site_id][:2],
    ])
