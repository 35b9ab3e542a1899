"""Go2 handstand / footstand tasks.

Native re-implementation of locomotion/go2/handstand.py: balance on the
front (handstand) or rear (footstand) feet, with unwanted-contact geom
termination lists and a desired forward direction of −z (+z for
footstand).  ``Footstand`` subclasses ``Handstand`` and overrides the
keyframe, tracked joints, contact lists and targets
(handstand.py:310-343).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jp
import numpy as np
from ml_collections import config_dict

from rsr_mjx_tpu.envs import core
from rsr_mjx_tpu.envs.go2 import base as go2_base
from rsr_mjx_tpu.physics import collision as _collision
from rsr_mjx_tpu.physics import lie
from rsr_mjx_tpu.physics.io import name2id


def default_config() -> config_dict.ConfigDict:
  """handstand.py:13-49 defaults."""
  return config_dict.create(
      ctrl_dt=0.02,
      sim_dt=0.004,
      episode_length=500,
      Kp=35.0,
      Kd=0.5,
      action_repeat=1,
      action_scale=0.3,
      soft_joint_pos_limit_factor=0.9,
      init_from_crouch=0.0,
      energy_termination_threshold=np.inf,
      noise_config=config_dict.create(
          level=1.0,
          scales=config_dict.create(
              joint_pos=0.01,
              joint_vel=1.5,
              gyro=0.2,
              gravity=0.05,
              linvel=0.1,
          ),
      ),
      reward_config=config_dict.create(
          scales=config_dict.create(
              height=1.0,
              orientation=1.0,
              contact=-0.1,
              action_rate=0.0,
              termination=0.0,
              dof_pos_limits=-0.5,
              torques=0.0,
              pose=-0.1,
              stay_still=0.0,
              energy=0.0,
              dof_acc=0.0,
          ),
      ),
  )


class Handstand(go2_base.Go2Env):
  """Handstand on the front feet."""

  def __init__(
      self,
      config: Optional[config_dict.ConfigDict] = None,
      config_overrides: Optional[Dict[str, Union[str, int, list]]] = None,
  ):
    super().__init__(
        task_xml=go2_base.task_to_xml('full_flat'),
        config=config or default_config(),
        config_overrides=config_overrides,
    )
    self._post_init()

  def _post_init(self) -> None:
    m = self._model
    self._init_q = jp.array(self.keyframe_qpos('home'))
    self._handstand_q = jp.array(self.keyframe_qpos('handstand'))
    self._crouch_q = jp.array(self.keyframe_qpos('pre_recovery'))
    self._default_pose = jp.array(self.keyframe_qpos('home')[7:])
    self._handstand_pose = jp.array(self.keyframe_qpos('handstand')[7:])
    jr = np.asarray(m.jnt_range)[1:]
    self._lowers, self._uppers = jp.asarray(jr[:, 0]), jp.asarray(jr[:, 1])
    c = (self._lowers + self._uppers) / 2
    r = self._uppers - self._lowers
    f = self._config.soft_joint_pos_limit_factor
    self._soft_lowers = c - 0.5 * r * f
    self._soft_uppers = c + 0.5 * r * f
    self._floor_geom_id = name2id(m, 'geom', 'floor')
    self._z_des = 0.55
    self._desired_forward_vec = jp.array([0.0, 0, -1])
    self._joint_ids = jp.array([6, 7, 8, 9, 10, 11])
    self._joint_pose = self._default_pose[self._joint_ids]
    geom_names = [
        'fl_calf1', 'fl_calf2', 'fr_calf1', 'fr_calf2',
        'fl_thigh1', 'fl_thigh2', 'fl_thigh3',
        'fr_thigh1', 'fr_thigh2', 'fr_thigh3',
        'fl_hip', 'fr_hip',
    ]
    self._unwanted_contact_geom_ids = np.array(
        [name2id(m, 'geom', n) for n in geom_names]
    )
    self._feet_geom_ids = np.array(
        [name2id(m, 'geom', n) for n in ('RR', 'RL')]
    )

  def _contacts(self, data, geom_ids) -> jax.Array:
    return jp.array([
        _collision.geoms_colliding(
            self._model, data, int(g), self._floor_geom_id
        )
        for g in geom_ids
    ])

  def reset(self, rng: jax.Array) -> core.State:
    """handstand.py:113-145."""
    m = self._model
    rng, reset_rng = jax.random.split(rng)
    init_from_crouch = jax.random.bernoulli(
        reset_rng, self._config.init_from_crouch
    )
    qpos = jp.where(init_from_crouch, self._crouch_q, self._init_q)
    rng, key = jax.random.split(rng)
    dxy = jax.random.uniform(key, (2,), minval=-0.5, maxval=0.5)
    qpos = qpos.at[0:2].set(qpos[0:2] + dxy)
    rng, key = jax.random.split(rng)
    yaw = jax.random.uniform(key, (1,), minval=-3.14, maxval=3.14)
    quat = lie.axis_angle_to_quat(jp.array([0.0, 0, 1]), yaw[0])
    new_quat = lie.quat_mul(qpos[3:7], quat)
    qpos = qpos.at[3:7].set(new_quat)
    qvel_nonzero = jp.zeros(m.nv)
    rng, key = jax.random.split(rng)
    qvel_nonzero = qvel_nonzero.at[0:6].set(
        jax.random.uniform(key, (6,), minval=-0.5, maxval=0.5)
    )
    qvel = jp.where(init_from_crouch, jp.zeros(m.nv), qvel_nonzero)
    data = core.init(m, qpos=qpos, qvel=qvel, ctrl=qpos[7:])
    info = {
        'step': jp.zeros((), jp.int32),
        'rng': rng,
        'last_act': jp.zeros(m.nu),
    }
    metrics = {
        f'reward/{k}': jp.zeros(())
        for k in self._config.reward_config.scales.keys()
    }
    obs = self._get_obs(data, info)
    reward, done = jp.zeros(2)
    return core.State(data, obs, reward, done, metrics, info)

  def step(self, state: core.State, action: jax.Array) -> core.State:
    """handstand.py:146-169: targets are deltas from current ctrl."""
    m = self._model
    motor_targets = state.data.ctrl + action * self._config.action_scale
    data = core.step(m, state.data, motor_targets, self.n_substeps)
    contact = self._contacts(data, self._unwanted_contact_geom_ids)
    obs = self._get_obs(data, state.info)
    done = self._get_termination(data, contact)
    rewards = self._get_reward(data, action, state.info, done)
    rewards = {
        k: v * self._config.reward_config.scales[k]
        for k, v in rewards.items()
    }
    reward = jp.clip(sum(rewards.values()) * self.dt, 0.0, 10000.0)
    state.info['step'] += 1
    state.info['last_act'] = action
    for k, v in rewards.items():
      state.metrics[f'reward/{k}'] = v
    done = done.astype(reward.dtype)
    return state.replace(data=data, obs=obs, reward=reward, done=done)

  def _get_termination(self, data, contact) -> jax.Array:
    fall = self.get_upvector(data)[-1] < -0.25
    contact_term = jp.any(contact)
    energy = jp.sum(jp.abs(data.actuator_force) * jp.abs(data.qvel[6:]))
    energy_term = energy > self._config.energy_termination_threshold
    return fall | contact_term | energy_term

  def _get_obs(self, data, info: Dict[str, Any]) -> Dict[str, jax.Array]:
    nc = self._config.noise_config

    def noisy(key, x, scale):
      return x + (2 * jax.random.uniform(key, shape=x.shape) - 1) * (
          nc.level * scale
      )

    gyro = self.get_gyro(data)
    info['rng'], k = jax.random.split(info['rng'])
    noisy_gyro = noisy(k, gyro, nc.scales.gyro)
    info['rng'], k = jax.random.split(info['rng'])
    noisy_gravity = noisy(k, self.get_gravity(data), nc.scales.gravity)
    joint_angles = data.qpos[7:]
    info['rng'], k = jax.random.split(info['rng'])
    noisy_joint_angles = noisy(k, joint_angles, nc.scales.joint_pos)
    joint_vel = data.qvel[6:]
    info['rng'], k = jax.random.split(info['rng'])
    noisy_joint_vel = noisy(k, joint_vel, nc.scales.joint_vel)
    linvel = self.get_local_linvel(data)
    info['rng'], k = jax.random.split(info['rng'])
    noisy_linvel = noisy(k, linvel, nc.scales.linvel)

    state = jp.hstack([
        noisy_linvel,
        noisy_gyro,
        noisy_gravity,
        noisy_joint_angles - self._default_pose,
        noisy_joint_vel,
        info['last_act'],
    ])
    torso_height = data.site_xpos[self._imu_site_id][2]
    privileged_state = jp.hstack([
        state,
        gyro,
        self.get_accelerometer(data),
        self.get_local_linvel(data),
        self.get_global_angvel(data),
        joint_angles,
        joint_vel,
        data.actuator_force,
        torso_height,
    ])
    return {'state': state, 'privileged_state': privileged_state}

  def _get_reward(self, data, action, info, done):
    forward = data.site_xmat[self._imu_site_id] @ jp.array([1.0, 0.0, 0.0])
    torso_height = data.site_xpos[self._imu_site_id][2]
    return {
        'height': self._reward_height(torso_height),
        'orientation': self._reward_orientation(
            forward, self._desired_forward_vec
        ),
        'contact': jp.any(self._contacts(data, self._feet_geom_ids)),
        'action_rate': jp.sum(jp.square(action - info['last_act'])),
        'torques': jp.sum(jp.square(data.actuator_force)),
        'termination': done,
        'dof_pos_limits': self._cost_joint_pos_limits(data.qpos[7:]),
        'dof_acc': jp.sum(jp.square(data.qacc[6:])),
        'pose': jp.sum(
            jp.square(data.qpos[7:][self._joint_ids] - self._joint_pose)
        ),
        'stay_still': jp.sum(jp.square(data.qvel[:2]))
        + jp.square(data.qvel[5]),
        'energy': jp.sum(
            jp.abs(data.qvel[6:]) * jp.abs(data.actuator_force)
        ),
    }

  def _reward_orientation(self, forward_vec, up_vec):
    normalized = 0.5 * jp.dot(forward_vec, up_vec) + 0.5
    return jp.square(normalized)

  def _reward_height(self, torso_height):
    error = self._z_des - jp.minimum(torso_height, self._z_des)
    return jp.exp(-error / 1.0)

  def _cost_joint_pos_limits(self, qpos):
    out = -jp.clip(qpos - self._soft_lowers, None, 0.0)
    out += jp.clip(qpos - self._soft_uppers, 0.0, None)
    return jp.sum(out)


class Footstand(Handstand):
  """Stand on the rear feet (handstand.py:310-343)."""

  def _post_init(self) -> None:
    super()._post_init()
    m = self._model
    self._handstand_pose = jp.array(self.keyframe_qpos('footstand')[7:])
    self._handstand_q = jp.array(self.keyframe_qpos('footstand'))
    self._joint_ids = jp.array([0, 1, 2, 3, 4, 5])
    self._joint_pose = self._default_pose[self._joint_ids]
    self._desired_forward_vec = jp.array([0.0, 0, 1])
    self._z_des = 0.53
    geom_names = [
        'rl_calf1', 'rl_calf2', 'rr_calf1', 'rr_calf2',
        'rl_thigh1', 'rl_thigh2', 'rl_thigh3',
        'rr_thigh1', 'rr_thigh2', 'rr_thigh3',
        'rl_hip', 'rr_hip',
    ]
    self._unwanted_contact_geom_ids = np.array(
        [name2id(m, 'geom', n) for n in geom_names]
    )
    self._feet_geom_ids = np.array(
        [name2id(m, 'geom', n) for n in ('FR', 'FL')]
    )
