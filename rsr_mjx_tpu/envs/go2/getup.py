"""Go2 fall-recovery (getup) task.

Native re-implementation of locomotion/go2/getup.py: random-orientation
drop from 0.5 m with probability ``drop_from_height_prob``, in-reset
settling rollout, delta-from-current-qpos action space (the reference
docstring's rationale, getup.py:47-71), uprightness-gated posture and
stand-still rewards, and energy-based termination.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jp
import numpy as np
from ml_collections import config_dict

from rsr_mjx_tpu.envs import core
from rsr_mjx_tpu.envs.go2 import base as go2_base
from rsr_mjx_tpu.physics.io import name2id


def default_config() -> config_dict.ConfigDict:
  """getup.py:11-46 defaults."""
  return config_dict.create(
      ctrl_dt=0.02,
      sim_dt=0.004,
      Kp=35.0,
      Kd=0.5,
      episode_length=300,
      drop_from_height_prob=0.6,
      settle_time=0.5,
      action_repeat=1,
      action_scale=0.5,
      soft_joint_pos_limit_factor=0.95,
      energy_termination_threshold=np.inf,
      noise_config=config_dict.create(
          level=1.0,
          scales=config_dict.create(
              joint_pos=0.03,
              joint_vel=1.5,
              gyro=0.2,
              gravity=0.05,
          ),
      ),
      reward_config=config_dict.create(
          scales=config_dict.create(
              orientation=1.0,
              torso_height=1.0,
              posture=1.0,
              stand_still=1.0,
              action_rate=-0.001,
              dof_pos_limits=-0.1,
              torques=-1e-5,
              dof_acc=-2.5e-7,
              dof_vel=-0.1,
          ),
      ),
  )


class Getup(go2_base.Go2Env):
  """Recover from a fall and stand up."""

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
    self._default_pose = jp.array(self.keyframe_qpos('home')[7:])
    jr = np.asarray(m.jnt_range)[1:]
    self._lowers, self._uppers = jp.asarray(jr[:, 0]), jp.asarray(jr[:, 1])
    c = (self._lowers + self._uppers) / 2
    r = self._uppers - self._lowers
    f = self._config.soft_joint_pos_limit_factor
    self._soft_lowers = c - 0.5 * r * f
    self._soft_uppers = c + 0.5 * r * f
    self._settle_steps = int(self._config.settle_time / self.sim_dt)
    self._z_des = 0.275
    self._up_vec = jp.array([0.0, 0.0, -1.0])

  def _get_random_qpos(self, rng: jax.Array) -> jax.Array:
    """0.5 m drop with random orientation/joints (getup.py:95-114)."""
    m = self._model
    rng, orientation_rng, qpos_rng = jax.random.split(rng, 3)
    qpos = jp.zeros(m.nq)
    qpos = qpos.at[2].set(0.5)
    quat = jax.random.normal(orientation_rng, (4,))
    quat /= jp.linalg.norm(quat) + 1e-6
    qpos = qpos.at[3:7].set(quat)
    qpos = qpos.at[7:].set(
        jax.random.uniform(
            qpos_rng, (12,), minval=self._lowers, maxval=self._uppers
        )
    )
    return qpos

  def reset(self, rng: jax.Array) -> core.State:
    """getup.py:115-143 incl. in-reset settling."""
    m = self._model
    rng, key1, key2 = jax.random.split(rng, 3)
    qpos = jp.where(
        jax.random.bernoulli(key1, self._config.drop_from_height_prob),
        self._get_random_qpos(key2),
        self._init_q,
    )
    rng, key = jax.random.split(rng)
    qvel = jp.zeros(m.nv)
    qvel = qvel.at[0:6].set(
        jax.random.uniform(key, (6,), minval=-0.5, maxval=0.5)
    )
    data = core.init(m, qpos=qpos, qvel=qvel, ctrl=qpos[7:])
    data = core.step(m, data, qpos[7:], self._settle_steps)
    data = data.replace(time=jp.zeros_like(data.time))
    info = {
        'rng': rng,
        'last_act': jp.zeros(m.nu),
        'last_last_act': jp.zeros(m.nu),
    }
    metrics = {
        f'reward/{k}': jp.zeros(())
        for k in self._config.reward_config.scales.keys()
    }
    obs = self._get_obs(data, info)
    reward, done = jp.zeros(2)
    return core.State(data, obs, reward, done, metrics, info)

  def step(self, state: core.State, action: jax.Array) -> core.State:
    """getup.py:144-158: targets are deltas from CURRENT qpos."""
    m = self._model
    motor_targets = state.data.qpos[7:] + action * self._config.action_scale
    data = core.step(m, state.data, motor_targets, self.n_substeps)
    obs = self._get_obs(data, state.info)
    done = self._get_termination(data)
    rewards = self._get_reward(data, action, state.info, state.metrics, done)
    rewards = {
        k: v * self._config.reward_config.scales[k]
        for k, v in rewards.items()
    }
    reward = jp.clip(sum(rewards.values()) * self.dt, 0.0, 10000.0)
    state.info['last_last_act'] = state.info['last_act']
    state.info['last_act'] = action
    for k, v in rewards.items():
      state.metrics[f'reward/{k}'] = v
    done = jp.float32(done)
    return state.replace(data=data, obs=obs, reward=reward, done=done)

  def _get_termination(self, data) -> jax.Array:
    energy = jp.sum(jp.abs(data.actuator_force * data.qvel[6:]))
    return energy > self._config.energy_termination_threshold

  def _get_obs(self, data, info: Dict[str, Any]) -> Dict[str, jax.Array]:
    nc = self._config.noise_config

    def noisy(key, x, scale):
      return x + (2 * jax.random.uniform(key, shape=x.shape) - 1) * (
          nc.level * scale
      )

    info['rng'], k = jax.random.split(info['rng'])
    noisy_gyro = noisy(k, self.get_gyro(data), nc.scales.gyro)
    gravity = self.get_gravity(data)
    info['rng'], k = jax.random.split(info['rng'])
    noisy_gravity = noisy(k, gravity, nc.scales.gravity)
    joint_angles = data.qpos[7:]
    info['rng'], k = jax.random.split(info['rng'])
    noisy_joint_angles = noisy(k, joint_angles, nc.scales.joint_pos)
    joint_vel = data.qvel[6:]
    info['rng'], k = jax.random.split(info['rng'])
    noisy_joint_vel = noisy(k, joint_vel, nc.scales.joint_vel)

    state = jp.concatenate([
        noisy_gyro,
        noisy_gravity,
        noisy_joint_angles - self._default_pose,
        noisy_joint_vel,
        info['last_act'],
    ])
    torso_height = data.site_xpos[self._imu_site_id][2]
    privileged_state = jp.hstack([
        state,
        self.get_gyro(data),
        self.get_accelerometer(data),
        self.get_local_linvel(data),
        self.get_global_angvel(data),
        joint_angles,
        joint_vel,
        data.actuator_force,
        torso_height,
    ])
    return {'state': state, 'privileged_state': privileged_state}

  def _get_reward(self, data, action, info, metrics, done):
    del done, metrics
    torso_height = data.site_xpos[self._imu_site_id][2]
    joint_angles = data.qpos[7:]
    gravity = self.get_gravity(data)
    is_upright = self._is_upright(gravity)
    is_at_height = self._is_at_desired_height(torso_height)
    gate = is_upright * is_at_height
    return {
        'orientation': self._reward_orientation(gravity),
        'torso_height': self._reward_height(torso_height),
        'posture': self._reward_posture(joint_angles, is_upright),
        'stand_still': self._reward_stand_still(action, gate),
        'action_rate': self._cost_action_rate(action, info),
        'torques': self._cost_torques(data.actuator_force),
        'dof_pos_limits': self._cost_joint_pos_limits(data.qpos[7:]),
        'dof_acc': jp.sum(jp.square(data.qacc[6:])),
        'dof_vel': self._cost_dof_vel(data.qvel[6:]),
    }

  def _is_upright(self, gravity, ori_tol: float = 0.01):
    return jp.sum(jp.square(self._up_vec - gravity)) < ori_tol

  def _is_at_desired_height(self, torso_height, pos_tol: float = 0.005):
    height = jp.minimum(torso_height, self._z_des)
    return (self._z_des - height) < pos_tol

  def _reward_orientation(self, up_vec):
    return jp.exp(-2.0 * jp.sum(jp.square(self._up_vec - up_vec)))

  def _reward_height(self, torso_height):
    return jp.exp(jp.minimum(torso_height, self._z_des)) - 1.0

  def _reward_posture(self, joint_angles, gate):
    cost = jp.sum(jp.square(joint_angles - self._default_pose))
    return gate * jp.exp(-0.5 * cost)

  def _reward_stand_still(self, act, gate):
    return gate * jp.exp(-0.5 * jp.sum(jp.square(act)))

  def _cost_torques(self, torques):
    return jp.sqrt(jp.sum(jp.square(torques))) + jp.sum(jp.abs(torques))

  def _cost_action_rate(self, act, info):
    c1 = jp.sum(jp.square(act - info['last_act']))
    c2 = jp.sum(
        jp.square(act - 2 * info['last_act'] + info['last_last_act'])
    )
    return c1 + c2

  def _cost_joint_pos_limits(self, qpos):
    out = -jp.clip(qpos - self._soft_lowers, None, 0.0)
    out += jp.clip(qpos - self._soft_uppers, 0.0, None)
    return jp.sum(out)

  def _cost_dof_vel(self, qvel):
    cost = jp.maximum(jp.abs(qvel) - 2.0 * jp.pi, 0.0)
    return jp.sum(jp.square(cost))
