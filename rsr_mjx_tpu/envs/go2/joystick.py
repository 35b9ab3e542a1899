"""Go2 joystick locomotion task.

Native re-implementation of the reference joystick env
(locomotion/go2/joystick.py): 21 reward/cost terms, action & IMU delay
buffers, Bernoulli-masked random-walk command resampling, optional torso
velocity-kick perturbations, dict observation with 48-dim ``state`` and
privileged critic state.  All RNG threading, buffers and reward formulas
follow the reference (file:line cites inline).
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
  """joystick.py:13-82 verbatim defaults."""
  return config_dict.create(
      ctrl_dt=0.02,
      sim_dt=0.004,
      episode_length=1000,
      Kp=60.0,
      Kd=3.0,
      action_repeat=1,
      action_scale=0.5,
      history_len=1,
      soft_joint_pos_limit_factor=0.95,
      noise_config=config_dict.create(
          level=1.0,
          scales=config_dict.create(
              joint_pos=0.03,
              joint_vel=1.5,
              gyro=0.2,
              gravity=0.05,
              linvel=0.1,
          ),
      ),
      reward_config=config_dict.create(
          scales=config_dict.create(
              tracking_lin_vel=3.0,
              tracking_ang_vel=1.5,
              lin_vel_z=-0.5,
              ang_vel_xy=-0.05,
              orientation=-3.0,
              dof_pos_limits=-1.0,
              pose=0.0,
              termination=-1.0,
              stand_still=-1.0,
              torques=-0.0002,
              action_rate=-0.01,
              energy=-0.001,
              feet_clearance=-2.0,
              feet_height=-3.5,
              feet_slip=-0.1,
              feet_air_time=0.8,
              all_feet_air=-1.0,
              symmetric_gait=-0.8,
              lr_symmetry=-0.8,
              fb_symmetry=-0.8,
              feet_off_ground_when_still=-1.0,
          ),
          tracking_sigma=0.25,
          max_foot_height=0.12,
      ),
      pert_config=config_dict.create(
          enable=False,
          velocity_kick=[0.0, 3.0],
          kick_durations=[0.05, 0.2],
          kick_wait_times=[1.0, 3.0],
      ),
      command_config=config_dict.create(
          a=[0.8, 0.0, 2.0],
          b=[0.8, 0.0, 0.8],
          change_interval=12.0,
      ),
      delay_config=config_dict.create(
          action=config_dict.create(enable=True, steps=3),
          imu=config_dict.create(enable=True, steps=3),
      ),
  )


class Joystick(go2_base.Go2Env):
  """Track a joystick command."""

  def __init__(
      self,
      task: str = 'flat_terrain',
      config: Optional[config_dict.ConfigDict] = None,
      config_overrides: Optional[Dict[str, Union[str, int, list]]] = None,
  ):
    super().__init__(
        task_xml=go2_base.task_to_xml(task),
        config=config or default_config(),
        config_overrides=config_overrides,
    )
    self._post_init()

  def _post_init(self) -> None:
    m = self._model
    self._init_q = jp.array(self.keyframe_qpos('home'))
    self._default_pose = jp.array(self.keyframe_qpos('home')[7:])
    jr = np.asarray(m.jnt_range)[1:]
    self._lowers, self._uppers = jr[:, 0], jr[:, 1]
    f = self._config.soft_joint_pos_limit_factor
    self._soft_lowers = jp.asarray(self._lowers * f)
    self._soft_uppers = jp.asarray(self._uppers * f)
    self._torso_body_id = name2id(m, 'body', go2_base.ROOT_BODY)
    # subtree mass of the trunk = total robot mass
    self._torso_mass = float(np.asarray(m.body_mass).sum())
    self._feet_site_id = np.array(
        [name2id(m, 'site', n) for n in go2_base.FEET_SITES]
    )
    self._floor_geom_id = name2id(m, 'geom', 'floor')
    self._feet_geom_id = np.array(
        [name2id(m, 'geom', n) for n in go2_base.FEET_GEOMS]
    )
    adrs = []
    for site in go2_base.FEET_SITES:
      sid = name2id(m, 'sensor', f'{site}_global_linvel')
      adr = int(m.sensor_adr.arr[sid])
      adrs.append(list(range(adr, adr + 3)))
    self._foot_linvel_sensor_adr = jp.array(adrs)
    self._cmd_a = jp.array(self._config.command_config.a)
    self._cmd_b = jp.array(self._config.command_config.b)

  def reset(self, rng: jax.Array) -> core.State:
    """joystick.py:123-203."""
    m = self._model
    qpos = self._init_q
    qvel = jp.zeros(m.nv)
    rng, key = jax.random.split(rng)
    dxy = jax.random.uniform(key, (2,), minval=-0.5, maxval=0.5)
    qpos = qpos.at[0:2].set(qpos[0:2] + dxy)
    rng, key = jax.random.split(rng)
    yaw = jax.random.uniform(key, (1,), minval=-3.14, maxval=3.14)
    quat = lie.axis_angle_to_quat(jp.array([0.0, 0, 1]), yaw[0])
    new_quat = lie.quat_mul(qpos[3:7], quat)
    qpos = qpos.at[3:7].set(new_quat)
    rng, key = jax.random.split(rng)
    qvel = qvel.at[0:6].set(
        jax.random.uniform(key, (6,), minval=-0.5, maxval=0.5)
    )
    data = core.init(m, qpos=qpos, qvel=qvel, ctrl=qpos[7:])

    rng, key1, key2, key3 = jax.random.split(rng, 4)
    pc = self._config.pert_config
    time_until_next_pert = jax.random.uniform(
        key1, minval=pc.kick_wait_times[0], maxval=pc.kick_wait_times[1]
    )
    steps_until_next_pert = jp.round(time_until_next_pert / self.dt).astype(
        jp.int32
    )
    pert_duration_seconds = jax.random.uniform(
        key2, minval=pc.kick_durations[0], maxval=pc.kick_durations[1]
    )
    pert_duration_steps = jp.round(
        pert_duration_seconds / self.dt
    ).astype(jp.int32)
    pert_mag = jax.random.uniform(
        key3, minval=pc.velocity_kick[0], maxval=pc.velocity_kick[1]
    )

    rng, key1, key2 = jax.random.split(rng, 3)
    time_until_next_cmd = (
        jax.random.exponential(key1)
        * self._config.command_config.change_interval
    )
    steps_until_next_cmd = jp.round(time_until_next_cmd / self.dt).astype(
        jp.int32
    )
    cmd = jax.random.uniform(
        key2, shape=(3,), minval=-self._cmd_a, maxval=self._cmd_a
    )

    dc = self._config.delay_config
    action_delay_steps = dc.action.steps if dc.action.enable else 0
    imu_delay_steps = dc.imu.steps if dc.imu.enable else 0
    info = {
        'rng': rng,
        'command': cmd,
        'steps_until_next_cmd': steps_until_next_cmd,
        'last_act': jp.zeros(m.nu),
        'last_last_act': jp.zeros(m.nu),
        'feet_air_time': jp.zeros(4),
        'feet_contact_time': jp.zeros(4),
        'last_contact': jp.zeros(4, dtype=bool),
        'swing_peak': jp.zeros(4),
        'steps_until_next_pert': steps_until_next_pert,
        'pert_duration_seconds': pert_duration_seconds,
        'pert_duration': pert_duration_steps,
        'steps_since_last_pert': jp.zeros((), jp.int32),
        'pert_steps': jp.zeros((), jp.int32),
        'pert_dir': jp.zeros(3),
        'pert_mag': pert_mag,
        'action_buffer': jp.zeros((action_delay_steps + 1, m.nu)),
        'gyro_buffer': jp.zeros((imu_delay_steps + 1, 3)),
        'linvel_buffer': jp.zeros((imu_delay_steps + 1, 3)),
        'gravity_buffer': jp.zeros((imu_delay_steps + 1, 3)),
    }
    metrics = {}
    for k in self._config.reward_config.scales.keys():
      metrics[f'reward/{k}'] = jp.zeros(())
    metrics['swing_peak'] = jp.zeros(())
    obs = self._get_obs(data, info)
    reward, done = jp.zeros(2)
    return core.State(data, obs, reward, done, metrics, info)

  def step(self, state: core.State, action: jax.Array) -> core.State:
    """joystick.py:204-280."""
    m = self._model
    if self._config.pert_config.enable:
      state = self._maybe_apply_perturbation(state)

    if self._config.delay_config.action.enable:
      actual_action = state.info['action_buffer'][0]
      state.info['action_buffer'] = jp.vstack(
          [state.info['action_buffer'][1:], action[None, :]]
      )
    else:
      actual_action = action

    motor_targets = (
        self._default_pose + actual_action * self._config.action_scale
    )
    data = core.step(m, state.data, motor_targets, self.n_substeps)

    if self._config.delay_config.imu.enable:
      state.info['gyro_buffer'] = jp.vstack(
          [state.info['gyro_buffer'][1:], self.get_gyro(data)[None, :]]
      )
      state.info['linvel_buffer'] = jp.vstack(
          [
              state.info['linvel_buffer'][1:],
              self.get_local_linvel(data)[None, :],
          ]
      )
      state.info['gravity_buffer'] = jp.vstack(
          [
              state.info['gravity_buffer'][1:],
              self.get_gravity(data)[None, :],
          ]
      )

    contact = jp.array([
        _collision.geoms_colliding(m, data, int(gid), self._floor_geom_id)
        for gid in self._feet_geom_id
    ])
    contact_filt = contact | state.info['last_contact']
    first_contact = (state.info['feet_air_time'] > 0.0) * contact_filt
    state.info['feet_air_time'] += self.dt
    p_fz = data.site_xpos[self._feet_site_id][..., -1]
    state.info['swing_peak'] = jp.maximum(state.info['swing_peak'], p_fz)

    obs = self._get_obs(data, state.info)
    done = self._get_termination(data)

    rewards = self._get_reward(
        data, action, state.info, state.metrics, done, first_contact, contact
    )
    rewards = {
        k: v * self._config.reward_config.scales[k]
        for k, v in rewards.items()
    }
    reward = jp.clip(sum(rewards.values()) * self.dt, 0.0, 10000.0)

    state.info['last_last_act'] = state.info['last_act']
    state.info['last_act'] = action
    state.info['steps_until_next_cmd'] -= 1
    state.info['rng'], key1, key2 = jax.random.split(state.info['rng'], 3)
    state.info['command'] = jp.where(
        state.info['steps_until_next_cmd'] <= 0,
        self.sample_command(key1, state.info['command']),
        state.info['command'],
    )
    state.info['steps_until_next_cmd'] = jp.where(
        (done.astype(bool)) | (state.info['steps_until_next_cmd'] <= 0),
        jp.round(
            jax.random.exponential(key2)
            * self._config.command_config.change_interval
            / self.dt
        ).astype(jp.int32),
        state.info['steps_until_next_cmd'],
    )
    state.info['feet_air_time'] += self.dt
    state.info['feet_air_time'] *= ~contact
    state.info['feet_contact_time'] += self.dt
    state.info['feet_contact_time'] *= contact
    state.info['last_contact'] = contact
    state.info['swing_peak'] *= ~contact
    for k, v in rewards.items():
      state.metrics[f'reward/{k}'] = v
    state.metrics['swing_peak'] = jp.mean(state.info['swing_peak'])

    done = done.astype(reward.dtype)
    return state.replace(data=data, obs=obs, reward=reward, done=done)

  def _get_termination(self, data) -> jax.Array:
    return self.get_upvector(data)[-1] < 0.0

  def _get_obs(self, data, info: Dict[str, Any]) -> Dict[str, jax.Array]:
    """joystick.py:287-362: noisy 48-dim state + privileged state."""
    if self._config.delay_config.imu.enable:
      gyro = info['gyro_buffer'][0]
      linvel = info['linvel_buffer'][0]
      gravity = info['gravity_buffer'][0]
    else:
      gyro = self.get_gyro(data)
      linvel = self.get_local_linvel(data)
      gravity = self.get_gravity(data)

    nc = self._config.noise_config

    def noisy(key, x, scale):
      return x + (2 * jax.random.uniform(key, shape=x.shape) - 1) * (
          nc.level * scale
      )

    info['rng'], k = jax.random.split(info['rng'])
    noisy_gyro = noisy(k, gyro, nc.scales.gyro)
    info['rng'], k = jax.random.split(info['rng'])
    noisy_gravity = noisy(k, gravity, nc.scales.gravity)
    info['rng'], k = jax.random.split(info['rng'])
    noisy_linvel = noisy(k, linvel, nc.scales.linvel)
    joint_angles = data.qpos[7:]
    info['rng'], k = jax.random.split(info['rng'])
    noisy_joint_angles = noisy(k, joint_angles, nc.scales.joint_pos)
    joint_vel = data.qvel[6:]
    info['rng'], k = jax.random.split(info['rng'])
    noisy_joint_vel = noisy(k, joint_vel, nc.scales.joint_vel)

    state = jp.hstack([
        noisy_linvel,
        noisy_gyro,
        noisy_gravity,
        noisy_joint_angles - self._default_pose,
        noisy_joint_vel,
        info['last_act'],
        info['command'],
    ])
    accelerometer = self.get_accelerometer(data)
    angvel = self.get_global_angvel(data)
    feet_vel = data.sensordata[self._foot_linvel_sensor_adr].ravel()
    privileged_state = jp.hstack([
        state,
        self.get_gyro(data),
        accelerometer,
        self.get_gravity(data),
        self.get_local_linvel(data),
        angvel,
        joint_angles - self._default_pose,
        joint_vel,
        data.actuator_force,
        info['last_contact'],
        feet_vel,
        info['feet_air_time'],
        data.xfrc_applied[self._torso_body_id, :3],
        info['steps_since_last_pert'] >= info['steps_until_next_pert'],
    ])
    return {'state': state, 'privileged_state': privileged_state}

  # ----- rewards (joystick.py:363-593) ------------------------------

  def _get_reward(
      self, data, action, info, metrics, done, first_contact, contact
  ) -> Dict[str, jax.Array]:
    del metrics
    return {
        'tracking_lin_vel': self._reward_tracking_lin_vel(
            info['command'], self.get_local_linvel(data)
        ),
        'tracking_ang_vel': self._reward_tracking_ang_vel(
            info['command'], self.get_gyro(data)
        ),
        'lin_vel_z': jp.square(self.get_global_linvel(data)[2]),
        'ang_vel_xy': jp.sum(jp.square(self.get_global_angvel(data)[:2])),
        'orientation': jp.sum(jp.square(self.get_upvector(data)[:2])),
        'stand_still': self._cost_stand_still(
            info['command'], data.qpos[7:]
        ),
        'termination': done,
        'pose': self._reward_pose(data.qpos[7:]),
        'torques': self._cost_torques(data.actuator_force),
        'action_rate': jp.sum(jp.square(action - info['last_act'])),
        'energy': jp.sum(
            jp.abs(data.qvel[6:]) * jp.abs(data.actuator_force)
        ),
        'feet_slip': self._cost_feet_slip(data, contact, info),
        'feet_clearance': self._cost_feet_clearance(data),
        'feet_height': self._cost_feet_height(
            info['swing_peak'], first_contact, info
        ),
        'feet_air_time': self._reward_feet_air_time(
            info['feet_air_time'], first_contact, info['command']
        ),
        'dof_pos_limits': self._cost_joint_pos_limits(data.qpos[7:]),
        'all_feet_air': self._cost_all_feet_air(contact, info['command']),
        'symmetric_gait': self._cost_symmetric_gait(
            data.qpos[7:], info['command']
        ),
        'lr_symmetry': self._cost_lr_symmetry(
            info['feet_air_time'],
            info['feet_contact_time'],
            info['command'],
        ),
        'fb_symmetry': self._cost_fb_symmetry(
            info['feet_air_time'],
            info['feet_contact_time'],
            info['command'],
        ),
        'feet_off_ground_when_still': self._cost_feet_off_ground_when_still(
            contact, info['command']
        ),
    }

  def _reward_tracking_lin_vel(self, commands, local_vel):
    err = jp.sum(jp.square(commands[:2] - local_vel[:2]))
    return jp.exp(-err / self._config.reward_config.tracking_sigma)

  def _reward_tracking_ang_vel(self, commands, ang_vel):
    err = jp.square(commands[2] - ang_vel[2])
    return jp.exp(-err / self._config.reward_config.tracking_sigma)

  def _cost_torques(self, torques):
    return jp.sqrt(jp.sum(jp.square(torques))) + jp.sum(jp.abs(torques))

  def _reward_pose(self, qpos):
    weight = jp.array([1.0, 1.0, 0.1] * 4)
    return jp.exp(-jp.sum(jp.square(qpos - self._default_pose) * weight))

  def _cost_stand_still(self, commands, qpos):
    cmd_norm = jp.linalg.norm(commands)
    return jp.sum(jp.abs(qpos - self._default_pose)) * (cmd_norm < 0.01)

  def _cost_joint_pos_limits(self, qpos):
    out = -jp.clip(qpos - self._soft_lowers, None, 0.0)
    out += jp.clip(qpos - self._soft_uppers, 0.0, None)
    return jp.sum(out)

  def _cost_feet_slip(self, data, contact, info):
    cmd_norm = jp.linalg.norm(info['command'])
    feet_vel = data.sensordata[self._foot_linvel_sensor_adr]
    vel_xy_norm_sq = jp.sum(jp.square(feet_vel[..., :2]), axis=-1)
    return jp.sum(vel_xy_norm_sq * contact) * (cmd_norm > 0.01)

  def _cost_feet_clearance(self, data):
    feet_vel = data.sensordata[self._foot_linvel_sensor_adr]
    vel_norm = jp.sqrt(jp.linalg.norm(feet_vel[..., :2], axis=-1))
    foot_z = data.site_xpos[self._feet_site_id][..., -1]
    delta = jp.abs(foot_z - self._config.reward_config.max_foot_height)
    return jp.sum(delta * vel_norm)

  def _cost_feet_height(self, swing_peak, first_contact, info):
    cmd_norm = jp.linalg.norm(info['command'])
    error = swing_peak / self._config.reward_config.max_foot_height - 1.0
    return jp.sum(jp.square(error) * first_contact) * (cmd_norm > 0.01)

  def _reward_feet_air_time(self, air_time, first_contact, commands):
    cmd_norm = jp.linalg.norm(commands)
    rew = jp.sum((air_time - 0.1) * first_contact)
    return rew * (cmd_norm > 0.01)

  def _cost_all_feet_air(self, contact, commands):
    cmd_norm = jp.linalg.norm(commands)
    num_air = jp.sum((~contact).astype(jp.int32))
    return (num_air >= 3).astype(jp.float32) * (cmd_norm > 0.01)

  def _cost_symmetric_gait(self, qpos, commands):
    """Diagonal-pair joint symmetry (joystick.py:506-529)."""
    cmd_norm = jp.linalg.norm(commands)
    e1 = jp.sum(jp.square(qpos[3:6] - qpos[6:9]))  # FL vs RR
    e2 = jp.sum(jp.square(qpos[0:3] - qpos[9:12]))  # FR vs RL
    return (e1 + e2) * (cmd_norm > 0.01)

  def _cost_lr_symmetry(self, feet_air_time, feet_contact_time, commands):
    cmd_norm = jp.linalg.norm(commands)
    l_air = (feet_air_time[1] + feet_air_time[3]) / 2.0
    l_con = (feet_contact_time[1] + feet_contact_time[3]) / 2.0
    r_air = (feet_air_time[0] + feet_air_time[2]) / 2.0
    r_con = (feet_contact_time[0] + feet_contact_time[2]) / 2.0
    asym = jp.square(l_air - r_air) + jp.square(l_con - r_con)
    return asym * (cmd_norm > 0.01)

  def _cost_fb_symmetry(self, feet_air_time, feet_contact_time, commands):
    cmd_norm = jp.linalg.norm(commands)
    f_air = (feet_air_time[0] + feet_air_time[1]) / 2.0
    f_con = (feet_contact_time[0] + feet_contact_time[1]) / 2.0
    r_air = (feet_air_time[2] + feet_air_time[3]) / 2.0
    r_con = (feet_contact_time[2] + feet_contact_time[3]) / 2.0
    asym = jp.square(f_air - r_air) + jp.square(f_con - r_con)
    return asym * (cmd_norm > 0.01)

  def _cost_feet_off_ground_when_still(self, contact, commands):
    cmd_norm = jp.linalg.norm(commands)
    num_off = jp.sum((~contact).astype(jp.int32))
    return num_off.astype(jp.float32) * (cmd_norm < 0.01)

  # ----- perturbation kicks (joystick.py:594-644) -------------------

  def _maybe_apply_perturbation(self, state: core.State) -> core.State:
    def gen_dir(rng):
      angle = jax.random.uniform(rng, minval=0.0, maxval=jp.pi * 2)
      return jp.array([jp.cos(angle), jp.sin(angle), 0.0])

    def apply_pert(state):
      t = state.info['pert_steps'] * self.dt
      u_t = 0.5 * jp.sin(jp.pi * t / state.info['pert_duration_seconds'])
      force = (
          u_t
          * self._torso_mass
          * state.info['pert_mag']
          / state.info['pert_duration_seconds']
      )
      xfrc = jp.zeros((self._model.nbody, 6))
      xfrc = xfrc.at[self._torso_body_id, :3].set(
          force * state.info['pert_dir']
      )
      state = state.replace(data=state.data.replace(xfrc_applied=xfrc))
      state.info['steps_since_last_pert'] = jp.where(
          state.info['pert_steps'] >= state.info['pert_duration'],
          0,
          state.info['steps_since_last_pert'],
      )
      state.info['pert_steps'] += 1
      return state

    def wait(state):
      state.info['rng'], rng = jax.random.split(state.info['rng'])
      state.info['steps_since_last_pert'] += 1
      xfrc = jp.zeros((self._model.nbody, 6))
      reset_pert = (
          state.info['steps_since_last_pert']
          >= state.info['steps_until_next_pert']
      )
      state.info['pert_steps'] = jp.where(
          reset_pert, 0, state.info['pert_steps']
      )
      state.info['pert_dir'] = jp.where(
          reset_pert, gen_dir(rng), state.info['pert_dir']
      )
      return state.replace(data=state.data.replace(xfrc_applied=xfrc))

    return jax.lax.cond(
        state.info['steps_since_last_pert']
        >= state.info['steps_until_next_pert'],
        apply_pert,
        wait,
        state,
    )

  def sample_command(self, rng: jax.Array, x_k: jax.Array) -> jax.Array:
    """Bernoulli-masked random walk (joystick.py:645-653)."""
    rng, y_rng, w_rng, z_rng = jax.random.split(rng, 4)
    y_k = jax.random.uniform(
        y_rng, shape=(3,), minval=-self._cmd_a, maxval=self._cmd_a
    )
    z_k = jax.random.bernoulli(z_rng, self._cmd_b, shape=(3,))
    w_k = jax.random.bernoulli(w_rng, 0.5, shape=(3,))
    return x_k - w_k * (x_k - y_k * z_k)
