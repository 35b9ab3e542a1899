"""Reference-semantics cross-checks for the env layer (round-5, VERDICT #7).

The golden tests (test_env_golden.py) regression-protect this repo against
itself; these tests instead pin the env-layer reward/obs FORMULAS against
independent re-implementations ported from the reference listings:

- Airbot cube-push step reward + 23-dim obs: reference
  ppo_train/airbot_training/cube_env.py:145-229
- Go2 joystick per-term rewards (all 21 terms): reference
  mujoco_playground/_src/locomotion/go2/joystick.py:345-593

The fixtures below recompute every term from (pre-step info, post-step
Data) with formulas transcribed from the reference spec, then assert the
env's own step() produced the same values — covering both the formula
math and the step() plumbing order (e.g. the reference's double
``feet_air_time += dt`` at joystick.py:242/269, and new_cube_pos being
refreshed from the POST-step cube position before the shaping term).
"""

import jax
import jax.numpy as jnp
import numpy as np

from rsr_mjx_tpu import envs
from rsr_mjx_tpu.physics import collision as _collision


def _snapshot(tree):
  return jax.tree.map(np.asarray, tree)


# ---------------------------------------------------------------------------
# Airbot cube-push (training variant) — cube_env.py:145-229
# ---------------------------------------------------------------------------


def _cube_push_expected(env, info0, data1):
  """Reference step reward + obs, recomputed from post-step data."""
  w_push = env._push_w
  w_site = env._site2box_w
  w_healthy = env._healthy_w

  cube = np.asarray(data1.xpos[env._cube_body])
  site = np.asarray(data1.site_xpos[env._site_id])
  target = np.asarray(info0['target_pos'])

  # push reward (cube_env.py:164-168)
  d = np.linalg.norm(target - cube)
  d = 0.0 if d < 0.005 else d
  push = 1.0 / (1.0 + 3.0 * d) * w_push

  # site-z reward (cube_env.py:177)
  site_z = 1.0 if site[2] < 0.82 else 0.0

  # new_cube_pos approach point (cube_env.py:179-188)
  dx = target[0] - cube[0]
  dy = target[1] - cube[1]
  ang = np.arctan2(dy, dx + 0.00001)
  dist = np.sqrt(dx**2 + dy**2) + 0.04
  ncp = np.array([dx - dist * np.cos(ang) + cube[0],
                  dy - dist * np.sin(ang) + cube[1]])

  # site-to-cube shaping (cube_env.py:191-195)
  s2c = np.linalg.norm(site[:2] - ncp)
  s2c = 0.0 if s2c < 0.042 else s2c - 0.042
  s2c_rew = (1.0 - np.tanh(5.0 * s2c)) * w_site
  if d < 0.005:
    s2c_rew = w_site

  # health (cube_env.py:197)
  health = w_healthy * abs((1.0 if site[2] < env._endpoint_min_z else 0.0) - 1.0)

  reward = float(np.clip(push + s2c_rew + health + site_z, -1e2, 1e2))
  done = 1.0 if cube[2] < 0.6 else 0.0

  # obs (cube_env.py:216-229)
  obs = np.concatenate([
      np.asarray(data1.qpos)[env._joint_qadr],
      site,
      target,
      cube,
      ncp,
      target - cube,
      cube - site,
  ])
  return reward, done, obs


def test_cube_push_reward_obs_reference_parity():
  env = envs.load('AirbotCubePushTrain')
  state = jax.jit(env.reset)(jax.random.PRNGKey(11))
  step = jax.jit(env.step)

  rng = np.random.RandomState(0)
  checked = 0
  for t in range(25):
    act = jnp.asarray(
        np.clip(rng.randn(env.action_size) * 0.5, -1, 1), jnp.float32
    )
    info0 = _snapshot(state.info)
    state = step(state, act)
    reward_exp, done_exp, obs_exp = _cube_push_expected(
        env, info0, state.data
    )
    np.testing.assert_allclose(
        float(state.reward), reward_exp, rtol=1e-5, atol=1e-5
    )
    assert float(state.done) == done_exp
    np.testing.assert_allclose(
        np.asarray(state.obs), obs_exp, rtol=1e-5, atol=1e-5
    )
    checked += 1
  assert checked == 25


# ---------------------------------------------------------------------------
# Go2 joystick — joystick.py:345-593 (all 21 reward terms)
# ---------------------------------------------------------------------------


def _joystick_expected_terms(env, info0, data1, action, contact):
  """All 21 term values, from the reference formulas, unscaled."""
  cfg = env._config.reward_config
  qpos_j = np.asarray(data1.qpos)[7:]
  default_pose = np.asarray(env._default_pose)
  cmd = np.asarray(info0['command'])
  cmd_norm = np.linalg.norm(cmd)
  moving = cmd_norm > 0.01
  still = cmd_norm < 0.01

  local_vel = np.asarray(env.get_local_linvel(data1))
  gyro = np.asarray(env.get_gyro(data1))
  glob_linvel = np.asarray(env.get_global_linvel(data1))
  glob_angvel = np.asarray(env.get_global_angvel(data1))
  up = np.asarray(env.get_upvector(data1))
  torques = np.asarray(data1.actuator_force)
  qvel_j = np.asarray(data1.qvel)[6:]
  feet_vel = np.asarray(data1.sensordata)[
      np.asarray(env._foot_linvel_sensor_adr)
  ]
  foot_z = np.asarray(data1.site_xpos)[np.asarray(env._feet_site_id)][:, -1]

  # step-order replication (joystick.py:236-245): first_contact uses the
  # PRE-increment air time; the reward's air_time is post-increment
  contact_filt = contact | np.asarray(info0['last_contact'])
  first_contact = (np.asarray(info0['feet_air_time']) > 0.0) * contact_filt
  air_time = np.asarray(info0['feet_air_time']) + env.dt
  contact_time = np.asarray(info0['feet_contact_time'])
  swing_peak = np.maximum(np.asarray(info0['swing_peak']), foot_z)
  done = 1.0 if up[-1] < 0.0 else 0.0

  terms = {}
  # :417-430
  terms['tracking_lin_vel'] = np.exp(
      -np.sum((cmd[:2] - local_vel[:2]) ** 2) / cfg.tracking_sigma
  )
  terms['tracking_ang_vel'] = np.exp(
      -((cmd[2] - gyro[2]) ** 2) / cfg.tracking_sigma
  )
  # :431-438
  terms['lin_vel_z'] = glob_linvel[2] ** 2
  terms['ang_vel_xy'] = np.sum(glob_angvel[:2] ** 2)
  terms['orientation'] = np.sum(up[:2] ** 2)
  terms['torques'] = np.sqrt(np.sum(torques**2)) + np.sum(np.abs(torques))
  # :439-442
  terms['energy'] = np.sum(np.abs(qvel_j) * np.abs(torques))
  # :443-447
  terms['action_rate'] = np.sum(
      (np.asarray(action) - np.asarray(info0['last_act'])) ** 2
  )
  # :448-450
  weight = np.array([1.0, 1.0, 0.1] * 4)
  terms['pose'] = np.exp(-np.sum((qpos_j - default_pose) ** 2 * weight))
  # :451-457
  terms['stand_still'] = np.sum(np.abs(qpos_j - default_pose)) * still
  terms['termination'] = done
  # :459-463
  out = -np.clip(qpos_j - np.asarray(env._soft_lowers), None, 0.0)
  out += np.clip(qpos_j - np.asarray(env._soft_uppers), 0.0, None)
  terms['dof_pos_limits'] = np.sum(out)
  # :464-470
  terms['feet_slip'] = (
      np.sum(np.sum(feet_vel[:, :2] ** 2, axis=-1) * contact) * moving
  )
  # :471-479
  vel_norm = np.sqrt(np.linalg.norm(feet_vel[:, :2], axis=-1))
  terms['feet_clearance'] = np.sum(
      np.abs(foot_z - cfg.max_foot_height) * vel_norm
  )
  # :480-488
  err = swing_peak / cfg.max_foot_height - 1.0
  terms['feet_height'] = np.sum(err**2 * first_contact) * moving
  # :489-496
  terms['feet_air_time'] = np.sum((air_time - 0.1) * first_contact) * moving
  # :497-507
  terms['all_feet_air'] = float(np.sum(~contact) >= 3) * moving
  # :508-529
  e1 = np.sum((qpos_j[3:6] - qpos_j[6:9]) ** 2)
  e2 = np.sum((qpos_j[0:3] - qpos_j[9:12]) ** 2)
  terms['symmetric_gait'] = (e1 + e2) * moving
  # :530-554
  l_air = (air_time[1] + air_time[3]) / 2.0
  l_con = (contact_time[1] + contact_time[3]) / 2.0
  r_air = (air_time[0] + air_time[2]) / 2.0
  r_con = (contact_time[0] + contact_time[2]) / 2.0
  terms['lr_symmetry'] = ((l_air - r_air) ** 2 + (l_con - r_con) ** 2) * moving
  # :555-579
  f_air = (air_time[0] + air_time[1]) / 2.0
  f_con = (contact_time[0] + contact_time[1]) / 2.0
  b_air = (air_time[2] + air_time[3]) / 2.0
  b_con = (contact_time[2] + contact_time[3]) / 2.0
  terms['fb_symmetry'] = ((f_air - b_air) ** 2 + (f_con - b_con) ** 2) * moving
  # :580-593
  terms['feet_off_ground_when_still'] = float(np.sum(~contact)) * still
  return terms, done


def test_joystick_reward_terms_reference_parity():
  env = envs.load('Go2JoystickFlatTerrain')
  m = env.model
  state = jax.jit(env.reset)(jax.random.PRNGKey(7))
  step = jax.jit(env.step)

  contact_fn = jax.jit(
      lambda d: jnp.array([
          _collision.geoms_colliding(m, d, int(g), env._floor_geom_id)
          for g in env._feet_geom_id
      ])
  )

  scales = dict(env._config.reward_config.scales)
  rng = np.random.RandomState(1)
  for t in range(10):
    act = jnp.asarray(
        np.clip(rng.randn(env.action_size) * 0.4, -1, 1), jnp.float32
    )
    info0 = _snapshot(state.info)
    state = step(state, act)
    contact = np.asarray(contact_fn(state.data))
    terms, done = _joystick_expected_terms(
        env, info0, state.data, act, contact
    )
    assert set(f'reward/{k}' for k in terms) <= set(state.metrics.keys())
    total = 0.0
    for k, v in terms.items():
      got = float(state.metrics[f'reward/{k}'])
      exp = float(v) * float(scales[k])
      np.testing.assert_allclose(
          got, exp, rtol=1e-4, atol=1e-5,
          err_msg=f'term {k} at step {t}',
      )
      total += exp
    reward_exp = float(np.clip(total * env.dt, 0.0, 10000.0))
    np.testing.assert_allclose(
        float(state.reward), reward_exp, rtol=1e-4, atol=1e-5
    )
