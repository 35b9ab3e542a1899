"""Deployment tests: observation reconstruction parity with the sim env,
control-loop behavior on a fake robot."""

import numpy as np

from rsr_mjx_tpu.deploy import (
    build_cube_observation,
    run_cube_push_control_loop,
)
from rsr_mjx_tpu.deploy.interface import RobotInterface


def test_build_cube_observation_layout():
  joints = [0.1, -0.5, 0.4, 1.57, -1.4, 1.1]
  end = [0.3, 0.05, 0.1]
  marker = [0.35, 0.0]
  target = (0.455355, 0.082943, 0.82)
  obs = build_cube_observation(joints, end, marker, target)
  assert obs.shape == (23,)
  np.testing.assert_allclose(obs[:6], joints)
  # endpoint z is shifted into the sim table frame (+0.78 − 0.025)
  np.testing.assert_allclose(obs[6:9], [0.3, 0.05, 0.1 + 0.755])
  np.testing.assert_allclose(obs[9:12], target)
  np.testing.assert_allclose(obs[12:15], [0.35, 0.0, 0.82])
  # approach point one cube-length behind the cube away from the target
  d = np.asarray(marker) - np.asarray(target[:2])
  d = d / np.linalg.norm(d)
  np.testing.assert_allclose(obs[15:17], np.asarray(marker) + d * 0.04)
  np.testing.assert_allclose(
      obs[17:20], np.asarray(target) - obs[12:15], atol=1e-12
  )
  np.testing.assert_allclose(
      obs[20:23], obs[12:15] - obs[6:9], atol=1e-12
  )


class FakeRobot(RobotInterface):
  """Instantly-converging fake arm; marker drifts towards the target."""

  def __init__(self, marker, target):
    self.joints = np.zeros(6)
    self.marker = np.asarray(marker, dtype=float)
    self.target = np.asarray(target[:2])
    self.commands = []
    self.steps_completed = []

  def get_joint_positions(self):
    return self.joints.copy()

  def get_end_pose(self):
    return np.array([0.3, 0.0, 0.05])

  def get_marker_position(self):
    return self.marker.copy()

  def send_joint_position_cmd(self, joint_positions):
    self.commands.append(np.asarray(joint_positions).copy())
    self.joints = np.asarray(joint_positions).copy()
    # pretend each push moves the cube 30% towards the target
    self.marker += 0.3 * (self.target - self.marker)

  def publish_step_complete(self, step):
    self.steps_completed.append(step)

  def sleep(self, seconds):
    pass


class ZeroPolicy:

  def get_action(self, obs, deterministic=True):
    assert obs.shape == (23,)
    return np.zeros(5)


def test_control_loop_couplings_and_success():
  target = (0.455355, 0.082943, 0.82)
  robot = FakeRobot(marker=[0.30, 0.0], target=target)
  steps = run_cube_push_control_loop(
      robot,
      ZeroPolicy(),
      target_pos=target,
      max_steps=25,
      joint_timeout=0.1,
      obs_log_path=None,
      logger=lambda *_: None,
  )
  assert steps == 25
  assert robot.commands, 'commands must have been sent'
  cmd = robot.commands[0]
  # analytic couplings on hardware (sim2real_sl_control_node.py:62-89)
  assert cmd[3] == 1.57
  np.testing.assert_allclose(cmd[4], -(1.57 + cmd[1] + cmd[2]), atol=1e-9)
  # joints clipped to limits
  assert np.all(cmd >= [-3.14, -2.96, -0.087, -2.96, -1.74, -3.14])
  assert np.all(cmd <= [2.09, 0.17, 3.14, 2.96, 1.74, 3.14])
  # cube converged → later iterations stop commanding (success branch)
  assert len(robot.commands) < 25
  assert robot.steps_completed, 'step_complete must fire on reached joints'


def test_build_t_observation_layout():
  from rsr_mjx_tpu.deploy.t_push import (
      T_TARGET_BASE,
      T_TARGET_VERT,
      build_t_observation,
      t_orientation_error,
  )

  joints = [0.1, -0.5, 0.4, 1.57, -1.4, 1.1]
  end = [0.3, 0.05, 0.03]
  # aligned with the target direction → xita == 0
  d = (T_TARGET_VERT - T_TARGET_BASE)[:2]
  p1 = np.array([0.30, 0.10])
  p0 = p1 + d
  obs = build_t_observation(joints, end, p0, p1, [0.28, 0.09])
  assert obs.shape == (16,)
  np.testing.assert_allclose(obs[:6], joints)
  np.testing.assert_allclose(obs[6], 0.03 + 0.78 - 0.023)
  assert abs(float(obs[13])) < 1e-9  # xita ~ 0 when aligned
  # orthogonal placement → xita = |cos90 − 1| = 1
  p0b = p1 + np.array([-d[1], d[0]])
  assert abs(t_orientation_error(p0b, p1) - 1.0) < 1e-9
