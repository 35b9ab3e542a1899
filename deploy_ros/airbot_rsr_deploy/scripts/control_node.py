#!/usr/bin/env python3
"""Cube-push control node: ROS transport + rsr_mjx_tpu control loop.

Reference: airbot_sim2real_sl/scripts/sim2real_sl_control_node.py.  All
task logic (obs reconstruction, joint couplings, success/timeout) lives in
rsr_mjx_tpu.deploy.control_loop; this node only binds it to ROS.
"""

import sys

import rospy

from rsr_mjx_tpu.deploy.control_loop import run_cube_push_control_loop
from rsr_mjx_tpu.deploy.policy import PolicyInference
from rsr_mjx_tpu.deploy.ros_adapter import RosRobotInterface


def main():
  rospy.init_node('airbot_rsr_control_node')
  ckpt = rospy.get_param('~checkpoint_dir', sys.argv[1] if len(sys.argv) > 1
                         else 'checkpoints')
  robot = RosRobotInterface()
  policy = PolicyInference(ckpt)
  run_cube_push_control_loop(
      robot,
      policy,
      rate_hz=rospy.get_param('~rate_hz', 10.0),
      success_dist=rospy.get_param('~success_dist', 0.008),
      joint_tolerance=rospy.get_param('~joint_tolerance', 0.01),
      joint_timeout=rospy.get_param('~move_timeout_s', 5.0),
      logger=rospy.loginfo,
  )


if __name__ == '__main__':
  main()
