#!/usr/bin/env python3
"""T-push control node (two-tag variant).

Reference: airbot_t/scripts/sim2real_t_node.py; task logic in
rsr_mjx_tpu.deploy.t_push."""

import sys

import rospy

from rsr_mjx_tpu.deploy.policy import PolicyInference
from rsr_mjx_tpu.deploy.ros_adapter import RosRobotInterface
from rsr_mjx_tpu.deploy.t_push import run_t_push_control_loop


def main():
  rospy.init_node('airbot_rsr_t_control_node')
  ckpt = rospy.get_param('~checkpoint_dir', sys.argv[1] if len(sys.argv) > 1
                         else 'checkpoints')
  robot = RosRobotInterface()
  policy = PolicyInference(ckpt)
  run_t_push_control_loop(robot, policy, logger=rospy.loginfo)


if __name__ == '__main__':
  main()
