#!/usr/bin/env python3
"""AprilTag marker perception node.

Reference: airbot_sim2real_sl/scripts/marker_pose_publisher.py (cube,
publishes /qr_coordinates) and airbot_t/scripts/marker_pose_publisher.py
(T variant, publishes /point0, /point1, /new_point).  Detection/PnP/
extrinsics live in rsr_mjx_tpu.deploy.perception; this node owns capture
and ROS publication only.
"""

import rospy
from geometry_msgs.msg import Point

from rsr_mjx_tpu.deploy import perception


def _to_point(xyz):
  p = Point()
  p.x, p.y, p.z = float(xyz[0]), float(xyz[1]), float(xyz[2])
  return p


def main():
  rospy.init_node('marker_node')
  variant = rospy.get_param('~variant', 'cube')
  cfg = perception.CameraConfig.from_yaml(
      rospy.get_param('~config', None)
  ) if rospy.get_param('~config', None) else perception.CameraConfig()
  source = perception.RealSenseSource(cfg)
  rate = rospy.Rate(rospy.get_param('~rate_hz', 30))

  if variant == 'cube':
    localizer = perception.MarkerLocalizer(cfg)
    pub = rospy.Publisher('/qr_coordinates', Point, queue_size=1)
    while not rospy.is_shutdown():
      frame = source.capture()
      if frame is not None:
        pos = localizer.process(frame['color'])
        if pos is not None:
          pub.publish(_to_point(pos))
      rate.sleep()
  else:
    localizer = perception.TMarkerLocalizer(cfg)
    pub0 = rospy.Publisher('/point0', Point, queue_size=1)
    pub1 = rospy.Publisher('/point1', Point, queue_size=1)
    pub_new = rospy.Publisher('/new_point', Point, queue_size=1)
    while not rospy.is_shutdown():
      frame = source.capture()
      if frame is not None:
        p0, p1, approach = localizer.process(frame['color'])
        if p0 is not None:
          pub0.publish(_to_point(p0))
        if p1 is not None:
          pub1.publish(_to_point(p1))
        if approach is not None:
          pub_new.publish(_to_point(approach))
      rate.sleep()


if __name__ == '__main__':
  main()
