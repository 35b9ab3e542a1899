"""Perception tests on synthetic AprilTag frames (OpenCV only; no
hardware).  Covers the reference behaviors: single-tag cube localization
(marker_pose_publisher.py), the two-tag T variant with the offset approach
point (airbot_t variant), extrinsic self-calibration (real_sensor.py), and
the threaded bounded-queue capture."""

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from rsr_mjx_tpu.deploy import perception as P


def _render_tag(canvas, tag_id, R, t, cfg, modules=6, px=200):
  """Draw AprilTag `tag_id` posed at (R, t) in the camera frame onto
  canvas using the pinhole model (zero distortion assumed)."""
  marker = cv2.aruco.generateImageMarker(
      cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_APRILTAG_16H5),
      tag_id,
      px,
  )
  # white border around the tag so the detector finds quiet zone
  b = px // modules
  padded = np.full((px + 2 * b, px + 2 * b), 255, np.uint8)
  padded[b : b + px, b : b + px] = marker
  S = px  # marker spans [0, S] in its own image
  L = cfg.tag_length
  # marker-image px (u, v) → tag-plane metres, pixel-CENTER convention
  # (warpPerspective treats integer coords as pixel centers, so continuous
  # coordinate −0.5 is the marker edge): x = ((u + 0.5)/S − 0.5)·L
  A = np.array(
      [
          [L / S, 0.0, -L / 2 + 0.5 * L / S],
          [0.0, -L / S, L / 2 - 0.5 * L / S],
          [0.0, 0.0, 1.0],
      ]
  )
  # tag plane → camera image: K [r1 r2 t]
  K = cfg.intrinsics
  P34 = K @ np.column_stack([R[:, 0], R[:, 1], t])
  H = P34 @ A
  # account for the border shift: padded px = marker px + b
  shift = np.array([[1.0, 0.0, -b], [0.0, 1.0, -b], [0.0, 0.0, 1.0]])
  warped = cv2.warpPerspective(
      padded,
      H @ shift,
      (canvas.shape[1], canvas.shape[0]),
      canvas,
      borderMode=cv2.BORDER_TRANSPARENT,
      flags=cv2.INTER_LINEAR,
  )
  return warped


def _cfg():
  # long focal length so the 4 cm tag spans ~170 px at 0.7 m (subpixel
  # detection error then stays ≪ 1% of depth)
  return P.CameraConfig(
      intrinsics=np.array(
          [[3000.0, 0.0, 640.0], [0.0, 3000.0, 360.0], [0.0, 0.0, 1.0]]
      ),
      distortion=np.zeros(5),
      tag_length=0.04,
  )


def _frame_with_tags(cfg, poses):
  """poses: {tag_id: camera-frame tvec}; tags face the camera."""
  canvas = np.full((720, 1280), 255, np.uint8)
  # tag +z out of its face; camera looks along +z ⇒ flip the tag about x
  R = np.diag([1.0, -1.0, -1.0])
  for tid, t in poses.items():
    _render_tag(canvas, tid, R, np.asarray(t, float), cfg)
  return cv2.cvtColor(canvas, cv2.COLOR_GRAY2BGR)


def _expected_base_point(tvec, cfg):
  """Independent reimplementation of the reference's transform chain
  (marker_pose_publisher.py:99-104)."""
  p = (cfg.cam_to_base @ np.append(tvec, 1.0))[:3]
  return np.array([-p[0] + cfg.x_offset, -p[1], p[2]])


def test_single_tag_camera_pose():
  cfg = _cfg()
  t_true = np.array([0.05, -0.03, 0.7])
  frame = _frame_with_tags(cfg, {3: t_true})
  det = P.TagDetector()
  tags = det.detect(frame)
  assert 3 in tags, f'detected: {list(tags)}'
  tvec = P.solve_tag_camera_pos(tags[3], cfg)
  np.testing.assert_allclose(tvec, t_true, atol=2e-3)


def test_marker_localizer_base_frame():
  cfg = _cfg()
  t_true = np.array([-0.02, 0.03, 0.65])
  frame = _frame_with_tags(cfg, {0: t_true})
  published = []
  loc = P.MarkerLocalizer(cfg, publish=published.append)
  point = loc.process(frame)
  assert point is not None
  np.testing.assert_allclose(
      point, _expected_base_point(t_true, cfg), atol=5e-3
  )
  assert len(published) == 1
  # control-loop contract: xy only
  xy = loc.get_marker_position()
  assert xy.shape == (2,)
  np.testing.assert_allclose(xy, point[:2])


def test_marker_localizer_no_detection():
  cfg = _cfg()
  frame = np.full((720, 1280, 3), 255, np.uint8)
  loc = P.MarkerLocalizer(cfg)
  assert loc.process(frame) is None
  assert loc.get_marker_position() is None


def test_t_localizer_two_tags_and_approach_point():
  cfg = _cfg()
  t0 = np.array([0.06, 0.00, 0.7])   # tag 0: T vertical bar
  t1 = np.array([-0.06, 0.02, 0.7])  # tag 1: T base bar
  frame = _frame_with_tags(cfg, {0: t0, 1: t1})
  events = []
  loc = P.TMarkerLocalizer(cfg, publish=lambda k, p: events.append(k))
  p0, p1, newp = loc.process(frame)
  assert p0 is not None and p1 is not None and newp is not None
  np.testing.assert_allclose(p0, _expected_base_point(t0, cfg), atol=5e-3)
  np.testing.assert_allclose(p1, _expected_base_point(t1, cfg), atol=5e-3)
  # new_point = point0 + 0.025 * normalize(point0 - point1)
  d = (p0 - p1) / np.linalg.norm(p0 - p1)
  np.testing.assert_allclose(newp, p0 + 0.025 * d, atol=1e-9)
  assert set(events) == {'point0', 'point1', 'new_point'}


def test_t_localizer_single_tag_no_approach():
  cfg = _cfg()
  frame = _frame_with_tags(cfg, {0: np.array([0.0, 0.0, 0.7])})
  loc = P.TMarkerLocalizer(cfg)
  p0, p1, newp = loc.process(frame)
  assert p0 is not None and p1 is None and newp is None


def test_extrinsic_self_calibration():
  cfg = _cfg()
  t_true = np.array([0.0, 0.0, 0.738])
  frame = _frame_with_tags(cfg, {0: t_true})
  c2w = P.extrinsic_self_calibration(frame, cfg)
  assert c2w is not None
  # camera position in tag/world frame: −RᵀT ⇒ 0.738 m above the tag
  np.testing.assert_allclose(abs(c2w[2, 3]), 0.738, atol=5e-3)
  # orthonormal rotation
  Rm = c2w[:3, :3]
  np.testing.assert_allclose(Rm @ Rm.T, np.eye(3), atol=1e-6)


class _SyntheticSource(P.FrameSource):

  def __init__(self, frame):
    self.frame = frame
    self.captures = 0

  def capture(self):
    self.captures += 1
    return {'color': self.frame}


def test_threaded_source_bounded_queue_and_calibration():
  cfg = _cfg()
  frame = _frame_with_tags(cfg, {0: np.array([0.0, 0.0, 0.738])})
  src = _SyntheticSource(frame)
  cam = P.ThreadedCameraSource(
      src, cfg, max_queue_size=2, self_calibrate=True
  )
  cam.start()
  got = cam.get(timeout=5.0)
  assert got is not None and got['color'] is frame
  assert got['extrinsics'] is not None  # self-calibration ran
  import time

  time.sleep(0.2)  # let the producer outrun the consumer
  assert cam._queue.qsize() <= 3  # bounded (2 + 1 in flight)
  cam.stop()


def test_perception_pipeline_contract(tmp_path):
  cfg = _cfg()
  t_true = np.array([0.01, 0.02, 0.7])
  frame = _frame_with_tags(cfg, {0: t_true})
  cam = P.ThreadedCameraSource(_SyntheticSource(frame), cfg)
  cam.start()
  pipe = P.PerceptionPipeline(
      cam, P.MarkerLocalizer(cfg), frame_dir=str(tmp_path)
  )
  xy = None
  for _ in range(20):
    xy = pipe.get_marker_position()
    if xy is not None:
      break
  assert xy is not None
  np.testing.assert_allclose(
      xy, _expected_base_point(t_true, cfg)[:2], atol=5e-3
  )
  pipe.on_step_complete(1)
  assert (tmp_path / 'id_1.jpg').exists()
  cam.stop()


def test_camera_config_from_deploy_yaml():
  """The shipped deploy_ros config.yaml parses into a CameraConfig
  (packaging parity: reference airbot_sim2real_sl/config/config.yaml)."""
  import os

  from rsr_mjx_tpu.deploy import perception

  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  path = os.path.join(
      repo, 'deploy_ros', 'airbot_rsr_deploy', 'config', 'config.yaml'
  )
  cfg = perception.CameraConfig.from_yaml(path)
  assert cfg.intrinsics.shape == (3, 3)
  assert cfg.distortion.shape == (5,)
  assert cfg.tag_length == 0.04
