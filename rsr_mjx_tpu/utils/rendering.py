"""Offscreen rollout rendering via the C MuJoCo renderer.

TPU-native equivalent of the reference's ``render_array``
(ppo_train/go2_training/mujoco_playground/_src/mjx_env.py:173-212) and the
post-training rollout → mp4 step in every reference training script
(ppo_train/airbot_training/train.py:94-117, learning/train_jax_ppo.py:286-328).

The physics runs on TPU in this framework, so rendering is a pure host
post-process: trajectories (qpos per control step) are replayed through a
``mujoco.MjData`` built from the same MJCF the env compiled, and rasterized
with the EGL headless backend.  Every env keeps its compiled
``mujoco.MjModel`` as ``env._mjm`` (envs/airbot/cube_push.py,
envs/go2/base.py), so any registered env can be rendered.

Video files are written with OpenCV (mp4v codec, no ffmpeg binary needed in
this image); ``save_video`` falls back to an animated GIF via PIL if the
mp4 writer cannot open.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import numpy as np

# headless default: EGL (verified working in this image); a user with a
# display can override by exporting MUJOCO_GL before import.
if 'MUJOCO_GL' not in os.environ and 'DISPLAY' not in os.environ:
  os.environ['MUJOCO_GL'] = 'egl'

import mujoco


def _qpos_of(item: Any) -> np.ndarray:
  """Accept State, Data, or a raw qpos array."""
  if hasattr(item, 'data'):  # envs.core.State
    item = item.data
  if hasattr(item, 'qpos'):  # physics Data
    item = item.qpos
  return np.asarray(item)


def render_array(
    mjm: mujoco.MjModel,
    trajectory: Sequence[Any],
    height: int = 240,
    width: int = 320,
    camera: Optional[str] = None,
    scene_option: Optional[mujoco.MjvOption] = None,
    modify_scene=None,
) -> np.ndarray:
  """Render a qpos trajectory to (T, H, W, 3) uint8 frames.

  Mirrors reference mjx_env.render_array (mjx_env.py:173-212): per frame,
  write qpos into MjData, mj_forward for derived quantities, rasterize.
  ``modify_scene(scene, frame_index)``, if given, may add decoration geoms
  per frame (e.g. ``utils.gait.draw_joystick_command``).
  """
  d = mujoco.MjData(mjm)
  renderer = mujoco.Renderer(mjm, height=height, width=width)
  frames = []
  try:
    for i, item in enumerate(trajectory):
      d.qpos[:] = _qpos_of(item)
      mujoco.mj_forward(mjm, d)
      if camera is not None:
        renderer.update_scene(d, camera=camera, scene_option=scene_option)
      else:
        renderer.update_scene(d, scene_option=scene_option)
      if modify_scene is not None:
        modify_scene(renderer.scene, i)
      frames.append(renderer.render().copy())
  finally:
    renderer.close()
  return np.stack(frames)


def render_env_rollout(
    env,
    policy=None,
    n_steps: int = 200,
    seed: int = 0,
    height: int = 240,
    width: int = 320,
    camera: Optional[str] = None,
) -> np.ndarray:
  """Deterministic rollout of ``env`` under ``policy`` rendered to frames.

  ``policy(obs, rng) -> (action, extras)`` (the trainers' make_policy
  signature) or None for zero actions.  Reference flow:
  ppo_train/airbot_training/train.py:94-117.
  """
  import jax
  import jax.numpy as jnp

  # prefer a dedicated render model (e.g. Go2's reference visual meshes,
  # envs/go2/visual.py) over the primitive physics model
  mjm = getattr(env.unwrapped, '_mjm_render', None) or env.unwrapped._mjm
  rng = jax.random.PRNGKey(seed)
  state = jax.jit(env.reset)(rng)
  step = jax.jit(env.step)
  qposes = [np.asarray(state.data.qpos)]
  for _ in range(n_steps):
    if policy is None:
      action = jnp.zeros(env.action_size)
    else:
      rng, sub = jax.random.split(rng)
      action, _ = policy(state.obs, sub)
    state = step(state, action)
    qposes.append(np.asarray(state.data.qpos))
  if camera is None:
    # default to the model's tracking camera when one exists (reference
    # rollout videos track the robot, train_jax_ppo.py:286-328)
    cam_id = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_CAMERA, 'track')
    if cam_id >= 0:
      camera = 'track'
  return render_array(mjm, qposes, height=height, width=width, camera=camera)


def save_video(frames: np.ndarray, path: str, fps: float = 50.0) -> str:
  """Write (T, H, W, 3) uint8 frames to mp4 (OpenCV); GIF fallback.

  Returns the path actually written (extension may change on fallback)."""
  frames = np.asarray(frames)
  if frames.dtype != np.uint8:
    frames = np.clip(frames, 0, 255).astype(np.uint8)
  t, h, w = frames.shape[:3]
  os.makedirs(os.path.dirname(os.path.abspath(path)) or '.', exist_ok=True)
  try:
    import cv2

    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*'mp4v'), fps, (w, h)
    )
    if writer.isOpened():
      for f in frames:
        writer.write(f[:, :, ::-1])  # RGB → BGR
      writer.release()
      return path
  except ImportError:
    pass
  # fallback: animated GIF via PIL
  from PIL import Image

  gif_path = os.path.splitext(path)[0] + '.gif'
  imgs = [Image.fromarray(f) for f in frames]
  imgs[0].save(
      gif_path,
      save_all=True,
      append_images=imgs[1:],
      duration=int(1000 / fps),
      loop=0,
  )
  return gif_path
