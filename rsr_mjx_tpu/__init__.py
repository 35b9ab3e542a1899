"""rsr_mjx_tpu: a TPU-native real-to-sim-to-real RL framework.

From-scratch rebuild of the capability surface of sunnyshi0310/RSR-MJX
(reference mounted at /root/reference) designed for TPU: a JAX rigid-body
physics engine, vectorized environments, on-device PPO/SAC trainers, and
the RSR sim-real distribution-matching core — all jit/vmap/shard_map-first.
"""

__version__ = '0.1.0'

# Honor JAX_PLATFORMS=cpu even when a site hook (e.g. a remote-TPU
# tunnel's sitecustomize) imported jax before this process saw the
# variable — the env-var is only read at jax-import time, so re-apply it
# to the live config.  Only the 'cpu' case is handled: it is always
# available and it is the one tests/verification need (SKILL.md gotchas).
import os as _os

# Headless offscreen rendering: C MuJoCo freezes its GL backend choice at
# first `import mujoco` (mujoco/__init__.py imports the renderer's
# gl_context eagerly), so the EGL default must be in place before any
# module here pulls mujoco in — utils/rendering.py is too late when the
# env modules imported mujoco first.
if 'MUJOCO_GL' not in _os.environ and 'DISPLAY' not in _os.environ:
  _os.environ['MUJOCO_GL'] = 'egl'

if _os.environ.get('JAX_PLATFORMS') == 'cpu':
  import jax as _jax

  try:
    _jax.config.update('jax_platforms', 'cpu')
  except Exception:  # backends already initialized: keep whatever is live
    pass
del _os
