"""Airbot Play manipulation environments (cube-push, T-shape push)."""

from rsr_mjx_tpu.envs.airbot.cube_push import AirbotCubePush
from rsr_mjx_tpu.envs.airbot.scene import build_cube_scene

__all__ = ['AirbotCubePush', 'build_cube_scene']
