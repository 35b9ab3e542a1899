"""Unitree Go2 locomotion environments."""

from rsr_mjx_tpu.envs.go2.base import Go2Env
from rsr_mjx_tpu.envs.go2.joystick import Joystick
from rsr_mjx_tpu.envs.go2.joystick import default_config as joystick_config

__all__ = ['Go2Env', 'Joystick', 'joystick_config']
