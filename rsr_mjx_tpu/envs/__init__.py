"""Environment package: unified substrate, wrappers, and registry.

The registry unifies the reference's two mechanisms (brax env registration
in the Airbot scripts and mujoco_playground's registry.load,
_src/registry.py:18-37, _src/locomotion/__init__.py:51-89).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

from rsr_mjx_tpu.envs import core, wrappers
from rsr_mjx_tpu.envs.core import Env, State, Wrapper, init, step

_ENVS: Dict[str, Callable[..., Env]] = {}
_CONFIGS: Dict[str, Callable[[], Any]] = {}
_RANDOMIZERS: Dict[str, Optional[Callable]] = {}


def register_environment(
    name: str,
    ctor: Callable[..., Env],
    config_fn: Optional[Callable[[], Any]] = None,
    randomizer: Optional[Callable] = None,
) -> None:
  _ENVS[name] = ctor
  if config_fn is not None:
    _CONFIGS[name] = config_fn
  _RANDOMIZERS[name] = randomizer


def load(name: str, config: Optional[Any] = None, **kwargs) -> Env:
  """Instantiate a registered env (reference: registry.load)."""
  if name not in _ENVS:
    raise ValueError(f'unknown env {name!r}; registered: {sorted(_ENVS)}')
  if config is not None:
    return _ENVS[name](config=config, **kwargs)
  return _ENVS[name](**kwargs)


def get_default_config(name: str):
  return _CONFIGS[name]()


def get_domain_randomizer(name: str) -> Optional[Callable]:
  return _RANDOMIZERS.get(name)


def registered_envs() -> Tuple[str, ...]:
  return tuple(sorted(_ENVS))


def _register_builtin():
  from rsr_mjx_tpu.envs.airbot.cube_push import AirbotCubePush
  from rsr_mjx_tpu.envs.airbot.t_push import AirbotTPush

  register_environment(
      'AirbotCubePush', lambda **kw: AirbotCubePush(variant='rsr', **kw)
  )
  register_environment(
      'AirbotCubePushTrain',
      lambda **kw: AirbotCubePush(variant='train', **kw),
  )
  register_environment('AirbotTPush', AirbotTPush)

  from rsr_mjx_tpu.envs.airbot import randomize as airbot_randomize
  from rsr_mjx_tpu.envs.go2 import randomize as go2_randomize
  from rsr_mjx_tpu.envs.go2.getup import Getup
  from rsr_mjx_tpu.envs.go2.getup import default_config as getup_config
  from rsr_mjx_tpu.envs.go2.handstand import Footstand, Handstand
  from rsr_mjx_tpu.envs.go2.handstand import (
      default_config as handstand_config,
  )
  from rsr_mjx_tpu.envs.go2.joystick import Joystick, default_config

  _RANDOMIZERS['AirbotCubePush'] = airbot_randomize.domain_randomize
  _RANDOMIZERS['AirbotCubePushTrain'] = airbot_randomize.domain_randomize

  register_environment(
      'Go2JoystickFlatTerrain',
      lambda **kw: Joystick(task='flat_terrain', **kw),
      config_fn=default_config,
      randomizer=go2_randomize.domain_randomize,
  )
  register_environment(
      'Go2JoystickRoughTerrain',
      lambda **kw: Joystick(task='rough_terrain', **kw),
      config_fn=default_config,
      randomizer=go2_randomize.domain_randomize,
  )
  register_environment(
      'Go2Getup',
      Getup,
      config_fn=getup_config,
      randomizer=go2_randomize.domain_randomize,
  )
  register_environment(
      'Go2Handstand',
      Handstand,
      config_fn=handstand_config,
      randomizer=go2_randomize.domain_randomize,
  )
  register_environment(
      'Go2Footstand',
      Footstand,
      config_fn=handstand_config,
      randomizer=go2_randomize.domain_randomize,
  )


_register_builtin()

__all__ = [
    'Env',
    'State',
    'Wrapper',
    'core',
    'wrappers',
    'init',
    'step',
    'load',
    'register_environment',
    'get_default_config',
    'get_domain_randomizer',
    'registered_envs',
]
