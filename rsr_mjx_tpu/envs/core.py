"""Unified environment substrate.

The reference splits envs across two stacks — Brax ``PipelineEnv`` for the
Airbot tasks (ppo_train/airbot_training/cube_env.py:8,41-44) and a vendored
``mujoco_playground`` ``MjxEnv`` for Go2
(ppo_train/go2_training/mujoco_playground/_src/mjx_env.py:97-172).  Here
both collapse into one substrate: a single ``State`` pytree and an ``Env``
ABC whose ``reset``/``step`` are pure jit/vmap-safe functions.

``init``/``step`` mirror mjx_env.init/step (mjx_env.py:30-65): init
overwrites qpos/qvel/ctrl then runs forward; step scans the physics step
over ``n_substeps``.
"""

from __future__ import annotations

import abc
from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
from flax import struct

from rsr_mjx_tpu import physics
from rsr_mjx_tpu.physics.types import Data, Model

Observation = Union[jax.Array, Dict[str, jax.Array]]


@struct.dataclass
class State:
  """Environment state pytree (reference: mjx_env.py:66-96).

  All per-env bookkeeping (commands, delay buffers, episode counters added
  by wrappers) lives in ``info`` so vmap/scan see one flat pytree.
  """

  data: Data
  obs: Observation
  reward: jax.Array
  done: jax.Array
  metrics: Dict[str, jax.Array]
  info: Dict[str, Any]

  def tree_replace(self, params: Dict[str, Any]) -> 'State':
    """Replace nested attributes by 'a.b.c' path (mjx_env.py:83-96)."""
    new = self
    for k, v in params.items():
      new = _tree_replace_by_path(new, k.split('.'), v)
    return new


def _tree_replace_by_path(base, attrs, val):
  if len(attrs) == 1:
    return base.replace(**{attrs[0]: val})
  return base.replace(
      **{attrs[0]: _tree_replace_by_path(getattr(base, attrs[0]), attrs[1:], val)}
  )


def init(
    m: Model,
    qpos: Optional[jax.Array] = None,
    qvel: Optional[jax.Array] = None,
    ctrl: Optional[jax.Array] = None,
) -> Data:
  """Fresh Data with optional state overrides, forward'd (mjx_env.py:30-54)."""
  d = physics.make_data(m)
  # Cast overrides to the Data field dtypes so the substrate is stable under
  # ambient jax_enable_x64 (mixed-precision callers must not change carry
  # dtypes of downstream lax.scan loops).
  if qpos is not None:
    d = d.replace(qpos=jnp.asarray(qpos, d.qpos.dtype))
  if qvel is not None:
    d = d.replace(qvel=jnp.asarray(qvel, d.qvel.dtype))
  if ctrl is not None:
    d = d.replace(ctrl=jnp.asarray(ctrl, d.ctrl.dtype))
  return physics.forward(m, d)


def step(m: Model, d: Data, ctrl: jax.Array, n_substeps: int = 1) -> Data:
  """Advance physics ``n_substeps`` with held ctrl (mjx_env.py:55-65)."""
  # Cast to the physics dtype (d.qpos), not d.ctrl: callers may have stored
  # a wider ctrl on Data directly, and the scan carry must stay stable.
  ctrl = jnp.asarray(ctrl, d.qpos.dtype)
  if d.ctrl.dtype != d.qpos.dtype:
    d = d.replace(ctrl=jnp.asarray(d.ctrl, d.qpos.dtype))

  if n_substeps == 1:
    return physics.step(m, d.replace(ctrl=ctrl))

  # sensors are pure outputs, so only the LAST substep fills them — the
  # final sensordata is bitwise identical, the n-1 intermediate fills were
  # dead work (round-5 perf)
  def f(d, _):
    d = physics.step(m, d.replace(ctrl=ctrl), sensors=False)
    return d, None

  d, _ = jax.lax.scan(f, d, None, length=n_substeps - 1)
  return physics.step(m, d.replace(ctrl=ctrl))


class Env(abc.ABC):
  """Environment ABC (reference: MjxEnv, mjx_env.py:97-172)."""

  @abc.abstractmethod
  def reset(self, rng: jax.Array) -> State:
    ...

  @abc.abstractmethod
  def step(self, state: State, action: jax.Array) -> State:
    ...

  @property
  @abc.abstractmethod
  def model(self) -> Model:
    ...

  @property
  @abc.abstractmethod
  def action_size(self) -> int:
    ...

  @property
  def observation_size(self):
    """Obs sizes via shape inference, no FLOPs (mjx_env.py:143-149)."""
    rng = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(self.reset, rng).obs
    if isinstance(shapes, dict):
      return {k: v.shape for k, v in shapes.items()}
    return shapes.shape[-1]

  @property
  def dt(self) -> float:
    """Control period (s)."""
    return self.ctrl_dt

  @property
  def ctrl_dt(self) -> float:
    raise NotImplementedError

  @property
  def sim_dt(self) -> float:
    raise NotImplementedError

  @property
  def n_substeps(self) -> int:
    return int(round(self.ctrl_dt / self.sim_dt))

  @property
  def unwrapped(self) -> 'Env':
    return self


class Wrapper(Env):
  """Delegating base wrapper (reference: wrapper.py:11-40)."""

  def __init__(self, env: Env):
    self.env = env

  def reset(self, rng: jax.Array) -> State:
    return self.env.reset(rng)

  def step(self, state: State, action: jax.Array) -> State:
    return self.env.step(state, action)

  @property
  def model(self) -> Model:
    return self.env.model

  @property
  def action_size(self) -> int:
    return self.env.action_size

  @property
  def observation_size(self):
    return self.env.observation_size

  @property
  def ctrl_dt(self) -> float:
    return self.env.ctrl_dt

  @property
  def sim_dt(self) -> float:
    return self.env.sim_dt

  @property
  def unwrapped(self) -> Env:
    return self.env.unwrapped

  def __getattr__(self, name):
    if name.startswith('__'):
      raise AttributeError(name)
    return getattr(self.env, name)
