"""Training wrappers, re-implemented natively.

Reference semantics (load-bearing for training dynamics — SURVEY §7):
  - Episode: step counting, time-limit done, ``truncation`` flag feeding
    GAE bootstrapping (brax EpisodeWrapper; RSR/losses.py:147-148).
  - AutoReset: caches the post-reset state and restores it where done
    (mujoco_playground/_src/wrapper.py:117-138).
  - Vmap: batch envs along a leading axis (brax VmapWrapper /
    wrapper.py:69-71).
  - DomainRandomization: vmap over a batched model with an in_axes pytree
    (wrapper.py:139-165).
  - SelectObservation: extract one key of a dict obs (wrapper.py:77-114).

Deliberately omitted: the Madrona batch-vision tiling wrapper
(reference wrapper.py:166-280).  It exists in the reference only to
support pixel-observation envs via the Madrona GPU batch renderer; none
of the reference's registered tasks (Airbot cube/T, Go2 suite) uses
vision observations, no entry script enables it, and Madrona is a
CUDA-only renderer with no TPU path.  If a pixel task is ever added, the
TPU-native equivalent is host-side C-MuJoCo rendering
(utils/rendering.py) feeding observations through host callbacks or a
pre-rendered dataset — not a port of the Madrona wrapper.
"""

from __future__ import annotations

import copy
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from rsr_mjx_tpu.envs.core import Env, State, Wrapper
from rsr_mjx_tpu.physics.types import Model


class EpisodeWrapper(Wrapper):
  """Time limit + action repeat (brax episode semantics)."""

  def __init__(self, env: Env, episode_length: int, action_repeat: int = 1):
    super().__init__(env)
    self.episode_length = episode_length
    self.action_repeat = action_repeat

  def reset(self, rng: jax.Array) -> State:
    state = self.env.reset(rng)
    # counters take the env's reward dtype so reset-state and step-state
    # carries agree under ambient jax_enable_x64 (where a bare jnp.zeros
    # would be f64 while step outputs stay f32)
    state.info['steps'] = jnp.zeros(rng.shape[:-1], state.reward.dtype)
    state.info['truncation'] = jnp.zeros(rng.shape[:-1], state.reward.dtype)
    return state

  def step(self, state: State, action: jax.Array) -> State:
    def f(state, _):
      nstate = self.env.step(state, action)
      return nstate, nstate.reward

    state, rewards = jax.lax.scan(f, state, (), self.action_repeat)
    state = state.replace(reward=jnp.sum(rewards, axis=0))
    steps = state.info['steps'] + self.action_repeat
    one = jnp.ones_like(state.done)
    zero = jnp.zeros_like(state.done)
    done = jnp.where(steps >= self.episode_length, one, state.done)
    state.info['truncation'] = jnp.where(
        steps >= self.episode_length, 1 - state.done, zero
    )
    state.info['steps'] = steps
    return state.replace(done=done)


class NonFiniteGuardWrapper(Wrapper):
  """Quarantines numerically blown envs (round-4 containment).

  The f32 contact solver can diverge at ~1e-5 per env-step under deep
  multi-contact penetration (round-3 verdict, weak #2).  The reference
  never needed this guard (f64 CUDA MJX; MuJoCo C contains the same
  failure with its mjWARN_BADQACC auto-reset) — on TPU f32 it is
  load-bearing: one NaN transition otherwise poisons the pmean'd gradient
  and the params are permanently NaN within one epoch.

  Placed between Episode and AutoReset: where qpos/qvel go non-finite or
  |qvel| exceeds ``qvel_limit`` (MuJoCo mj_checkAcc semantics), the env is
  marked done (termination, not truncation — the blown next state must
  not be bootstrapped from), its reward is zeroed, and the state pytree is
  sanitized so downstream masked math stays finite.  AutoReset then
  restores the cached first state.  The trip count is exported as the
  ``nonfinite`` metric.
  """

  def __init__(self, env: Env, qvel_limit: float = 1e3):
    super().__init__(env)
    self.qvel_limit = qvel_limit

  def _blown(self, state: State) -> jax.Array:
    blown = jnp.zeros(jnp.shape(state.reward), bool)
    qpos = getattr(state.data, 'qpos', None)
    qvel = getattr(state.data, 'qvel', None)
    if qpos is not None and qvel is not None:
      finite = jnp.all(jnp.isfinite(qpos), axis=-1) & jnp.all(
          jnp.isfinite(qvel), axis=-1
      )
      # nan_to_num so the limit test itself is NaN-proof
      speed = jnp.max(
          jnp.abs(jnp.nan_to_num(qvel, nan=jnp.inf)), axis=-1
      )
      blown = (~finite) | (speed > self.qvel_limit)
    # fold in non-finite obs/reward: a blown obs with finite qpos/qvel
    # would otherwise reach the normalizer/policy
    obs = state.obs
    obs_leaves = obs.values() if isinstance(obs, dict) else [obs]
    for leaf in obs_leaves:
      blown = blown | ~jnp.all(jnp.isfinite(leaf), axis=-1)
    blown = blown | ~jnp.isfinite(state.reward)
    return blown

  @staticmethod
  def _sanitize(tree):
    def f(x):
      if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)
      return x

    return jax.tree.map(f, tree)

  def reset(self, rng: jax.Array) -> State:
    state = self.env.reset(rng)
    state.metrics['nonfinite'] = jnp.zeros_like(state.reward)
    # Cache the reset-time info: real envs keep obs-feeding float state in
    # info (cube-push cached poses, Go2 gyro/action delay buffers), which
    # goes NaN on a blown step and would otherwise persist through the
    # AutoReset restore (which only restores data/obs) — the quarantined
    # env would then produce NaN obs and re-trip done forever instead of
    # recovering (ADVICE r4, medium).  Restoring is scoped to *blown* envs
    # only: ordinary done envs keep their info across auto-reset exactly
    # like the reference BraxAutoResetWrapper (wrapper.py:117-138).
    state.info['first_info'] = {
        k: v for k, v in state.info.items() if k != 'first_info'
    }
    return state

  def step(self, state: State, action: jax.Array) -> State:
    # a blown action (NaN policy output) would corrupt ctrl before the
    # guard sees the result; sanitize it on the way in
    action = self._sanitize(action)
    # strip the guard-owned metric before the inner step: inner envs build
    # their metrics dict fresh, and EpisodeWrapper's action-repeat scan
    # requires a structurally stable carry
    inner_metrics = dict(state.metrics)
    inner_metrics.pop('nonfinite', None)
    state = self.env.step(state.replace(metrics=inner_metrics), action)
    blown = self._blown(state)

    def where_blown(x, y):
      b = blown
      if b.shape and x.ndim > b.ndim:
        b = jnp.reshape(b, b.shape + (1,) * (x.ndim - b.ndim))
      return jnp.where(b, x, y)

    data = jax.tree.map(where_blown, self._sanitize(state.data), state.data)
    obs = jax.tree.map(where_blown, self._sanitize(state.obs), state.obs)
    reward = jnp.where(blown, jnp.zeros_like(state.reward), state.reward)
    done = jnp.where(blown, jnp.ones_like(state.done), state.done)
    metrics = self._sanitize(state.metrics)
    metrics['nonfinite'] = blown.astype(reward.dtype)
    info = dict(state.info)
    if 'truncation' in info:
      # blown termination is not a time-limit truncation: do not
      # bootstrap the value function from the sanitized state
      info['truncation'] = jnp.where(
          blown, jnp.zeros_like(info['truncation']), info['truncation']
      )
    # restore the cached reset-time info where blown so the env recovers
    # consistently with AutoReset's first_data/first_obs restore (the env's
    # recurrent info — delay buffers, cached poses, commands — must match
    # the restored first state, and must not stay NaN)
    first_info = info.get('first_info')
    if first_info is not None:
      for k, v in first_info.items():
        if k == 'truncation' or k not in info:
          continue
        info[k] = jax.tree.map(where_blown, v, info[k])
    return state.replace(
        data=data, obs=obs, reward=reward, done=done, metrics=metrics,
        info=info,
    )


class AutoResetWrapper(Wrapper):
  """Reset to the cached first state where done (wrapper.py:117-138).

  The cached state comes from the true ``reset``; restoring it instead of
  re-running reset keeps the step function cheap and shape-static (no
  per-env RNG resample inside the rollout scan) — identical to the
  reference's training-time behavior.
  """

  def reset(self, rng: jax.Array) -> State:
    state = self.env.reset(rng)
    state.info['first_data'] = state.data
    state.info['first_obs'] = state.obs
    return state

  def step(self, state: State, action: jax.Array) -> State:
    if 'steps' in state.info:
      steps = state.info['steps']
      steps = jnp.where(state.done, jnp.zeros_like(steps), steps)
      state.info['steps'] = steps
    state = state.replace(done=jnp.zeros_like(state.done))
    state = self.env.step(state, action)

    def where_done(x, y):
      done = state.done
      if done.shape:
        done = jnp.reshape(done, [x.shape[0]] + [1] * (len(x.shape) - 1))
      return jnp.where(done, x, y)

    data = jax.tree.map(where_done, state.info['first_data'], state.data)
    obs = jax.tree.map(where_done, state.info['first_obs'], state.obs)
    return state.replace(data=data, obs=obs)


class VmapWrapper(Wrapper):
  """Batch envs along the leading axis (brax VmapWrapper)."""

  def __init__(self, env: Env, batch_size: Optional[int] = None):
    super().__init__(env)
    self.batch_size = batch_size

  def reset(self, rng: jax.Array) -> State:
    if self.batch_size is not None and rng.ndim == 1:
      rng = jax.random.split(rng, self.batch_size)
    return jax.vmap(self.env.reset)(rng)

  def step(self, state: State, action: jax.Array) -> State:
    return jax.vmap(self.env.step)(state, action)


class DomainRandomizationVmapWrapper(Wrapper):
  """Vmap reset/step over a batched randomized model (wrapper.py:139-165).

  ``randomization_fn(model) -> (model_batched, in_axes)`` where
  ``model_batched`` has a leading env axis on the randomized leaves and
  ``in_axes`` is a matching pytree of 0/None (reference randomizers:
  ppo_train/airbot_training/domain_randomize.py:76-91, go2/randomize.py).
  """

  def __init__(
      self,
      env: Env,
      randomization_fn: Callable[[Model], Tuple[Model, Model]],
  ):
    super().__init__(env)
    self._model_v, self._in_axes = randomization_fn(self.env.model)

  def _env_fn(self, model: Model) -> Env:
    env = copy.copy(self.env.unwrapped)
    env.bind_model(model)
    return env

  def reset(self, rng: jax.Array) -> State:
    def reset_fn(model, rng):
      return self._env_fn(model).reset(rng)

    return jax.vmap(reset_fn, in_axes=[self._in_axes, 0])(self._model_v, rng)

  def step(self, state: State, action: jax.Array) -> State:
    def step_fn(model, state, action):
      return self._env_fn(model).step(state, action)

    return jax.vmap(step_fn, in_axes=[self._in_axes, 0, 0])(
        self._model_v, state, action
    )


class SelectObservationWrapper(Wrapper):
  """Flatten a dict obs to one of its keys (wrapper.py:77-114) — used to
  feed the SAC policy the ``state`` key of Go2's dict obs."""

  def __init__(self, env: Env, key: str = 'state'):
    super().__init__(env)
    self._key = key

  def reset(self, rng: jax.Array) -> State:
    state = self.env.reset(rng)
    return state.replace(obs=state.obs[self._key])

  def step(self, state: State, action: jax.Array) -> State:
    # the inner env builds its obs dict from data alone; reconstruct the
    # full dict is unnecessary — inner step only reads state.data/info
    nstate = self.env.step(state, action)
    return nstate.replace(obs=nstate.obs[self._key])

  @property
  def observation_size(self):
    return self.env.observation_size[self._key][-1]


def _strongtype(tree):
  """Clear weak types on every leaf.

  Env reward/done math with python scalars (e.g. ``jp.where(d < x, 1.0,
  0.0)``) produces weak-typed f32 leaves; a reset state has strong types.
  Feeding a step output back into a jitted step/rollout then flips the jit
  cache key once per weak leaf — harmless locally but each recompile costs
  ~17 s through a remote-compile TPU service and minutes for large rollout
  scans.  Normalizing at the wrapper boundary makes step outputs reusable
  as inputs with zero recompiles.  The converts are no-ops in XLA.
  """
  return jax.tree.map(
      lambda x: x.astype(x.dtype) if isinstance(x, jax.Array) else x, tree
  )


class StrongTypeWrapper(Wrapper):
  """Normalizes weak dtypes of reset/step outputs (see _strongtype)."""

  def reset(self, rng: jax.Array) -> State:
    return _strongtype(self.env.reset(rng))

  def step(self, state: State, action: jax.Array) -> State:
    return _strongtype(self.env.step(state, action))


class CanonicalDtypeWrapper(Wrapper):
  """Pins every float leaf of reset/step outputs to the physics dtype.

  Under ambient ``jax_enable_x64`` an env's reset can mint f64 leaves
  (``jax.random.uniform`` defaults to f64) while its step math stays f32 —
  which kills downstream ``lax.scan`` carries (EpisodeWrapper's
  action-repeat scan, rollout scans) with carry-dtype mismatches.  Applied
  innermost, this makes the whole wrapper stack dtype-stable regardless of
  the ambient x64 setting.  The casts are no-ops when dtypes already match.
  """

  def __init__(self, env: Env):
    super().__init__(env)
    model = env.model
    if model is not None and getattr(model, 'qpos0', None) is not None:
      self._dtype = jnp.asarray(model.qpos0).dtype
    else:
      # model-free envs (toy/test envs): pin to the default float dtype
      self._dtype = jnp.zeros((), dtype=float).dtype

  def _pin(self, tree):
    def cast(x):
      if not isinstance(x, jax.Array):
        return x
      if jnp.issubdtype(x.dtype, jnp.floating):
        return x.astype(self._dtype)
      return x.astype(x.dtype)  # clear weak types on non-float leaves

    return jax.tree.map(cast, tree)

  def reset(self, rng: jax.Array) -> State:
    return self._pin(self.env.reset(rng))

  def step(self, state: State, action: jax.Array) -> State:
    return self._pin(self.env.step(state, action))


class EvalMetrics:
  """Episode-accumulated metrics pytree (brax EvalMetrics semantics)."""

  def __init__(self, episode_metrics, active_episodes, episode_steps):
    self.episode_metrics = episode_metrics
    self.active_episodes = active_episodes
    self.episode_steps = episode_steps


jax.tree_util.register_pytree_node(
    EvalMetrics,
    lambda m: (
        (m.episode_metrics, m.active_episodes, m.episode_steps),
        None,
    ),
    lambda _, c: EvalMetrics(*c),
)


class EvalWrapper(Wrapper):
  """Accumulates per-episode reward/metrics for the Evaluator
  (brax training wrappers semantics)."""

  def reset(self, rng: jax.Array) -> State:
    reset_state = self.env.reset(rng)
    reset_state.metrics['reward'] = reset_state.reward
    eval_metrics = EvalMetrics(
        episode_metrics=jax.tree.map(jnp.zeros_like, reset_state.metrics),
        active_episodes=jnp.ones_like(reset_state.reward),
        episode_steps=jnp.zeros_like(reset_state.reward),
    )
    reset_state.info['eval_metrics'] = eval_metrics
    return reset_state

  def step(self, state: State, action: jax.Array) -> State:
    state_metrics = state.info['eval_metrics']
    del state.info['eval_metrics']
    nstate = self.env.step(state, action)
    nstate.metrics['reward'] = nstate.reward
    episode_steps = jnp.where(
        state_metrics.active_episodes,
        nstate.info['steps'],
        state_metrics.episode_steps,
    )
    episode_metrics = jax.tree.map(
        lambda a, b: a + b * state_metrics.active_episodes,
        state_metrics.episode_metrics,
        nstate.metrics,
    )
    active_episodes = state_metrics.active_episodes * (1 - nstate.done)
    nstate.info['eval_metrics'] = EvalMetrics(
        episode_metrics, active_episodes, episode_steps
    )
    return nstate


def wrap_for_training(
    env: Env,
    episode_length: int = 1000,
    action_repeat: int = 1,
    randomization_fn: Optional[Callable] = None,
    num_envs: Optional[int] = None,
    qvel_limit: float = 1e3,
) -> Env:
  """Standard training stack: [Vmap | DRVmap] → Episode → NonFiniteGuard
  → AutoReset (wrapper.py:41-74 ordering + round-4 NaN quarantine)."""
  if randomization_fn is None:
    env = VmapWrapper(env, batch_size=num_envs)
  else:
    env = DomainRandomizationVmapWrapper(env, randomization_fn)
  # pin dtypes above the vmap layer (below the Episode scan) so reset- and
  # step-state carries agree under ambient jax_enable_x64
  env = CanonicalDtypeWrapper(env)
  env = EpisodeWrapper(env, episode_length, action_repeat)
  # guard between Episode and AutoReset: blown envs read done=1 here, so
  # AutoReset restores the cached first state and quarantines them
  env = NonFiniteGuardWrapper(env, qvel_limit=qvel_limit)
  env = AutoResetWrapper(env)
  env = StrongTypeWrapper(env)
  return env
