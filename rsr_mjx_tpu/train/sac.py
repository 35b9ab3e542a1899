"""On-device SAC trainer, TPU-native.

Re-implements the brax 0.12.1 SAC loop the reference depends on externally
(SURVEY §3.3: replay, twin critics, target-net τ-update, α autotuning)
under the same shard_map/mesh layout as the PPO trainer: envs and replay
buffers sharded per device along the 'data' axis, learner replicated,
gradients pmean-reduced.  The RSR penalty enters the actor loss as a
first-class argument — no module swapping (contrast RSR/sac_train.py:104-123).

Checkpoints follow the reference naming contract
``<prefix>_sac_<step>.pkl`` (sac_train.py:66-69).
"""

from __future__ import annotations

import functools
import pickle
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from rsr_mjx_tpu.envs import wrappers
from rsr_mjx_tpu.envs.core import Env
from rsr_mjx_tpu.train import acting
from rsr_mjx_tpu.train import replay_buffer
from rsr_mjx_tpu.train import running_statistics
from rsr_mjx_tpu.train import sac_losses
from rsr_mjx_tpu.train import sac_networks
from rsr_mjx_tpu.train.losses import Transition

_MESH_AXIS = 'data'


@struct.dataclass
class TrainingState:
  policy_optimizer_state: optax.OptState
  policy_params: Any
  q_optimizer_state: optax.OptState
  q_params: Any
  target_q_params: Any
  gradient_steps: jax.Array
  env_steps: jax.Array
  alpha_optimizer_state: optax.OptState
  alpha_params: jax.Array  # log_alpha
  normalizer_params: running_statistics.RunningStatisticsState


def train(
    environment: Env,
    num_timesteps: int,
    episode_length: int,
    past_data: Any = None,
    wrap_env_fn: Optional[Callable] = None,
    action_repeat: int = 1,
    num_envs: int = 1,
    num_eval_envs: int = 128,
    learning_rate: float = 1e-4,
    discounting: float = 0.9,
    seed: int = 0,
    batch_size: int = 256,
    num_evals: int = 1,
    normalize_observations: bool = False,
    reward_scaling: float = 1.0,
    tau: float = 0.005,
    min_replay_size: int = 0,
    max_replay_size: Optional[int] = None,
    grad_updates_per_step: int = 1,
    deterministic_eval: bool = False,
    network_factory: Callable[..., sac_networks.SACNetworks] = (
        sac_networks.make_sac_networks
    ),
    progress_fn: Callable[[int, dict], None] = lambda *args: None,
    checkpoint_logdir: Optional[str] = None,
    eval_env: Optional[Env] = None,
    randomization_fn: Optional[Callable] = None,
    rsr_loss_scale: float = 1.0,
    max_grad_norm: Optional[float] = None,
    devices: Optional[list] = None,
):
  """Train a SAC policy.  Returns (make_policy, (normalizer, params), metrics).

  Argument surface mirrors RSR/sac_train.py:28-61 / brax SAC."""
  if rsr_loss_scale < 0:
    raise ValueError(
        f'rsr_loss_scale must be non-negative, got {rsr_loss_scale}'
    )
  if max_replay_size is None:
    max_replay_size = num_timesteps

  devices = devices or jax.devices()
  num_devices = len(devices)
  process_count = jax.process_count()
  process_id = jax.process_index()
  assert num_envs % (num_devices * process_count) == 0
  mesh = Mesh(np.array(devices), (_MESH_AXIS,))
  num_envs_per_device = num_envs // (num_devices * process_count)

  env_steps_per_actor_step = action_repeat * num_envs
  num_prefill_actor_steps = int(np.ceil(min_replay_size / num_envs))
  num_prefill_env_steps = num_prefill_actor_steps * env_steps_per_actor_step
  assert num_timesteps - num_prefill_env_steps >= 0
  num_evals_after_init = max(num_evals - 1, 1)
  num_training_steps_per_epoch = int(
      np.ceil(
          (num_timesteps - num_prefill_env_steps)
          / (num_evals_after_init * env_steps_per_actor_step)
      )
  )

  key = jax.random.PRNGKey(seed)
  global_key, local_key = jax.random.split(key)
  local_key = jax.random.fold_in(local_key, process_id)
  local_key, key_env, eval_key, rb_key = jax.random.split(local_key, 4)

  # ----- env wrap
  wrap_rando = None
  if randomization_fn is not None:
    rando_key, key_env = jax.random.split(key_env)
    wrap_rando = functools.partial(
        randomization_fn,
        rng=jax.random.split(rando_key, num_envs_per_device),
    )
  if wrap_env_fn is not None:
    env = wrap_env_fn(
        environment,
        episode_length=episode_length,
        action_repeat=action_repeat,
        randomization_fn=wrap_rando,
    )
  else:
    env = wrappers.wrap_for_training(
        environment,
        episode_length=episode_length,
        action_repeat=action_repeat,
        randomization_fn=wrap_rando,
    )

  obs_size = environment.observation_size
  action_size = environment.action_size
  if not isinstance(obs_size, int):
    raise NotImplementedError('dict observations: use SelectObservation')

  network = network_factory(obs_size, action_size)
  if normalize_observations:
    normalize_fn = running_statistics.normalize
  else:
    normalize_fn = lambda state, obs: obs

  def make_policy(params, deterministic: bool = False):
    normalizer_params, policy_params = params

    def policy(obs, rng):
      obs_n = normalize_fn(normalizer_params, obs)
      logits = network.policy_logits(policy_params, obs_n)
      if deterministic:
        return network.distribution.mode(logits), {}
      actions = network.distribution.sample(logits, rng)
      return actions, {}

    return policy

  def _opt(lr):
    # optional global-norm clipping (brax max_grad_norm surface)
    if max_grad_norm is not None:
      return optax.chain(
          optax.clip_by_global_norm(max_grad_norm), optax.adam(lr)
      )
    return optax.adam(lr)

  alpha_optimizer = _opt(3e-4)
  policy_optimizer = _opt(learning_rate)
  q_optimizer = _opt(learning_rate)

  alpha_loss_fn, critic_loss_fn, actor_loss_fn = sac_losses.make_losses(
      network,
      reward_scaling=reward_scaling,
      discounting=discounting,
      action_size=action_size,
      normalize_fn=normalize_fn,
      past_data=past_data,
      rsr_loss_scale=rsr_loss_scale,
  )
  alpha_grad = jax.value_and_grad(alpha_loss_fn)
  critic_grad = jax.value_and_grad(critic_loss_fn)
  actor_grad = jax.value_and_grad(actor_loss_fn)

  key_policy, key_q = jax.random.split(global_key)
  del global_key
  init_all = network.init(key_policy)
  init_policy = init_all['policy']
  init_q = network.init(key_q)['q']
  log_alpha = jnp.asarray(0.0)

  training_state = TrainingState(
      policy_optimizer_state=policy_optimizer.init(init_policy),
      policy_params=init_policy,
      q_optimizer_state=q_optimizer.init(init_q),
      q_params=init_q,
      target_q_params=init_q,
      gradient_steps=jnp.zeros((), jnp.int32),
      env_steps=jnp.zeros((), jnp.int32),
      alpha_optimizer_state=alpha_optimizer.init(log_alpha),
      alpha_params=log_alpha,
      normalizer_params=running_statistics.init_state(obs_size),
  )

  # ----- replay buffer: per-device ring, leading device axis
  capacity_per_device = max_replay_size // (num_devices * process_count)
  dummy_transition = Transition(
      observation=jnp.zeros(obs_size),
      action=jnp.zeros(action_size),
      reward=jnp.zeros(()),
      discount=jnp.zeros(()),
      next_observation=jnp.zeros(obs_size),
      extras={
          'policy_extras': {},
          'state_extras': {'truncation': jnp.zeros(())},
      },
  )
  rb_keys = jax.random.split(rb_key, num_devices)
  buffer_state = jax.vmap(
      lambda k: replay_buffer.init(capacity_per_device, dummy_transition, k)
  )(rb_keys)

  # ----- sgd machinery

  def sgd_step(carry, transitions):
    training_state, key = carry
    key, key_alpha, key_critic, key_actor = jax.random.split(key, 4)

    alpha_l, alpha_grads = alpha_grad(
        training_state.alpha_params,
        training_state.policy_params,
        training_state.normalizer_params,
        transitions,
        key_alpha,
    )
    alpha_grads = jax.lax.pmean(alpha_grads, axis_name=_MESH_AXIS)
    alpha = jnp.exp(training_state.alpha_params)

    critic_l, critic_grads = critic_grad(
        training_state.q_params,
        training_state.policy_params,
        training_state.normalizer_params,
        training_state.target_q_params,
        alpha,
        transitions,
        key_critic,
    )
    critic_grads = jax.lax.pmean(critic_grads, axis_name=_MESH_AXIS)

    actor_l, actor_grads = actor_grad(
        training_state.policy_params,
        training_state.normalizer_params,
        training_state.q_params,
        alpha,
        transitions,
        key_actor,
    )
    actor_grads = jax.lax.pmean(actor_grads, axis_name=_MESH_AXIS)

    alpha_update, alpha_opt_state = alpha_optimizer.update(
        alpha_grads, training_state.alpha_optimizer_state
    )
    alpha_params = optax.apply_updates(
        training_state.alpha_params, alpha_update
    )
    critic_update, q_opt_state = q_optimizer.update(
        critic_grads, training_state.q_optimizer_state
    )
    q_params = optax.apply_updates(training_state.q_params, critic_update)
    actor_update, policy_opt_state = policy_optimizer.update(
        actor_grads, training_state.policy_optimizer_state
    )
    policy_params = optax.apply_updates(
        training_state.policy_params, actor_update
    )
    target_q_params = jax.tree.map(
        lambda x, y: x * (1 - tau) + y * tau,
        training_state.target_q_params,
        q_params,
    )

    metrics = {
        'critic_loss': critic_l,
        'actor_loss': actor_l,
        'alpha_loss': alpha_l,
        'alpha': jnp.exp(alpha_params),
    }
    new_training_state = training_state.replace(
        policy_optimizer_state=policy_opt_state,
        policy_params=policy_params,
        q_optimizer_state=q_opt_state,
        q_params=q_params,
        target_q_params=target_q_params,
        gradient_steps=training_state.gradient_steps + 1,
        alpha_optimizer_state=alpha_opt_state,
        alpha_params=alpha_params,
    )
    return (new_training_state, key), metrics

  def get_experience(normalizer_params, policy_params, env_state,
                     buffer_state, key):
    policy = make_policy((normalizer_params, policy_params))
    env_state, transitions = acting.actor_step(
        env, env_state, policy, key, extra_fields=('truncation',)
    )
    if normalize_observations:
      normalizer_params = running_statistics.update(
          normalizer_params,
          transitions.observation,
          pmap_axis_name=_MESH_AXIS,
      )
    buffer_state = replay_buffer.insert(buffer_state, transitions)
    return normalizer_params, env_state, buffer_state

  def training_step(carry, unused_t):
    training_state, env_state, buffer_state, key = carry
    key, experience_key, training_key = jax.random.split(key, 3)
    normalizer_params, env_state, buffer_state = get_experience(
        training_state.normalizer_params,
        training_state.policy_params,
        env_state,
        buffer_state,
        experience_key,
    )
    training_state = training_state.replace(
        normalizer_params=normalizer_params,
        env_steps=training_state.env_steps + env_steps_per_actor_step,
    )
    # per-device sample of batch/device (brax: sample_batch_size =
    # batch_size·grad_updates // device_count); pmean makes the effective
    # global batch equal batch_size
    buffer_state, transitions = replay_buffer.sample(
        buffer_state, batch_size * grad_updates_per_step // num_devices
    )
    transitions = jax.tree.map(
        lambda x: jnp.reshape(x, (grad_updates_per_step, -1) + x.shape[1:]),
        transitions,
    )
    (training_state, _), metrics = jax.lax.scan(
        sgd_step, (training_state, training_key), transitions
    )
    return (training_state, env_state, buffer_state, key), metrics

  def prefill_step(carry, unused_t):
    training_state, env_state, buffer_state, key = carry
    key, new_key = jax.random.split(key)
    normalizer_params, env_state, buffer_state = get_experience(
        training_state.normalizer_params,
        training_state.policy_params,
        env_state,
        buffer_state,
        key,
    )
    training_state = training_state.replace(
        normalizer_params=normalizer_params,
        env_steps=training_state.env_steps + env_steps_per_actor_step,
    )
    return (training_state, env_state, buffer_state, new_key), ()

  def _squeeze0(tree):
    return jax.tree.map(lambda x: x[0], tree)

  def _expand0(tree):
    return jax.tree.map(lambda x: x[None], tree)

  def _prefill_body(training_state, env_state, buffer_state, key):
    key = key.reshape(2)
    buffer_state = _squeeze0(buffer_state)
    (training_state, env_state, buffer_state, _), _ = jax.lax.scan(
        prefill_step,
        (training_state, env_state, buffer_state, key),
        (),
        length=num_prefill_actor_steps,
    )
    return training_state, env_state, _expand0(buffer_state)

  def _epoch_body(training_state, env_state, buffer_state, key):
    key = key.reshape(2)
    buffer_state = _squeeze0(buffer_state)
    (training_state, env_state, buffer_state, _), metrics = jax.lax.scan(
        training_step,
        (training_state, env_state, buffer_state, key),
        (),
        length=num_training_steps_per_epoch,
    )
    metrics = jax.tree.map(jnp.mean, metrics)
    metrics = jax.lax.pmean(metrics, axis_name=_MESH_AXIS)
    return training_state, env_state, _expand0(buffer_state), metrics

  specs = (P(), P(_MESH_AXIS), P(_MESH_AXIS), P(_MESH_AXIS))
  prefill_fn = jax.jit(
      shard_map(
          _prefill_body,
          mesh=mesh,
          in_specs=specs,
          out_specs=specs[:3],
          check_vma=False,
      )
  )
  epoch_fn = jax.jit(
      shard_map(
          _epoch_body,
          mesh=mesh,
          in_specs=specs,
          out_specs=specs[:3] + (P(),),
          check_vma=False,
      )
  )

  key_envs = jax.random.split(key_env, num_envs // process_count)
  reset_fn = jax.jit(
      shard_map(
          env.reset,
          mesh=mesh,
          in_specs=P(_MESH_AXIS),
          out_specs=P(_MESH_AXIS),
          check_vma=False,
      )
  )
  env_state = reset_fn(key_envs)

  # ----- evaluator
  eval_base = environment if eval_env is None else eval_env
  if wrap_env_fn is not None:
    eval_wrapped = wrap_env_fn(
        eval_base, episode_length=episode_length, action_repeat=action_repeat
    )
  else:
    eval_wrapped = wrappers.wrap_for_training(
        eval_base, episode_length=episode_length, action_repeat=action_repeat
    )
  eval_wrapped = wrappers.EvalWrapper(eval_wrapped)
  evaluator = acting.Evaluator(
      eval_wrapped,
      functools.partial(make_policy, deterministic=deterministic_eval),
      num_eval_envs=num_eval_envs,
      episode_length=episode_length,
      action_repeat=action_repeat,
      key=eval_key,
  )

  metrics = {}
  if process_id == 0 and num_evals > 1:
    params = (training_state.normalizer_params, training_state.policy_params)
    metrics = evaluator.run_evaluation(params, training_metrics={})
    progress_fn(0, metrics)

  # prefill
  local_key, prefill_key = jax.random.split(local_key)
  prefill_keys = jax.random.split(prefill_key, num_devices)
  training_state, env_state, buffer_state = prefill_fn(
      training_state, env_state, buffer_state, prefill_keys
  )

  training_walltime = 0.0
  current_step = int(training_state.env_steps) * process_count
  for _ in range(num_evals_after_init):
    t = time.time()
    local_key, epoch_key = jax.random.split(local_key)
    epoch_keys = jax.random.split(epoch_key, num_devices)
    training_state, env_state, buffer_state, sgd_metrics = epoch_fn(
        training_state, env_state, buffer_state, epoch_keys
    )
    jax.block_until_ready(training_state.policy_params)
    epoch_time = time.time() - t
    training_walltime += epoch_time
    current_step = int(training_state.env_steps) * process_count
    sps = (
        env_steps_per_actor_step * num_training_steps_per_epoch
    ) / epoch_time
    metrics = {
        'training/sps': sps,
        'training/walltime': training_walltime,
        **{f'training/{k}': float(v) for k, v in sgd_metrics.items()},
    }
    if process_id == 0:
      params = (
          training_state.normalizer_params,
          training_state.policy_params,
      )
      if num_evals > 0:
        metrics = evaluator.run_evaluation(params, metrics)
      if checkpoint_logdir:
        path = f'{checkpoint_logdir}_sac_{current_step}.pkl'
        with open(path, 'wb') as f:
          pickle.dump(jax.device_get(params), f)
      progress_fn(current_step, metrics)

  assert current_step >= num_timesteps, (current_step, num_timesteps)
  params = (training_state.normalizer_params, training_state.policy_params)
  return make_policy, params, metrics


def save_params(path: str, params) -> None:
  with open(path, 'wb') as f:
    pickle.dump(jax.device_get(params), f)


def load_params(path: str):
  with open(path, 'rb') as f:
    return pickle.load(f)
