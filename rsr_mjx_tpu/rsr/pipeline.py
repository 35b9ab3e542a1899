"""RSR pipeline facade: physics-parameter tuning + RSR policy training.

Re-implements the reference's two top-level APIs (RSR/rsr_pipeline.py):

- :func:`env_params_tuning` — gradient-based tuning of physics parameters
  (friction by default) through the differentiable engine step
  (rsr_pipeline.py:49-206).  Unlike the reference, the per-sample loss is
  **vmapped** into one batched step instead of a Python loop of jitted
  calls (the vectorization win flagged in SURVEY §3.2), and the tunable
  parameter is a pluggable (setter, init) pair instead of commented-out
  alternatives (rsr_pipeline.py:128-134).

- :func:`build_policy_rsr_data` / :func:`policy_params_training` — validate
  the five dataset arrays, precompute RSRData, and dispatch to the native
  PPO or SAC trainer with the penalty threaded through
  (rsr_pipeline.py:209-436).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rsr_mjx_tpu.rsr import loss as rsr_loss
from rsr_mjx_tpu.train import ppo as rsr_ppo
from rsr_mjx_tpu.train import sac as rsr_sac


# ---------------------------------------------------------------------------
# env params tuning
# ---------------------------------------------------------------------------


def default_param_setter(model, params):
  """Write a friction scalar into the last geom's friction row
  (reference behavior: sys.geom_friction.at[-1,:].set(params),
  rsr_pipeline.py:128-129 — broadcasts the scalar over slide/torsion/roll).

  Alternative setters (gravity, body_mass — the commented variants at
  rsr_pipeline.py:131-134) can be passed via ``param_setter``."""
  friction = model.geom_friction.at[-1, :].set(params)
  return model.replace(geom_friction=friction)


def gravity_param_setter(model, params):
  opt = model.opt.replace(gravity=model.opt.gravity.at[-1].set(params))
  return model.replace(opt=opt)


def body_mass_param_setter(model, params):
  return model.replace(body_mass=model.body_mass.at[-1].set(params))


def _make_tuning_loss(
    step_with_params,
    states,
    actions,
    next_obs_true,
    error_weights,
    rollout_horizon: int,
    per_dim_error: bool,
    valid: Optional[jnp.ndarray] = None,
):
  """Build the tuning objective ``params -> scalar loss``.

  ``step_with_params(params, state, action) -> next_state`` supplies the
  dynamics; factored out of env_params_tuning so the window/error logic
  is unit-testable without compiling a gradient through the contact
  solver (tests/test_rsr_pipeline.py).

  ``valid`` (n,) optionally marks transitions usable for fitting; a k-step
  window containing ANY invalid transition contributes zero loss (real
  logs contain episode boundaries — a cube re-spawn inside a window makes
  its trajectory un-fittable by any physics parameter).
  """

  def step_error(pred_obs, true_obs):
    if per_dim_error:
      return jnp.sum(jnp.abs(error_weights * (pred_obs - true_obs)))
    return jnp.abs(jnp.dot(error_weights, pred_obs - true_obs))

  k = int(rollout_horizon)
  n = actions.shape[0]
  if k > 1:
    if n < k:
      raise ValueError(
          f'rollout_horizon={k} needs at least {k} transitions, have {n}'
      )
    # windows over the (consecutive) trajectory: start i rolls actions
    # i..i+k-1 and is scored against next_obs_true[i..i+k-1]
    all_starts = np.arange(n - k + 1)
    if valid is not None:
      # STATIC filtering (the data is concrete): a window whose rollout
      # crosses an episode boundary must not run at all — multiplying its
      # error by zero afterwards still back-propagates NaN (0·NaN = NaN)
      # through the shared params
      vmat = np.asarray(valid)[all_starts[:, None] + np.arange(k)[None, :]]
      all_starts = all_starts[np.all(vmat, axis=1)]
      if all_starts.size == 0:
        raise ValueError(
            'no k-step window free of invalid transitions; shorten '
            'rollout_horizon or pick a different segment'
        )
    starts = jnp.asarray(all_starts)
    widx = starts[:, None] + jnp.arange(k)[None, :]  # (S, k)
    act_w = actions[widx]  # (S, k, act)
    true_w = next_obs_true[widx]  # (S, k, obs)

    def loss_fn(params):
      def one(state, acts_k, true_k):
        def body(s, inp):
          a, t = inp
          s2 = step_with_params(params, s, a)
          return s2, step_error(s2.obs, t)

        _, errs = jax.lax.scan(body, state, (acts_k, true_k))
        return jnp.sum(errs)

      start_states = jax.tree.map(lambda x: x[starts], states)
      errors = jax.vmap(one)(start_states, act_w, true_w)
      return jnp.sum(errors) / k
  else:
    keep = (
        jnp.asarray(np.flatnonzero(np.asarray(valid)))
        if valid is not None
        else jnp.arange(n)
    )

    def loss_fn(params):
      def one(state, action, true_next):
        next_state = step_with_params(params, state, action)
        return step_error(next_state.obs, true_next)

      sel_states = jax.tree.map(lambda x: x[keep], states)
      errors = jax.vmap(one)(sel_states, actions[keep], next_obs_true[keep])
      return jnp.sum(errors)

  return loss_fn


def env_params_tuning(
    init_env,
    num_steps: int,
    init_env_params,
    env_params_min,
    env_params_max,
    obs: Any,
    actions: Any,
    next_obs_true: Any,
    log_path: Optional[str] = None,
    param_setter: Callable = default_param_setter,
    learning_rate: float = 0.005,
    error_weights: Optional[jnp.ndarray] = None,
    progress_every: int = 1,
    rollout_horizon: int = 1,
    per_dim_error: bool = False,
    estimate_init_qvel: bool = False,
):
  """Tune physics parameters to match observed transitions.

  Returns (tuned_params, train_log) like rsr_pipeline.py:49-206.

  The defaults reproduce the reference objective exactly: one-step
  prediction, scalar ``|w · err|`` projection (rsr_pipeline.py:119-123).
  Two default-off upgrades address its observability limits:

  - ``rollout_horizon=k`` (k > 1): rows of ``obs``/``actions`` are treated
    as one consecutive trajectory (which is how the deployment stack logs
    them, real_robot_interface.py:49-85) and the loss sums prediction
    error over k-step rollouts from every valid start.  Friction only
    affects the dynamics while the cube slips; a one-step horizon barely
    excites slip, while a k-step rollout compounds the parameter's effect
    k times before comparing to data.
  - ``per_dim_error=True``: loss per step is ``Σ_d |w_d · err_d|`` instead
    of ``|Σ_d w_d · err_d|`` — the scalar projection lets signed errors in
    different dimensions cancel, hiding gradient signal.
  - ``estimate_init_qvel=True``: initialize each start state's joint and
    cube velocities from the finite difference of consecutive obs rows
    (``(obs_{i+1} − obs_i) / ctrl_dt``).  The 23-dim obs carries no
    velocities, and the reference's state reconstruction (rsr_pipeline.py:
    75-98) starts every transition from near-zero qvel — harmless for its
    one-step objective, but a k-step rollout from a wrongly-at-rest cube
    compounds the initialization error k times, drowning the friction
    signal (measured: the k=8 loss *decreases* as friction → 0.33 with
    at-rest starts, while the true value is 0.9).
  """
  obs = jnp.asarray(obs)
  actions = jnp.asarray(actions)
  next_obs_true = jnp.asarray(next_obs_true)
  # strong-type the optimized params: a weak-typed python-scalar init
  # (jnp.asarray(0.4)) changes aval after the first optax update and
  # silently recompiles update_step a second time (~3 min of the demo's
  # wall-clock before this fix)
  init_env_params = jax.tree.map(
      lambda p: jnp.asarray(p, dtype=jnp.float32), init_env_params
  )
  env_params_min = jax.tree.map(
      lambda p: jnp.asarray(p, dtype=jnp.float32), env_params_min
  )
  env_params_max = jax.tree.map(
      lambda p: jnp.asarray(p, dtype=jnp.float32), env_params_max
  )
  if error_weights is None:
    # hand-tuned 23-dim weights of the reference (rsr_pipeline.py:120)
    error_weights = jnp.array(
        [1, 1, 1, 1, 1, 1, 10, 10, 10, 0, 0, 0, 10, 10, 10, 10, 10,
         0, 0, 0, 0, 0, 0],
        dtype=jnp.float32,
    )

  env = init_env
  m = env.model

  # ---- obs → batched sim state (rsr_pipeline.py:75-98, vectorized).
  # Template state: reset + one zero-action step, as in the reference.
  rng = jax.random.PRNGKey(0)
  state_0 = jax.jit(env.reset)(rng)
  zero_ctrl = jnp.zeros(env.action_size)
  state_1 = jax.jit(env.step)(state_0, zero_ctrl)

  joint_qadr = jnp.asarray(env._joint_qadr)
  box_qadr = env._box_qadr

  if estimate_init_qvel:
    # dof addresses for the arm joints and the cube free joint, recovered
    # from the qpos addresses the env exposes (qposadr ↔ joint id is 1:1)
    jnt_qposadr = np.asarray(m.jnt_qposadr.arr)
    jnt_dofadr = np.asarray(m.jnt_dofadr.arr)
    qadr_to_jnt = {int(q): j for j, q in enumerate(jnt_qposadr)}
    joint_dofadr = jnp.asarray(
        [jnt_dofadr[qadr_to_jnt[int(q)]] for q in np.asarray(joint_qadr)]
    )
    box_dofadr = int(jnt_dofadr[qadr_to_jnt[int(box_qadr)]])
    dt = env.dt

  def build_state(ob, ob_next):
    qpos = state_0.data.qpos
    qpos = qpos.at[joint_qadr].set(ob[0:6])
    # cube free-joint position from obs[12:15] (the reference writes this
    # via a body-id-as-qpos-index quirk, rsr_pipeline.py:87; we use the
    # correct free-joint qpos address for the same intent)
    qpos = qpos.at[box_qadr : box_qadr + 3].set(ob[12:15])
    if estimate_init_qvel:
      # clip to physical speeds (teleport-sized differences across episode
      # boundaries are additionally excluded by the validity mask below)
      v = jnp.clip((ob_next - ob) / dt, -10.0, 10.0)
      qvel = jnp.zeros_like(state_0.data.qvel)
      qvel = qvel.at[joint_dofadr].set(v[0:6])
      qvel = qvel.at[box_dofadr : box_dofadr + 3].set(v[12:15])
      data = state_1.data.replace(qpos=qpos, qvel=qvel)
    else:
      data = state_1.data.replace(qpos=qpos)
    return state_1.replace(data=data)

  states = jax.vmap(build_state)(obs, next_obs_true)

  # ---- loss: Σ_i |w · (pred_i − true_i)|  (rsr_pipeline.py:119-123 —
  # jnp.dot then norm of the resulting scalar ≡ absolute value)
  def step_with_params(params, state, action):
    model = param_setter(m, params)
    bound_env = env.__class__.__new__(env.__class__)
    bound_env.__dict__.update(env.__dict__)
    bound_env.bind_model(model)
    return bound_env.step(state, action)

  valid = None
  if estimate_init_qvel:
    # transitions that cross an episode boundary (cube re-spawned to
    # new_cube_pos after success) are un-fittable: mark them invalid so
    # no rollout window starts from or spans the teleport
    jump = np.max(
        np.abs(np.asarray(next_obs_true - obs)[:, 12:15]), axis=1
    )
    valid = jump < 0.15

  loss_fn = _make_tuning_loss(
      step_with_params, states, actions, next_obs_true, error_weights,
      rollout_horizon, per_dim_error, valid=valid,
  )

  optimizer = optax.adam(learning_rate=learning_rate)
  opt_state = optimizer.init(init_env_params)

  @jax.jit
  def update_step(opt_state, params):
    loss, grads = jax.value_and_grad(loss_fn)(params)
    # non-finite containment, same policy as the trainers' NonFiniteGuard:
    # one ill-conditioned window (deep penetration at a window start) must
    # not poison the whole fit — a NaN Adam update is irrecoverable since
    # clip() propagates NaN
    grads = jax.tree.map(
        lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)), grads
    )
    updates, opt_state = optimizer.update(grads, opt_state)
    new_params = optax.apply_updates(params, updates)
    new_params = jax.tree.map(
        lambda p, lo, hi: jnp.clip(p, lo, hi),
        new_params,
        env_params_min,
        env_params_max,
    )
    return new_params, opt_state, loss

  params = init_env_params
  train_time, train_loss, train_params = [], [], []
  for i in range(num_steps):
    t0 = time.time()
    params, opt_state, loss = update_step(opt_state, params)
    jax.block_until_ready(loss)
    dt = time.time() - t0
    train_time.append(dt)
    train_loss.append(float(loss))
    train_params.append(jax.device_get(params))
    if log_path is not None and (i % progress_every == 0):
      line = f'step {i}: {dt:.2f}s. params = {params}. loss = {loss}.'
      with open(log_path, 'a') as f:
        f.write(line + '\n')

  train_log = {
      'time_cost': train_time,
      'loss': train_loss,
      'params': train_params,
  }
  return params, train_log


# ---------------------------------------------------------------------------
# policy training facade
# ---------------------------------------------------------------------------


def build_policy_rsr_data(
    past_states: Any,
    past_actions: Any,
    past_next_states_real: Any,
    past_next_states_sim: Any,
    current_next_states_sim: Any,
    num_samples: int = 10,
    min_val: float = -3.0,
    max_val: float = 3.0,
    bandwidth: float = 0.1,
    seed: int = 0,
) -> rsr_loss.RSRData:
  """Validate the five arrays and precompute RSRData
  (rsr_pipeline.py:209-271)."""
  arrays = tuple(
      jnp.asarray(v)
      for v in (
          past_states,
          past_actions,
          past_next_states_real,
          past_next_states_sim,
          current_next_states_sim,
      )
  )
  (past_states, past_actions, past_next_states_real, past_next_states_sim,
   current_next_states_sim) = arrays

  if any(v.ndim != 2 for v in arrays):
    shapes = tuple(v.shape for v in arrays)
    raise ValueError(f'all RSR datasets must be rank 2, got {shapes}')
  sample_counts = {v.shape[0] for v in arrays}
  if len(sample_counts) != 1:
    shapes = tuple(v.shape for v in arrays)
    raise ValueError(f'RSR datasets must have equal lengths, got {shapes}')
  if next(iter(sample_counts)) == 0:
    raise ValueError('RSR datasets must not be empty')
  for name, v in (
      ('real next-state', past_next_states_real),
      ('previous sim next-state', past_next_states_sim),
      ('current sim next-state', current_next_states_sim),
  ):
    if v.shape[1] != past_states.shape[1]:
      raise ValueError(f'{name} width must match state width')

  real_data = jnp.hstack([past_states, past_actions, past_next_states_real])
  previous_sim_data = jnp.hstack(
      [past_states, past_actions, past_next_states_sim]
  )
  current_sim_data = jnp.hstack(
      [past_states, past_actions, current_next_states_sim]
  )
  return rsr_loss.build_rsr_data(
      real_data,
      previous_sim_data,
      current_sim_data,
      num_samples=num_samples,
      min_value=min_val,
      max_value=max_val,
      bandwidth=bandwidth,
      seed=seed,
  )


def policy_params_training(
    env,
    restore_checkpoint_path: Optional[str] = None,
    policy_params_fn: Optional[Callable[..., None]] = None,
    network_factory: Optional[Callable[..., Any]] = None,
    progress_fn: Optional[Callable[..., None]] = None,
    past_states: Any = None,
    past_actions: Any = None,
    past_next_states_real: Any = None,
    past_next_states_sim: Any = None,
    current_next_states_sim: Any = None,
    algorithm: str = 'ppo',
    num_samples: int = 10,
    min_val: float = -3.0,
    max_val: float = 3.0,
    bandwidth: float = 0.1,
    rsr_loss_scale: float = 1.0,
    num_timesteps: int = 5_000_000,
    num_evals: int = 10,
    reward_scaling: float = 0.1,
    episode_length: int = 1200,
    normalize_observations: bool = True,
    action_repeat: int = 1,
    discounting: float = 0.96,
    learning_rate: float = 1e-4,
    num_envs: int = 512,
    batch_size: int = 128,
    seed: int = 0,
    num_eval_envs: int = 128,
    deterministic_eval: bool = False,
    # PPO-specific
    unroll_length: int = 10,
    num_minibatches: int = 32,
    num_updates_per_batch: int = 8,
    entropy_cost: float = 2e-2,
    # SAC-specific
    tau: float = 0.005,
    min_replay_size: int = 0,
    max_replay_size: Optional[int] = None,
    grad_updates_per_step: int = 1,
    checkpoint_logdir: Optional[str] = None,
    wrap_env_fn: Optional[Callable[..., Any]] = None,
    eval_env=None,
):
  """Train an RSR policy with native PPO or SAC (rsr_pipeline.py:274-436).

  Returns (make_inference_fn, tuned_policy_params)."""
  if rsr_loss_scale < 0:
    raise ValueError(
        f'rsr_loss_scale must be non-negative, got {rsr_loss_scale}'
    )
  required = (
      past_states,
      past_actions,
      past_next_states_real,
      past_next_states_sim,
      current_next_states_sim,
  )
  if any(v is None for v in required):
    raise ValueError('all five RSR policy datasets are required')

  past_data = build_policy_rsr_data(
      past_states,
      past_actions,
      past_next_states_real,
      past_next_states_sim,
      current_next_states_sim,
      num_samples=num_samples,
      min_val=min_val,
      max_val=max_val,
      bandwidth=bandwidth,
      seed=seed,
  )
  progress_fn = progress_fn or (lambda *args: None)
  algorithm = algorithm.strip().lower()

  if algorithm == 'ppo':
    from rsr_mjx_tpu.train import networks as ppo_networks

    make_inference_fn, params, _ = rsr_ppo.train(
        environment=env,
        past_data=past_data,
        num_timesteps=num_timesteps,
        num_evals=num_evals,
        num_eval_envs=num_eval_envs,
        reward_scaling=reward_scaling,
        episode_length=episode_length,
        normalize_observations=normalize_observations,
        action_repeat=action_repeat,
        unroll_length=unroll_length,
        num_minibatches=num_minibatches,
        num_updates_per_batch=num_updates_per_batch,
        discounting=discounting,
        learning_rate=learning_rate,
        entropy_cost=entropy_cost,
        num_envs=num_envs,
        batch_size=batch_size,
        restore_checkpoint_path=restore_checkpoint_path,
        policy_params_fn=policy_params_fn or (lambda *args: None),
        network_factory=network_factory or ppo_networks.make_ppo_networks,
        progress_fn=progress_fn,
        deterministic_eval=deterministic_eval,
        rsr_loss_scale=rsr_loss_scale,
        seed=seed,
        eval_env=eval_env,
    )
    return make_inference_fn, params

  if algorithm == 'sac':
    from rsr_mjx_tpu.train import sac_networks

    if restore_checkpoint_path:
      raise ValueError(
          'SAC cannot resume complete training state; use '
          'checkpoint_logdir to save inference checkpoints instead'
      )
    make_inference_fn, params, _ = rsr_sac.train(
        environment=env,
        past_data=past_data,
        num_timesteps=num_timesteps,
        num_evals=num_evals,
        num_eval_envs=num_eval_envs,
        reward_scaling=reward_scaling,
        episode_length=episode_length,
        normalize_observations=normalize_observations,
        action_repeat=action_repeat,
        discounting=discounting,
        learning_rate=learning_rate,
        num_envs=num_envs,
        batch_size=batch_size,
        tau=tau,
        min_replay_size=min_replay_size,
        max_replay_size=max_replay_size,
        grad_updates_per_step=grad_updates_per_step,
        checkpoint_logdir=checkpoint_logdir,
        network_factory=network_factory or sac_networks.make_sac_networks,
        progress_fn=progress_fn,
        deterministic_eval=deterministic_eval,
        rsr_loss_scale=rsr_loss_scale,
        seed=seed,
        wrap_env_fn=wrap_env_fn,
        eval_env=eval_env,
    )
    return make_inference_fn, params

  raise ValueError(
      f'unsupported algorithm {algorithm!r}; expected "ppo" or "sac"'
  )
