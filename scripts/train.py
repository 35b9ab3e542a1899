"""Unified training CLI for all registered environments.

Replaces the reference's four entry scripts (airbot_training/train.py,
train_sac.py, go2 learning/train_jax_ppo.py, train_jax_sac.py) with one
absl-flags runner over the env registry and the tuned config tables
(train/configs.py); flags explicitly set on the command line override the
tuned defaults (the reference's flag-`present` pattern,
train_jax_ppo.py:126-173).

Examples:
  python scripts/train.py --env AirbotCubePushTrain --algorithm ppo
  python scripts/train.py --env Go2JoystickFlatTerrain --algorithm sac \
      --num_timesteps 1000000 --logdir logs/go2
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from absl import app, flags, logging

FLAGS = flags.FLAGS

flags.DEFINE_string('env', 'AirbotCubePushTrain', 'Registered env name.')
flags.DEFINE_enum('algorithm', 'ppo', ['ppo', 'sac'], 'RL algorithm.')
flags.DEFINE_string('logdir', None, 'Output directory (default: logs/<run>).')
flags.DEFINE_string('restore_checkpoint_path', None, 'PPO Orbax restore path.')
flags.DEFINE_boolean('domain_randomization', False, 'Enable the env DR.')
flags.DEFINE_integer('seed', 0, 'Random seed.')
flags.DEFINE_integer('num_timesteps', None, 'Override tuned value.')
flags.DEFINE_integer('num_envs', None, 'Override tuned value.')
flags.DEFINE_integer('num_evals', None, 'Override tuned value.')
flags.DEFINE_integer('batch_size', None, 'Override tuned value.')
flags.DEFINE_integer('episode_length', None, 'Override tuned value.')
flags.DEFINE_float('learning_rate', None, 'Override tuned value.')
flags.DEFINE_integer('num_eval_envs', None, 'Override tuned value.')
flags.DEFINE_integer('unroll_length', None, 'Override tuned value (PPO).')
flags.DEFINE_integer('num_minibatches', None, 'Override tuned value (PPO).')
flags.DEFINE_integer('grad_updates_per_step', None,
                     'Override tuned value (SAC).')
flags.DEFINE_integer('min_replay_size', None, 'Override tuned value (SAC).')
flags.DEFINE_integer('max_replay_size', None, 'Override tuned value (SAC).')
flags.DEFINE_float('discounting', None, 'Override tuned value.')
flags.DEFINE_integer('num_updates_per_batch', None,
                     'Override tuned value (PPO).')
flags.DEFINE_boolean('multihost', False,
                     'Call jax.distributed.initialize() before training.')
flags.DEFINE_boolean('render', False,
                     'Post-training deterministic rollout rendered to mp4 '
                     '(reference train.py:94-117).')
flags.DEFINE_integer('render_steps', 300, 'Rollout length for --render.')
flags.DEFINE_boolean('use_wandb', False,
                     'Log metrics to Weights & Biases if installed '
                     '(reference train_jax_ppo.py:52-59,189-194).')
flags.DEFINE_boolean('use_tb', False,
                     'Log metrics to TensorBoard via tensorboardX if '
                     'installed (reference train_jax_ppo.py:265-273).')


def main(argv):
  del argv
  if FLAGS.multihost:
    import jax

    jax.distributed.initialize()

  import jax

  from rsr_mjx_tpu import envs
  from rsr_mjx_tpu.train import checkpoint, configs
  from rsr_mjx_tpu.train import networks as ppo_networks
  from rsr_mjx_tpu.train import ppo, sac, sac_networks

  env_name = FLAGS.env
  algo = FLAGS.algorithm
  env = envs.load(env_name)
  eval_env = envs.load(env_name)

  cfg = (configs.ppo_config if algo == 'ppo' else configs.sac_config)(
      env_name
  )
  for key in (
      'num_timesteps',
      'num_envs',
      'num_evals',
      'batch_size',
      'episode_length',
      'learning_rate',
      'num_eval_envs',
      'unroll_length',
      'num_minibatches',
      'num_updates_per_batch',
      'grad_updates_per_step',
      'min_replay_size',
      'max_replay_size',
      'discounting',
  ):
    if getattr(FLAGS, key) is not None and key in cfg:
      cfg[key] = getattr(FLAGS, key)

  logdir = FLAGS.logdir or os.path.join(
      'logs', f'{env_name}-{algo}-{time.strftime("%Y%m%d-%H%M%S")}'
  )
  os.makedirs(logdir, exist_ok=True)
  ckpt_dir = os.path.join(logdir, 'checkpoints')
  os.makedirs(ckpt_dir, exist_ok=True)
  history = []

  # optional experiment-logging sinks, degrading gracefully when the
  # packages are absent (reference train_jax_ppo.py:52-59)
  wandb_run = None
  if FLAGS.use_wandb:
    try:
      import wandb

      wandb_run = wandb.init(
          project='rsr_mjx_tpu', name=os.path.basename(logdir),
          config=dict(cfg, env=env_name, algorithm=algo),
      )
    except ImportError:
      logging.warning('wandb not installed; skipping --use_wandb')
  tb_writer = None
  if FLAGS.use_tb:
    try:
      from tensorboardX import SummaryWriter

      tb_writer = SummaryWriter(os.path.join(logdir, 'tb'))
    except ImportError:
      logging.warning('tensorboardX not installed; skipping --use_tb')

  def progress_fn(step, metrics):
    logging.info(
        'step=%d reward=%.3f sps=%.0f',
        step,
        metrics.get('eval/episode_reward', float('nan')),
        metrics.get('training/sps', 0.0),
    )
    history.append({'step': step, **{k: float(v) for k, v in
                                     metrics.items()}})
    with open(os.path.join(logdir, 'progress.json'), 'w') as f:
      json.dump(history, f, indent=1)
    if wandb_run is not None:
      wandb_run.log({k: float(v) for k, v in metrics.items()}, step=step)
    if tb_writer is not None:
      for k, v in metrics.items():
        tb_writer.add_scalar(k, float(v), step)
    _plot_progress(history, logdir)


  def _plot_progress(history, logdir):
    """Reward-vs-steps error-bar curve (reference train.py:57-79)."""
    rows = [h for h in history if 'eval/episode_reward' in h]
    if len(rows) < 2:
      return
    try:
      import matplotlib

      matplotlib.use('Agg')
      import matplotlib.pyplot as plt
    except ImportError:
      return
    xs = [h['step'] for h in rows]
    ys = [h['eval/episode_reward'] for h in rows]
    err = [h.get('eval/episode_reward_std', 0.0) for h in rows]
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.errorbar(xs, ys, yerr=err, capsize=2)
    ax.set_xlabel('environment steps')
    ax.set_ylabel('eval/episode_reward')
    ax.set_title(f'{env_name} ({algo})')
    fig.tight_layout()
    fig.savefig(os.path.join(logdir, 'progress.png'), dpi=110)
    plt.close(fig)

  randomization_fn = None
  if FLAGS.domain_randomization:
    randomization_fn = envs.get_domain_randomizer(env_name)

  nf_cfg = dict(cfg.network_factory)
  policy_obs_key = nf_cfg.pop('policy_obs_key', 'state')
  value_obs_key = nf_cfg.pop('value_obs_key', 'state')

  if algo == 'ppo':
    network_factory = functools.partial(
        ppo_networks.make_ppo_networks,
        policy_obs_key=policy_obs_key,
        value_obs_key=value_obs_key,
        **{k: tuple(v) for k, v in nf_cfg.items()},
    )

    def policy_params_fn(step, make_policy, params):
      path = os.path.join(ckpt_dir, f'{step}')
      checkpoint.save(path, params)

    train_kwargs = dict(cfg)
    train_kwargs.pop('network_factory')
    make_policy, params, metrics = ppo.train(
        environment=env,
        eval_env=eval_env,
        network_factory=network_factory,
        progress_fn=progress_fn,
        policy_params_fn=policy_params_fn,
        randomization_fn=randomization_fn,
        restore_checkpoint_path=FLAGS.restore_checkpoint_path,
        seed=FLAGS.seed,
        **train_kwargs,
    )
  else:
    from rsr_mjx_tpu.envs import wrappers

    if not isinstance(env.observation_size, int):
      env = wrappers.SelectObservationWrapper(
          env, cfg.get('policy_obs_key', 'state')
      )
      eval_env = wrappers.SelectObservationWrapper(
          eval_env, cfg.get('policy_obs_key', 'state')
      )
    network_factory = functools.partial(
        sac_networks.make_sac_networks,
        **{k: tuple(v) for k, v in nf_cfg.items()},
    )
    train_kwargs = dict(cfg)
    train_kwargs.pop('network_factory')
    train_kwargs.pop('policy_obs_key', None)
    make_policy, params, metrics = sac.train(
        environment=env,
        eval_env=eval_env,
        network_factory=network_factory,
        progress_fn=progress_fn,
        checkpoint_logdir=os.path.join(ckpt_dir, 'run'),
        randomization_fn=randomization_fn,
        seed=FLAGS.seed,
        **train_kwargs,
    )

  final_path = os.path.join(logdir, 'final_params.pkl')
  sac.save_params(final_path, params)
  logging.info('training done; final params at %s', final_path)
  logging.info('final metrics: %s', metrics)

  if wandb_run is not None:
    wandb_run.finish()
  if tb_writer is not None:
    tb_writer.close()

  if FLAGS.render:
    # deterministic rollout → mp4 (reference train.py:94-117)
    from rsr_mjx_tpu.utils import rendering

    video_env = envs.load(env_name)
    if algo != 'ppo' and not isinstance(video_env.observation_size, int):
      # SAC trained on the selected obs key; the rendered rollout must
      # feed the policy the same flat obs (ADVICE r3)
      from rsr_mjx_tpu.envs import wrappers as _wrappers

      video_env = _wrappers.SelectObservationWrapper(
          video_env, cfg.get('policy_obs_key', 'state')
      )
    policy = make_policy(params, deterministic=True)
    frames = rendering.render_env_rollout(
        video_env, policy, n_steps=FLAGS.render_steps, seed=FLAGS.seed
    )
    video_path = rendering.save_video(
        frames, os.path.join(logdir, 'rollout.mp4'),
        fps=1.0 / video_env.dt,
    )
    logging.info('rollout video at %s', video_path)


if __name__ == '__main__':
  app.run(main)
