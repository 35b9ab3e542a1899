"""RSR policy training from the six-file real/sim dataset (Airbot).

Native equivalent of test/rsr_policy_training.py: loads and validates the
dataset contract, registers the Airbot cube-push env, and runs
policy_params_training with the RSR penalty.

Usage:
  python scripts/rsr_policy_training.py --data_dir data/ --algorithm sac
"""

from __future__ import annotations

import functools
import os

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from absl import app, flags, logging

FLAGS = flags.FLAGS

flags.DEFINE_string('data_dir', 'data', 'Directory with the six files.')
flags.DEFINE_enum('algorithm', 'sac', ['ppo', 'sac'], 'RL algorithm.')
flags.DEFINE_string('env', 'AirbotCubePush', 'Registered env name.')
flags.DEFINE_integer('max_transitions', 50, 'Transition cap (reference: 50).')
flags.DEFINE_integer('num_timesteps', 500_000, 'Training steps.')
flags.DEFINE_integer('num_evals', 10, 'Evaluations.')
flags.DEFINE_integer('num_envs', 512, 'Parallel envs.')
flags.DEFINE_integer('batch_size', 128, 'Batch size.')
flags.DEFINE_integer('min_replay_size', 10_000, 'SAC replay min.')
flags.DEFINE_integer('max_replay_size', 200_000, 'SAC replay max.')
flags.DEFINE_float('rsr_loss_scale', 1.0, 'RSR penalty scale.')
flags.DEFINE_string('logdir', 'logs/rsr', 'Output directory.')
flags.DEFINE_string('restore_checkpoint_path', None, 'PPO restore path.')
flags.DEFINE_integer('seed', 0, 'Random seed.')


def main(argv):
  del argv
  from rsr_mjx_tpu import envs
  from rsr_mjx_tpu.rsr import datasets, pipeline
  from rsr_mjx_tpu.train import checkpoint
  from rsr_mjx_tpu.train import networks as ppo_networks
  from rsr_mjx_tpu.train import sac_networks

  (
      past_states,
      past_actions,
      past_next_states_real,
      past_next_states_sim,
      current_next_states_sim,
  ) = datasets.load_rsr_datasets(FLAGS.data_dir, FLAGS.max_transitions)
  logging.info(
      'RSR dataset: %d transitions, obs %d, act %d',
      past_states.shape[0],
      past_states.shape[1],
      past_actions.shape[1],
  )

  env = envs.load(FLAGS.env)
  eval_env = None
  if not isinstance(env.observation_size, int):
    # dict-obs envs (Go2): feed the policy the 'state' key
    # (reference: test/rsr_go2_policy_training.py:195-201)
    from rsr_mjx_tpu.envs import wrappers

    env = wrappers.SelectObservationWrapper(env, 'state')
    eval_env = wrappers.SelectObservationWrapper(
        envs.load(FLAGS.env), 'state'
    )
  os.makedirs(FLAGS.logdir, exist_ok=True)
  ckpt_dir = os.path.join(FLAGS.logdir, 'checkpoints')
  os.makedirs(ckpt_dir, exist_ok=True)

  progress_rows = []
  progress_path = os.path.join(FLAGS.logdir, 'progress.json')

  def progress_fn(step, metrics):
    logging.info(
        'step=%d reward=%.3f sim2real=%.5f',
        step,
        metrics.get('eval/episode_reward', float('nan')),
        metrics.get('training/sim2real_loss', float('nan')),
    )
    progress_rows.append(
        {'step': int(step),
         **{k: float(v) for k, v in metrics.items()
            if isinstance(v, (int, float))}}
    )
    import json

    with open(progress_path, 'w') as f:
      json.dump(progress_rows, f, indent=1)

  def policy_params_fn(step, make_policy, params):
    checkpoint.save(os.path.join(ckpt_dir, f'{step}'), params)

  # network factories mirror rsr_policy_training.py:260-270
  if FLAGS.algorithm == 'ppo':
    network_factory = functools.partial(
        ppo_networks.make_ppo_networks,
        policy_hidden_layer_sizes=(32, 32, 32, 32),
        value_hidden_layer_sizes=(32, 32, 32, 32),
    )
  else:
    network_factory = functools.partial(
        sac_networks.make_sac_networks,
        hidden_layer_sizes=(32, 32, 32, 32),
    )

  make_inference_fn, params = pipeline.policy_params_training(
      env=env,
      algorithm=FLAGS.algorithm,
      past_states=past_states,
      past_actions=past_actions,
      past_next_states_real=past_next_states_real,
      past_next_states_sim=past_next_states_sim,
      current_next_states_sim=current_next_states_sim,
      rsr_loss_scale=FLAGS.rsr_loss_scale,
      num_timesteps=FLAGS.num_timesteps,
      num_evals=FLAGS.num_evals,
      num_envs=FLAGS.num_envs,
      batch_size=FLAGS.batch_size,
      min_replay_size=FLAGS.min_replay_size,
      max_replay_size=FLAGS.max_replay_size,
      network_factory=network_factory,
      progress_fn=progress_fn,
      policy_params_fn=(
          policy_params_fn if FLAGS.algorithm == 'ppo' else None
      ),
      checkpoint_logdir=(
          os.path.join(ckpt_dir, 'run')
          if FLAGS.algorithm == 'sac'
          else None
      ),
      restore_checkpoint_path=FLAGS.restore_checkpoint_path,
      eval_env=eval_env,
      seed=FLAGS.seed,
  )

  from rsr_mjx_tpu.train import sac as sac_train

  sac_train.save_params(
      os.path.join(FLAGS.logdir, 'final_params.pkl'), params
  )
  logging.info('done; params in %s', FLAGS.logdir)


if __name__ == '__main__':
  app.run(main)
