"""Physics-parameter tuning from real trajectories (Airbot friction).

Native equivalent of test/rsr_env_params_tuning.py: loads real obs/action
text tables, samples consecutive transitions, and runs Adam on the cube
friction parameter through the differentiable physics step.

Usage:
  python scripts/rsr_env_params_tuning.py --obs real_obs.txt \
      --actions real_action.txt --num_steps 1000
"""

from __future__ import annotations

import json
import os

import numpy as np
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from absl import app, flags, logging

FLAGS = flags.FLAGS

flags.DEFINE_string('obs', 'real_obs.txt', 'Real observation table.')
flags.DEFINE_string('actions', 'real_action.txt', 'Real action table.')
flags.DEFINE_string('env', 'AirbotCubePush', 'Registered env name.')
flags.DEFINE_integer('num_transitions', 15,
                     'Consecutive transitions to fit (reference: 15).')
flags.DEFINE_integer('start', 0, 'First transition index.')
flags.DEFINE_integer('num_steps', 1000, 'Adam steps (reference: 1000).')
flags.DEFINE_float('init_friction', 0.4, 'Initial friction value.')
flags.DEFINE_float('min_scale', 0.2, 'Lower bound scale (min = init*scale).')
flags.DEFINE_float('max_scale', 10.0, 'Upper bound scale.')
flags.DEFINE_string('log_path', 'log.txt', 'Per-step log file.')
flags.DEFINE_string('out', 'tuned_params.json', 'Result file.')
flags.DEFINE_integer(
    'rollout_horizon', 1,
    'k-step rollout loss (1 = reference one-step objective). k>1 compounds '
    "the parameter's effect through k chained steps, exciting slip-dependent "
    'friction signal a one-step loss barely sees.')
flags.DEFINE_bool(
    'per_dim_error', False,
    'Per-dimension |w_d err_d| error instead of the reference scalar '
    '|w . err| projection (which lets signed errors cancel).')
flags.DEFINE_bool(
    'estimate_init_qvel', False,
    'Initialize start-state joint/cube velocities by finite-differencing '
    'consecutive obs rows (the obs has no velocities; at-rest starts drown '
    'the k-step friction signal in initialization error).')
flags.DEFINE_float('lr', 0.005, 'Adam learning rate (reference: 0.005).')


def main(argv):
  del argv
  import jax.numpy as jnp

  from rsr_mjx_tpu import envs
  from rsr_mjx_tpu.rsr import datasets, pipeline

  obs = datasets.txt_to_2d_array(FLAGS.obs)
  actions = datasets.txt_to_2d_array(FLAGS.actions)
  n = FLAGS.num_transitions
  s = FLAGS.start
  if len(obs) < s + n + 1 or len(actions) < s + n:
    raise ValueError(
        f'need {s + n + 1} obs rows and {s + n} action rows, have '
        f'{len(obs)}/{len(actions)}'
    )
  obs_in = jnp.asarray(obs[s : s + n])
  next_obs = jnp.asarray(obs[s + 1 : s + n + 1])
  act_in = jnp.asarray(actions[s : s + n])

  env = envs.load(FLAGS.env)
  init = jnp.asarray(FLAGS.init_friction)
  tuned, train_log = pipeline.env_params_tuning(
      env,
      num_steps=FLAGS.num_steps,
      init_env_params=init,
      env_params_min=init * FLAGS.min_scale,
      env_params_max=init * FLAGS.max_scale,
      obs=obs_in,
      actions=act_in,
      next_obs_true=next_obs,
      log_path=FLAGS.log_path,
      learning_rate=FLAGS.lr,
      rollout_horizon=FLAGS.rollout_horizon,
      per_dim_error=FLAGS.per_dim_error,
      estimate_init_qvel=FLAGS.estimate_init_qvel,
  )
  result = {
      'tuned_friction': float(np.asarray(tuned)),
      'final_loss': train_log['loss'][-1],
      'num_steps': FLAGS.num_steps,
      'rollout_horizon': FLAGS.rollout_horizon,
      'per_dim_error': FLAGS.per_dim_error,
      'estimate_init_qvel': FLAGS.estimate_init_qvel,
  }
  with open(FLAGS.out, 'w') as f:
    json.dump(result, f, indent=1)
  logging.info('tuned friction: %s', result)


if __name__ == '__main__':
  app.run(main)
