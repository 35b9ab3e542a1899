"""Generate a demonstration RSR dataset from the trained cube-push policy.

The RSR workflow's Step-1 data normally comes from the real robot
(reference real_robot_interface.py:49-85 appends /real_obs.txt and
/real_action.txt rows during deployment).  Without hardware, this script
produces the same six-file contract from a surrogate "real world": the
simulator with a perturbed cube friction (the exact parameter
env_params_tuning fits), rolled under the trained deterministic policy.

Outputs into --out_dir:
  real_obs.txt / real_action.txt            ("real" = friction-perturbed)
  past_sim_obs.txt / current_sim_obs.txt    (nominal sim)
  obs.txt / actions.txt                     (online sim data)

Then:
  python scripts/rsr_env_params_tuning.py --obs <dir>/real_obs.txt \
      --actions <dir>/real_action.txt ...   # recovers the true friction
  python scripts/rsr_policy_training.py --data_dir <dir> --algorithm ppo
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string('params', 'logs/cube_ppo_15M_r4/final_params.pkl',
                    'Trained PPO checkpoint (pkl).')
flags.DEFINE_string('out_dir', 'data_rsr_demo', 'Output directory.')
flags.DEFINE_float('real_friction', 0.9,
                   'Surrogate-real cube friction (nominal rsr scene: 1.22).')
flags.DEFINE_integer('n', 50, 'Transitions per table (reference cap: 50).')
flags.DEFINE_integer('seed', 0, 'Rollout seed.')


def main(argv):
  del argv
  import jax
  import jax.numpy as jnp
  import numpy as np

  from rsr_mjx_tpu import envs
  from rsr_mjx_tpu.rsr import pipeline
  from rsr_mjx_tpu.train import configs, ppo, running_statistics, sac
  from rsr_mjx_tpu.train import networks as ppo_networks

  params = sac.load_params(FLAGS.params)
  env = envs.load('AirbotCubePush')
  cfg = configs.ppo_config('AirbotCubePushTrain')
  nf = cfg.network_factory
  network = ppo_networks.make_ppo_networks(
      env.observation_size, env.action_size,
      policy_hidden_layer_sizes=tuple(nf.policy_hidden_layer_sizes),
      value_hidden_layer_sizes=tuple(nf.value_hidden_layer_sizes),
  )
  make_policy = ppo._make_policy_factory(
      network, running_statistics.normalize
  )
  policy = make_policy(params, deterministic=True)

  def rollout(env, n, seed):
    state = jax.jit(env.reset)(jax.random.PRNGKey(seed))
    step = jax.jit(env.step)
    obs_rows, act_rows = [np.asarray(state.obs)], []
    rng = jax.random.PRNGKey(seed + 1)
    for _ in range(n):
      rng, sub = jax.random.split(rng)
      action, _ = policy(state.obs, sub)
      state = step(state, action)
      act_rows.append(np.asarray(action))
      obs_rows.append(np.asarray(state.obs))
    return np.stack(obs_rows), np.stack(act_rows)

  # "real world": perturbed cube friction via the tuning param setter
  real_env = envs.load('AirbotCubePush')
  real_env.bind_model(
      pipeline.default_param_setter(
          real_env.model, jnp.asarray(FLAGS.real_friction, jnp.float32)
      )
  )

  os.makedirs(FLAGS.out_dir, exist_ok=True)
  w = lambda name, arr: np.savetxt(
      os.path.join(FLAGS.out_dir, name), arr, delimiter=','
  )

  real_obs, real_act = rollout(real_env, FLAGS.n, FLAGS.seed)
  w('real_obs.txt', real_obs)
  w('real_action.txt', real_act)

  past_obs, past_act = rollout(env, FLAGS.n, FLAGS.seed)
  w('past_sim_obs.txt', past_obs)
  cur_obs, _ = rollout(env, FLAGS.n, FLAGS.seed + 100)
  w('current_sim_obs.txt', cur_obs)
  on_obs, on_act = rollout(env, FLAGS.n, FLAGS.seed + 200)
  w('obs.txt', on_obs)
  w('actions.txt', on_act)
  print(f'wrote six-file RSR dataset ({FLAGS.n} transitions) to '
        f'{FLAGS.out_dir}; real friction = {FLAGS.real_friction} '
        f'(nominal 1.22)')


if __name__ == '__main__':
  app.run(main)
