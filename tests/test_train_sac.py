"""SAC trainer tests: replay buffer units + multi-device smoke training."""

import jax
import jax.numpy as jnp
import numpy as np

from rsr_mjx_tpu.train import replay_buffer, sac
from tests.test_train_ppo import PointMass


def test_replay_buffer_ring_and_sample():
  dummy = {'a': jnp.zeros(3), 'r': jnp.zeros(())}
  state = replay_buffer.init(8, dummy, jax.random.PRNGKey(0))
  batch = {'a': jnp.arange(12.0).reshape(4, 3), 'r': jnp.arange(4.0)}
  state = replay_buffer.insert(state, batch)
  assert int(state.size) == 4 and int(state.insert_position) == 4
  state = replay_buffer.insert(state, batch)
  state = replay_buffer.insert(state, batch)  # wraps
  assert int(state.size) == 8 and int(state.insert_position) == 4
  state, sample = replay_buffer.sample(state, 16)
  assert sample['a'].shape == (16, 3)
  # sampled rewards come from inserted values
  assert set(np.asarray(sample['r']).tolist()) <= {0.0, 1.0, 2.0, 3.0}


def test_sac_smoke_multidevice():
  assert jax.device_count() == 8
  env = PointMass()
  progress = []
  make_policy, params, metrics = sac.train(
      env,
      num_timesteps=16_384,
      episode_length=16,
      num_envs=32,
      num_eval_envs=16,
      learning_rate=3e-3,
      discounting=0.95,
      batch_size=64,
      num_evals=3,
      normalize_observations=True,
      min_replay_size=512,
      max_replay_size=8192,
      grad_updates_per_step=1,
      seed=0,
      progress_fn=lambda step, m: progress.append((step, m)),
  )
  assert metrics['training/sps'] > 0
  first = progress[0][1]['eval/episode_reward']
  last = progress[-1][1]['eval/episode_reward']
  assert last > first, (first, last)

  policy = make_policy(params, deterministic=True)
  act, _ = jax.jit(policy)(jnp.array([0.5, -0.5]), jax.random.PRNGKey(0))
  assert act.shape == (2,)
  assert float(act[0]) < 0 and float(act[1]) > 0


def test_sac_checkpoint_pkl(tmp_path):
  env = PointMass()
  prefix = str(tmp_path / 'run')
  _, params, _ = sac.train(
      env,
      num_timesteps=2048,
      episode_length=8,
      num_envs=16,
      num_eval_envs=8,
      batch_size=32,
      num_evals=2,
      min_replay_size=128,
      max_replay_size=1024,
      checkpoint_logdir=prefix,
      seed=1,
  )
  import glob

  ckpts = glob.glob(prefix + '_sac_*.pkl')
  assert ckpts, 'expected <prefix>_sac_<step>.pkl checkpoints'
  loaded = sac.load_params(ckpts[0])
  assert len(loaded) == 2
