"""Scaling benchmark: env-steps/s across a device mesh.

Measures the rollout hot loop (vectorized cube-push stepping) sharded over
Mesh(('data',)) at the requested device counts — the BASELINE.md scaling
report (1 chip / 1 host / N hosts).  On a CPU host run with
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
to validate the multi-chip path without hardware; under
``--multihost`` it calls jax.distributed.initialize() first.

Prints one JSON line per mesh size.
"""

from __future__ import annotations

import json
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string('env', 'AirbotCubePush', 'Registered env name.')
flags.DEFINE_integer('envs_per_device', 1024, 'Envs per chip.')
flags.DEFINE_integer('steps', 50, 'Control steps per measured scan.')
flags.DEFINE_integer('reps', 3, 'Timed repetitions.')
flags.DEFINE_list('device_counts', None,
                  'Mesh sizes to sweep (default: 1 and all).')
flags.DEFINE_boolean('multihost', False, 'jax.distributed.initialize().')
flags.DEFINE_string('coordinator', None,
                    'host:port for jax.distributed (spoofed multi-host).')
flags.DEFINE_integer('num_processes', None, 'Process count (with '
                     '--coordinator).')
flags.DEFINE_integer('process_id', None, 'This rank (with --coordinator).')
flags.DEFINE_boolean(
    'spawn_two_process', False,
    'Orchestrate a 2-process spoofed CPU cluster (4 devices each, '
    'the tests/test_multihost_spoof.py machinery) and run the sweep '
    'over the global 8-device mesh.')


def _spawn_two_process():
  """Relaunch this script twice as a spoofed jax.distributed cluster."""
  import socket
  import subprocess
  import sys as _sys

  with socket.socket() as s:
    s.bind(('localhost', 0))
    port = str(s.getsockname()[1])
  env = dict(os.environ)
  env['JAX_PLATFORMS'] = 'cpu'
  env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
  base = [
      _sys.executable, os.path.abspath(__file__),
      f'--env={FLAGS.env}',
      f'--envs_per_device={FLAGS.envs_per_device}',
      f'--steps={FLAGS.steps}',
      f'--reps={FLAGS.reps}',
      '--device_counts=8',
      f'--coordinator=localhost:{port}',
      '--num_processes=2',
  ]
  procs = [
      subprocess.Popen(
          base + [f'--process_id={pid}'],
          stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
      )
      for pid in (0, 1)
  ]
  outs = [p.communicate()[0].decode(errors='replace') for p in procs]
  for pid, (p, out) in enumerate(zip(procs, outs)):
    if p.returncode != 0:
      raise RuntimeError(f'rank {pid} failed:\n{out[-3000:]}')
  # rank 0 prints the global result lines
  for line in outs[0].splitlines():
    if line.startswith('{'):
      print(line, flush=True)


def main(argv):
  del argv
  if FLAGS.spawn_two_process:
    _spawn_two_process()
    return
  if FLAGS.coordinator is not None:
    import jax

    jax.distributed.initialize(
        coordinator_address=FLAGS.coordinator,
        num_processes=FLAGS.num_processes,
        process_id=FLAGS.process_id,
    )
  elif FLAGS.multihost:
    import jax

    jax.distributed.initialize()
  import jax
  import jax.numpy as jnp
  import numpy as np
  from jax import shard_map
  from jax.sharding import Mesh, PartitionSpec as P

  from rsr_mjx_tpu import envs
  from rsr_mjx_tpu.envs import wrappers

  env_core = envs.load(FLAGS.env)
  act_dim = env_core.action_size
  env = wrappers.wrap_for_training(env_core, episode_length=1200)

  all_devices = jax.devices()
  counts = (
      [int(c) for c in FLAGS.device_counts]
      if FLAGS.device_counts
      else sorted({1, len(all_devices)})
  )

  process_count = jax.process_count()
  for n_dev in counts:
    devices = all_devices[:n_dev]
    mesh = Mesh(np.array(devices), ('data',))
    num_envs = FLAGS.envs_per_device * n_dev

    def rollout_block(keys):
      state = env.reset(keys)

      def body(state, _):
        act = jnp.zeros((keys.shape[0], act_dim))
        return env.step(state, act), ()

      state, _ = jax.lax.scan(body, state, (), length=FLAGS.steps)
      return state.reward

    fn = jax.jit(
        shard_map(
            rollout_block,
            mesh=mesh,
            in_specs=P('data'),
            out_specs=P('data'),
            check_vma=False,
        )
    )
    # per-process key rows (ppo.train:329 pattern); global batch = num_envs
    keys = jax.random.split(jax.random.PRNGKey(0), num_envs // process_count)
    out = fn(keys)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(FLAGS.reps):
      out = fn(keys)
    jax.block_until_ready(out)
    dt = time.time() - t0
    sps = FLAGS.steps * num_envs * FLAGS.reps / dt
    print(
        json.dumps({
            'metric': f'{FLAGS.env}_env_steps_per_s',
            'devices': n_dev,
            'processes': process_count,
            'num_envs': num_envs,
            'value': round(sps, 1),
            'unit': 'env-steps/s',
        }),
        flush=True,
    )


if __name__ == '__main__':
  app.run(main)
