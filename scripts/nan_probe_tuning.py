"""Localize the NaN in the env_params_tuning backward pass when start
states carry estimated velocities (k=1 repro on CPU).

Variants zero selected velocity components by copying obs columns into the
next-obs row used for the finite difference (the fitting target's value is
irrelevant for gradient finiteness).

Usage: python scripts/nan_probe_tuning.py [full|nocube|nojoint|none]
"""

import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.jax_compile_cache'))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
  variant = sys.argv[1] if len(sys.argv) > 1 else 'full'
  from rsr_mjx_tpu import envs
  from rsr_mjx_tpu.rsr import datasets, pipeline

  obs = np.asarray(datasets.txt_to_2d_array('data_rsr_demo/real_obs.txt'))
  act = np.asarray(datasets.txt_to_2d_array('data_rsr_demo/real_action.txt'))
  i = 26  # max-slip transition of the demo segment
  ob = obs[i : i + 1].copy()
  ob_next = obs[i + 1 : i + 2].copy()
  if variant == 'nocube':
    ob_next[:, 12:15] = ob[:, 12:15]
  elif variant == 'nojoint':
    ob_next[:, 0:6] = ob[:, 0:6]
  elif variant == 'none':
    ob_next[:] = ob

  env = envs.load('AirbotCubePush')
  tuned, log = pipeline.env_params_tuning(
      env,
      num_steps=1,
      init_env_params=jnp.asarray(0.4),
      env_params_min=jnp.asarray(0.1),
      env_params_max=jnp.asarray(4.0),
      obs=ob,
      actions=act[i : i + 1],
      next_obs_true=ob_next,
      estimate_init_qvel=True,
  )
  print(variant, 'tuned=', float(np.asarray(tuned)),
        'loss=', log['loss'][-1],
        'moved=', abs(float(np.asarray(tuned)) - 0.4) > 1e-9)


if __name__ == '__main__':
  main()
