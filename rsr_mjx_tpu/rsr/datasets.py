"""Six-file RSR dataset contract: loading + validation.

The RSR policy-training workflow consumes six text tables
(reference contract: test/rsr_policy_training.py:50-57, README.md:114-123):

  real_obs.txt         real-robot observation rows (N+1, obs_dim)
  real_action.txt      real-robot action rows       (N,   act_dim)
  past_sim_obs.txt     sim rollout under the PREVIOUS physics params
  current_sim_obs.txt  sim rollout under the CURRENT (tuned) params
  obs.txt              on-policy sim observations (width check only)
  actions.txt          on-policy sim actions      (width check only)

Validation mirrors the reference exactly: existence, row counts
≥ transitions(+1), and equal feature widths
(rsr_policy_training.py:70-146, :175-192).
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

REQUIRED_DATA_FILES = (
    'real_obs.txt',
    'real_action.txt',
    'past_sim_obs.txt',
    'current_sim_obs.txt',
    'obs.txt',
    'actions.txt',
)


def _require_data_file(data_dir: str, filename: str) -> str:
  path = os.path.join(data_dir, filename)
  if not os.path.isfile(path):
    raise FileNotFoundError(
        f'Required dataset file not found: {path}. '
        f'Expected files: {", ".join(REQUIRED_DATA_FILES)}'
    )
  return path


def _load_numeric_table(path: str) -> np.ndarray:
  data = np.loadtxt(path, delimiter=',')
  if data.ndim == 1:
    data = data.reshape(1, -1)
  if data.size == 0:
    raise ValueError(f'{os.path.basename(path)} is empty.')
  return data


def _load_transition_triplet(obs_path: str, action_path: str,
                             max_transitions: int):
  """(s_t, a_t, s_{t+1}) with a shared transition count."""
  observations = _load_numeric_table(obs_path)
  actions = _load_numeric_table(action_path)
  transition_count = min(
      len(observations) - 1, len(actions), max_transitions
  )
  if transition_count <= 0:
    raise ValueError(
        f'Not enough aligned transitions in {os.path.basename(obs_path)} '
        f'and {os.path.basename(action_path)}. Need at least 2 '
        'observations and 1 action.'
    )
  states = jnp.array(observations[:transition_count])
  action_seq = jnp.array(actions[:transition_count])
  next_states = jnp.array(observations[1 : transition_count + 1])
  return states, action_seq, next_states


def _validate_observation_sequence(path: str, transition_count: int):
  observations = _load_numeric_table(path)
  required = transition_count + 1
  if len(observations) < required:
    raise ValueError(
        f'{os.path.basename(path)} needs at least {required} rows for '
        f'{transition_count} transitions, found {len(observations)}.'
    )
  return observations


def _validate_action_sequence(path: str, transition_count: int):
  actions = _load_numeric_table(path)
  if len(actions) < transition_count:
    raise ValueError(
        f'{os.path.basename(path)} needs at least {transition_count} '
        f'rows, found {len(actions)}.'
    )
  return actions


def _validate_feature_width(arrays: Dict[str, np.ndarray],
                            expected_width: int, label: str) -> None:
  for name, array in arrays.items():
    if array.shape[1] != expected_width:
      raise ValueError(
          f'{name} must have {expected_width} {label} features, '
          f'found shape {array.shape}.'
      )


def load_rsr_datasets(data_dir: str, max_transitions: int = 50) -> Tuple:
  """Load + validate the five arrays policy_params_training consumes."""
  paths = {
      name: _require_data_file(data_dir, name)
      for name in REQUIRED_DATA_FILES
  }
  past_states, past_actions, past_next_states_real = (
      _load_transition_triplet(
          paths['real_obs.txt'], paths['real_action.txt'], max_transitions
      )
  )
  transition_count = int(past_states.shape[0])
  obs_dim = int(past_states.shape[1])
  action_dim = int(past_actions.shape[1])

  past_sim_obs = _validate_observation_sequence(
      paths['past_sim_obs.txt'], transition_count
  )
  current_sim_obs = _validate_observation_sequence(
      paths['current_sim_obs.txt'], transition_count
  )
  sim_obs = _validate_observation_sequence(
      paths['obs.txt'], transition_count
  )
  sim_actions = _validate_action_sequence(
      paths['actions.txt'], transition_count
  )

  _validate_feature_width(
      {
          'real_obs.txt': _load_numeric_table(paths['real_obs.txt']),
          'past_sim_obs.txt': past_sim_obs,
          'current_sim_obs.txt': current_sim_obs,
          'obs.txt': sim_obs,
      },
      obs_dim,
      'observation',
  )
  _validate_feature_width(
      {
          'real_action.txt': _load_numeric_table(paths['real_action.txt']),
          'actions.txt': sim_actions,
      },
      action_dim,
      'action',
  )

  past_next_states_sim = jnp.array(past_sim_obs[1 : transition_count + 1])
  current_next_states_sim = jnp.array(
      current_sim_obs[1 : transition_count + 1]
  )
  return (
      past_states,
      past_actions,
      past_next_states_real,
      past_next_states_sim,
      current_next_states_sim,
  )


def txt_to_2d_array(path: str) -> np.ndarray:
  """Loose whitespace/comma text loader
  (reference: test/rsr_env_params_tuning.py:53-70)."""
  rows = []
  with open(path) as f:
    for line in f:
      line = line.strip().replace(',', ' ')
      if not line:
        continue
      rows.append([float(tok) for tok in line.split()])
  return np.asarray(rows)
