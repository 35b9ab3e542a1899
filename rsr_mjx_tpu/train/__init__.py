"""Training package: PPO/SAC trainers, networks, losses, checkpointing."""

from rsr_mjx_tpu.train import (
    acting,
    checkpoint,
    losses,
    networks,
    running_statistics,
)
from rsr_mjx_tpu.train.losses import Transition

__all__ = [
    'acting',
    'checkpoint',
    'losses',
    'networks',
    'running_statistics',
    'Transition',
]
