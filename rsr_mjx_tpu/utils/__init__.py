"""Shared utilities: shaped rewards, gait profiles, rendering, profiling."""

from rsr_mjx_tpu.utils import gait, reward

__all__ = ['gait', 'reward']
