"""Shared utilities: shaped rewards, gait profiles, offscreen rendering.

``rendering`` is imported lazily (it initializes an EGL context via C
MuJoCo) — use ``from rsr_mjx_tpu.utils import rendering``.
"""

from rsr_mjx_tpu.utils import gait, reward

__all__ = ['gait', 'reward', 'rendering']
