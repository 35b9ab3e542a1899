"""rsr_mjx_tpu: a TPU-native real-to-sim-to-real RL framework.

From-scratch rebuild of the capability surface of sunnyshi0310/RSR-MJX
(reference mounted at /root/reference) designed for TPU: a JAX rigid-body
physics engine, vectorized environments, on-device PPO/SAC trainers, and
the RSR sim-real distribution-matching core — all jit/vmap/shard_map-first.
"""

__version__ = '0.1.0'
