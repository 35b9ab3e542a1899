"""TPU-native rigid-body physics engine with MuJoCo semantics.

Replaces the reference's external `mujoco-mjx` dependency (README.md:39-58)
with a from-scratch JAX implementation designed for XLA: static shapes
everywhere, trace-time-unrolled tree recursions, dense batched linear
algebra, and a static collision pair table instead of a runtime broad-phase.
"""

from rsr_mjx_tpu.physics.forward import forward, make_data, step
from rsr_mjx_tpu.physics.io import (
    load_model_from_path,
    load_model_from_xml,
    name2id,
    put_model,
)
from rsr_mjx_tpu.physics.types import Contact, Data, Model, Option

__all__ = [
    'Contact',
    'Data',
    'Model',
    'Option',
    'forward',
    'load_model_from_path',
    'load_model_from_xml',
    'make_data',
    'name2id',
    'put_model',
    'step',
]
