"""RSR core: distribution matching, loss precompute, physics param tuning."""

from rsr_mjx_tpu.rsr import distribution
from rsr_mjx_tpu.rsr.loss import (
    RSRData,
    build_rsr_data,
    compute_rsr_loss,
    make_grid,
)

__all__ = [
    'RSRData',
    'build_rsr_data',
    'compute_rsr_loss',
    'distribution',
    'make_grid',
]
