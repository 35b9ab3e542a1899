"""Real-robot deployment: checkpoint inference, obs reconstruction,
control loop, optional ROS adapters."""

from rsr_mjx_tpu.deploy.interface import (
    RobotInterface,
    build_cube_observation,
)
from rsr_mjx_tpu.deploy.policy import PolicyInference
from rsr_mjx_tpu.deploy.control_loop import run_cube_push_control_loop

__all__ = [
    'PolicyInference',
    'RobotInterface',
    'build_cube_observation',
    'run_cube_push_control_loop',
]
