"""L3 geometric SE(3) control and trajectory smoothing."""

from dart_planner_tpu.control.geometric import (
    ControllerState,
    GeometricConfig,
    GeometricController,
    compute_control,
)

__all__ = [
    "ControllerState",
    "GeometricConfig",
    "GeometricController",
    "compute_control",
]
