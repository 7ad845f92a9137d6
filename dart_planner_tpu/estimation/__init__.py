"""State estimation.

Mirrors the reference ``src/dart_planner/state_estimation/``: adapters
that standardize external estimator outputs into ``EstimatedState``
(PX4 EKF2 via MAVLink, simulator ground-truth shim) — plus a genuinely
new capability the reference lacks: a jittable, vmappable extended
Kalman filter (:mod:`dart_planner_tpu.estimation.ekf`) for fleets of
simulated vehicles with noisy sensors.
"""

from dart_planner_tpu.estimation.adapters import (
    PX4EKF2StateEstimator,
    SimGroundTruthEstimator,
)
from dart_planner_tpu.estimation.ekf import (
    EKFConfig,
    EKFState,
    ekf_init,
    ekf_predict,
    ekf_update_position,
    ekf_update_velocity,
)

__all__ = [
    "PX4EKF2StateEstimator",
    "SimGroundTruthEstimator",
    "EKFConfig",
    "EKFState",
    "ekf_init",
    "ekf_predict",
    "ekf_update_position",
    "ekf_update_velocity",
]
