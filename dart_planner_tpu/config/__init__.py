"""Frozen configuration system.

Mirror of the reference three-tier config (SURVEY.md section 5.6):
frozen pydantic models loaded from YAML + ``DART_*`` environment
overrides with startup validation (reference config/frozen_config.py),
plus physical vehicle parameters from ``hardware.yaml``
(common/vehicle_params.py).
"""

from dart_planner_tpu.config.frozen_config import (
    CommunicationConfig,
    CoordinateFrameConfig,
    DARTPlannerFrozenConfig,
    HardwareConfig,
    LoggingConfig,
    PlanningConfig,
    SafetyConfig,
    SecurityConfig,
    SimulationConfig,
    ConfigurationManager,
    get_frozen_config,
    reset_frozen_config,
)
from dart_planner_tpu.config.vehicle_params import (
    VehicleParams,
    load_vehicle_params,
    compute_max_torque_xyz,
)

__all__ = [
    "CommunicationConfig",
    "CoordinateFrameConfig",
    "DARTPlannerFrozenConfig",
    "HardwareConfig",
    "LoggingConfig",
    "PlanningConfig",
    "SafetyConfig",
    "SecurityConfig",
    "SimulationConfig",
    "ConfigurationManager",
    "get_frozen_config",
    "reset_frozen_config",
    "VehicleParams",
    "load_vehicle_params",
    "compute_max_torque_xyz",
]

from dart_planner_tpu.config.airframe import (  # noqa: E402
    AirframeConfig,
    AirframeConfigManager,
    get_airframe_config,
)

__all__ += ["AirframeConfig", "AirframeConfigManager", "get_airframe_config"]
