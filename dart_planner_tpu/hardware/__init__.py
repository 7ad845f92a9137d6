"""Hardware abstraction layer.

Mirrors the reference ``src/dart_planner/hardware/`` (SURVEY.md section
2.5): a ``VehicleIO`` ABC + factory, a pure-software simulated vehicle,
physics-based motor mixing/models, a safety watchdog, and a transport-
delay buffer. MAVLink/AirSim adapters are import-gated (pymavlink/airsim
are not in this image) but keep the reference API shape.
"""

from dart_planner_tpu.hardware.vehicle_io import (
    VehicleIO,
    VehicleIOFactory,
    SafetyValidatedVehicleIO,
)
from dart_planner_tpu.hardware.simulated_vehicle import SimulatedVehicleIO
from dart_planner_tpu.hardware.motor_model import (
    MotorParameters,
    QuadraticMotorModel,
    create_default_motor_model,
    fit_quadratic_motor_model,
)
from dart_planner_tpu.hardware.motor_mixer import (
    MotorMixer,
    MotorMixingConfig,
    create_x_configuration,
    create_plus_configuration,
)
from dart_planner_tpu.hardware.safety_watchdog import SafetyWatchdog
from dart_planner_tpu.hardware.latency_buffer import LatencyBuffer
from dart_planner_tpu.hardware.mission import (
    MissionConfig,
    MissionRunner,
    start_mission,
)

__all__ = [
    "MissionConfig",
    "MissionRunner",
    "start_mission",
    "VehicleIO",
    "VehicleIOFactory",
    "SafetyValidatedVehicleIO",
    "SimulatedVehicleIO",
    "MotorParameters",
    "QuadraticMotorModel",
    "create_default_motor_model",
    "fit_quadratic_motor_model",
    "MotorMixer",
    "MotorMixingConfig",
    "create_x_configuration",
    "create_plus_configuration",
    "SafetyWatchdog",
    "LatencyBuffer",
]
from dart_planner_tpu.hardware.safety import SafetyLimits, SafetyManager  # noqa: E402
from dart_planner_tpu.hardware.motor_calibration import (  # noqa: E402
    CalibrationResult,
    MotorLatencyCalibrator,
    calibrate_motor_latency,
)
from dart_planner_tpu.hardware.secure_interface import (  # noqa: E402
    ConnectionState,
    SecureHardwareInterface,
    create_secure_interface,
)
from dart_planner_tpu.hardware.airsim_interface import (  # noqa: E402
    AirSimConfig,
    AirSimDroneInterface,
    AirSimVehicleIO,
)

__all__ += [
    "SafetyLimits",
    "SafetyManager",
    "CalibrationResult",
    "MotorLatencyCalibrator",
    "calibrate_motor_latency",
    "ConnectionState",
    "SecureHardwareInterface",
    "create_secure_interface",
    "AirSimConfig",
    "AirSimDroneInterface",
    "AirSimVehicleIO",
]

from dart_planner_tpu.hardware.mixing_schema import (  # noqa: E402
    MotorMixingModel,
    validate_motor_mixing,
)

__all__ += ["MotorMixingModel", "validate_motor_mixing"]
