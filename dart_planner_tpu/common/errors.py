"""Exception taxonomy (reference /root/reference/src/dart_planner/common/
errors.py:7-55 — identical domains so callers can port error handling 1:1)."""


class DARTPlannerError(Exception):
    """Base exception for all framework errors."""


class ConfigurationError(DARTPlannerError):
    """Configuration loading/validation errors."""


class DependencyError(DARTPlannerError):
    """Dependency injection / resolution errors."""


class CommunicationError(DARTPlannerError):
    """Network / IPC errors."""


class ControlError(DARTPlannerError):
    """Control-system errors."""


class PlanningError(DARTPlannerError):
    """Planning / solver errors."""


class HardwareError(DARTPlannerError):
    """Hardware interface errors."""


class ValidationError(DARTPlannerError):
    """Input or data validation errors."""


class SecurityError(DARTPlannerError):
    """Auth / crypto errors."""


class RealTimeError(DARTPlannerError):
    """Real-time system errors."""


class SchedulingError(DARTPlannerError):
    """Task scheduling errors."""


class TimingError(DARTPlannerError):
    """Timing / deadline violations."""


class UnsupportedCommandError(HardwareError):
    """Hardware command not supported by the adapter."""
