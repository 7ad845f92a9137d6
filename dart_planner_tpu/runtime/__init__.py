"""Host runtime: cooperative real-time scheduling + the C++ executor.

The reference's real-time layer is a Cython control loop
(control/rt_control_extension.pyx), an asyncio "quartic" scheduler
(common/quartic_scheduler.py), and thread/process loops. Here:

- :mod:`dart_planner_tpu.runtime.scheduler` — asyncio cooperative
  scheduler with the reference's deadline/overrun/jitter accounting.
- :mod:`dart_planner_tpu.runtime.rt_executor` — ctypes bindings to the
  C++ real-time executor (``native/``) that owns the 1 kHz fast path and
  deadline statistics off the Python GIL.
"""

from dart_planner_tpu.runtime.scheduler import (
    QuarticScheduler,
    QuarticTask,
    TaskPriority,
    create_control_task,
    create_planning_task,
    create_safety_task,
    quartic_scheduler_context,
)

__all__ = [
    "QuarticScheduler",
    "QuarticTask",
    "TaskPriority",
    "create_control_task",
    "create_planning_task",
    "create_safety_task",
    "quartic_scheduler_context",
]

from dart_planner_tpu.runtime.rt_executor import (  # noqa: E402
    PythonControlLoop,
    RealTimeControlLoop,
    create_control_loop,
    native_available,
)

__all__ += [
    "PythonControlLoop",
    "RealTimeControlLoop",
    "create_control_loop",
    "native_available",
]

from dart_planner_tpu.runtime.integration import (  # noqa: E402
    RealTimeManager,
    control_loop_task,
    get_real_time_manager,
    integrate_with_controller,
    integrate_with_planner,
    integrate_with_safety_system,
    planning_loop_task,
    real_time_task,
    reset_real_time_manager,
    safety_task,
)

__all__ += [
    "RealTimeManager",
    "control_loop_task",
    "get_real_time_manager",
    "integrate_with_controller",
    "integrate_with_planner",
    "integrate_with_safety_system",
    "planning_loop_task",
    "real_time_task",
    "reset_real_time_manager",
    "safety_task",
]
