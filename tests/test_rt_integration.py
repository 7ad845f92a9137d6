"""Real-time integration layer (runtime/integration.py) vs the reference
``common/real_time_integration.py``: decorators, manager wiring, adapters,
and overrun auto-disable exercised through the decorator path."""

import asyncio
import time

import numpy as np
import pytest

from dart_planner_tpu.runtime import integration
from dart_planner_tpu.runtime.integration import (
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


@pytest.fixture(autouse=True)
def fresh_singleton():
    reset_real_time_manager()
    yield
    reset_real_time_manager()


def test_decorators_register_tasks_on_manager():
    mgr = RealTimeManager()

    @control_loop_task(frequency_hz=200.0, manager=mgr)
    def ctrl():
        pass

    @planning_loop_task(frequency_hz=20.0, manager=mgr)
    def plan():
        pass

    @safety_task(frequency_hz=50.0, manager=mgr)
    def safe():
        pass

    @real_time_task(frequency_hz=5.0, name="telemetry", manager=mgr)
    def telem():
        pass

    names = set(mgr.scheduler.tasks)
    assert names == {"control", "planning", "safety", "telemetry"}
    assert mgr.scheduler.tasks["control"].frequency_hz == 200.0
    assert mgr.scheduler.tasks["planning"].frequency_hz == 20.0
    # decorators return the function unchanged
    assert ctrl() is None and plan() is None and safe() is None
    assert telem() is None


def test_global_singleton_used_without_explicit_manager():
    @safety_task(frequency_hz=10.0)
    def watch():
        pass

    assert "safety" in get_real_time_manager().scheduler.tasks
    reset_real_time_manager()
    assert "safety" not in get_real_time_manager().scheduler.tasks


def test_manager_runs_tasks_at_configured_rates():
    mgr = RealTimeManager()
    counts = {"control": 0, "planning": 0, "safety": 0}

    @control_loop_task(frequency_hz=100.0, manager=mgr)
    def ctrl():
        counts["control"] += 1

    @planning_loop_task(frequency_hz=20.0, manager=mgr)
    def plan():
        counts["planning"] += 1

    @safety_task(frequency_hz=50.0, manager=mgr)
    def safe():
        counts["safety"] += 1

    asyncio.run(mgr.run_for(0.5))

    # generous bounds: CI boxes are noisy, rates must still be ordered
    assert counts["control"] >= 20
    assert counts["safety"] >= 10
    assert counts["planning"] >= 4
    assert counts["control"] > counts["safety"] > counts["planning"]
    stats = mgr.get_stats()
    assert stats["global"]["total_executions"] == sum(counts.values())
    assert stats["tasks"]["control"]["execution_count"] == counts["control"]


def test_function_swap_while_task_exists():
    """set_*_function re-binds the body without duplicating the task
    (reference RTI:340-358 lazy task creation)."""
    mgr = RealTimeManager()
    calls = []
    mgr.set_control_function(lambda: calls.append("a"), frequency_hz=100.0)
    mgr.set_control_function(lambda: calls.append("b"), frequency_hz=100.0)
    assert len(mgr.scheduler.tasks) == 1
    asyncio.run(mgr.run_for(0.1))
    assert "b" in calls and "a" not in calls


def test_overrun_auto_disable_through_decorator_path():
    """A decorated control loop that blows its period every time must be
    auto-disabled by the scheduler after max_consecutive_overruns
    (reference quartic_scheduler.py:342-349), while the safety task
    keeps running."""
    mgr = RealTimeManager()
    mgr.scheduler.max_consecutive_overruns = 3
    counts = {"control": 0, "safety": 0}

    @control_loop_task(frequency_hz=200.0, manager=mgr)  # period 5 ms
    def hog():
        counts["control"] += 1
        time.sleep(0.02)  # 4x the period: guaranteed overrun

    @safety_task(frequency_hz=100.0, manager=mgr)
    def safe():
        counts["safety"] += 1

    asyncio.run(mgr.run_for(0.6))

    assert mgr.control_task is not None
    assert not mgr.control_task.enabled, "hog was not auto-disabled"
    # disabled after exactly max_consecutive_overruns executions
    assert counts["control"] == 3
    assert counts["safety"] > counts["control"]


def test_integrate_with_controller_calls_through():
    class FakeController:
        def __init__(self):
            self.calls = 0

        def compute_control(self, state, *setpoint):
            self.calls += 1
            return np.asarray(state) * 0 + len(setpoint)

    ctl = FakeController()
    sent = []
    mgr = RealTimeManager()
    integrate_with_controller(
        ctl,
        get_state=lambda: np.zeros(3),
        get_setpoint=lambda: (np.ones(3), np.zeros(3)),
        send_command=sent.append,
        frequency_hz=100.0,
        manager=mgr,
    )
    asyncio.run(mgr.run_for(0.2))
    assert ctl.calls > 0
    assert len(sent) == ctl.calls
    assert float(sent[0][0]) == 2.0  # both setpoint elements passed through


def test_integrate_with_planner_and_safety():
    class FakePlanner:
        def plan_trajectory(self, state, goal):
            return {"to": np.asarray(goal)}

    class FakeSafety:
        def __init__(self):
            self.n = 0

        def check(self, state):
            self.n += 1
            return "violation" if self.n >= 3 else None

    trajs, violations = [], []
    mgr = RealTimeManager()
    integrate_with_planner(
        FakePlanner(),
        get_state=lambda: np.zeros(3),
        get_goal=lambda: np.asarray([1.0, 2.0, 3.0]),
        send_trajectory=trajs.append,
        frequency_hz=50.0,
        manager=mgr,
    )
    fs = FakeSafety()
    integrate_with_safety_system(
        fs,
        get_state=lambda: np.zeros(3),
        on_violation=violations.append,
        frequency_hz=50.0,
        manager=mgr,
    )
    asyncio.run(mgr.run_for(0.3))
    assert trajs and np.allclose(trajs[0]["to"], [1.0, 2.0, 3.0])
    assert violations and violations[0] == "violation"
    assert fs.n >= 3


def test_manager_start_stop_idempotent():
    mgr = RealTimeManager()
    mgr.set_safety_function(lambda: None)

    async def scenario():
        await mgr.start()
        await mgr.start()  # no-op
        assert mgr.running
        await mgr.stop()
        await mgr.stop()  # no-op
        assert not mgr.running

    asyncio.run(scenario())
    assert integration._MANAGER is None  # explicit managers don't leak
