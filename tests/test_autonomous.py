"""Onboard autonomous controller with tiered failsafe
(reference edge/onboard_autonomous_controller.py)."""

import numpy as np

from dart_planner_tpu.apps.autonomous import (
    OnboardAutonomousController,
    OperationalMode,
)
from dart_planner_tpu.common.types import DroneState, Trajectory


def _state(t=0.0, pos=(0, 0, 2.0)):
    return DroneState.create(timestamp=t, position=pos)


def _cloud_traj(n=10, dt=0.1, z=2.0):
    ts = np.arange(n) * dt
    pos = np.tile([0.0, 0.0, z], (n, 1)).astype(np.float32)
    return Trajectory(
        timestamps=ts,
        positions=pos,
        velocities=np.zeros((n, 3), np.float32),
        accelerations=np.zeros((n, 3), np.float32),
    )


def test_mode_selection_by_connection_quality():
    ctl = OnboardAutonomousController()
    traj = _cloud_traj()
    ctl.compute_control_command(_state(), traj, connection_quality=0.95)
    assert ctl.current_mode is OperationalMode.NOMINAL
    ctl.compute_control_command(_state(0.1), traj, connection_quality=0.5)
    assert ctl.current_mode is OperationalMode.DEGRADED
    # stalled link but a cached trajectory -> degrade, don't drop to
    # autonomous (the controller caches every trajectory it is handed)
    ctl.compute_control_command(_state(0.2), None, connection_quality=0.9)
    assert ctl.current_mode is OperationalMode.DEGRADED
    # fresh controller with neither fresh nor cached trajectory
    ctl2 = OnboardAutonomousController()
    ctl2.compute_control_command(_state(), None, connection_quality=0.9)
    assert ctl2.current_mode is OperationalMode.AUTONOMOUS


def test_autonomous_mode_replans_locally():
    ctl = OnboardAutonomousController(replan_interval_s=0.0)
    ctl.set_goal((4.0, 0.0, 3.0))
    ctl.add_local_obstacle((2.0, 0.0, 2.5), 0.4)
    cmd = ctl.compute_control_command(_state(), None, connection_quality=0.0)
    assert ctl.current_mode is OperationalMode.AUTONOMOUS
    assert np.isfinite(float(cmd.thrust))
    st = ctl.get_system_status()
    assert st["planner_stats"]["total_plans"] == 1
    assert st["local_obstacles"] == 1


def test_autonomous_without_goal_hovers():
    ctl = OnboardAutonomousController()
    cmd = ctl.compute_control_command(_state(), None, connection_quality=0.0)
    assert float(cmd.thrust) == np.float32(1.0 * 9.81)  # fallback hover


def test_emergency_latches_and_descends():
    ctl = OnboardAutonomousController()
    ctl.trigger_emergency()
    cmd = ctl.compute_control_command(
        _state(), _cloud_traj(), connection_quality=1.0
    )
    assert ctl.current_mode is OperationalMode.EMERGENCY
    # reduced thrust -> controlled descent, regardless of link quality
    assert float(cmd.thrust) < 9.81
    assert ctl.get_system_status()["failsafe_activations"] == 1


def test_performance_stats_accumulate():
    ctl = OnboardAutonomousController()
    assert ctl.get_performance_stats() == {"status": "no_data"}
    for i in range(3):
        ctl.compute_control_command(
            _state(0.1 * i), _cloud_traj(), connection_quality=1.0
        )
    stats = ctl.get_performance_stats()
    assert stats["total_loops"] == 3
    assert stats["mean_loop_time_ms"] > 0


def test_repeated_plan_failures_latch_emergency():
    ctl = OnboardAutonomousController(replan_interval_s=0.0, max_plan_failures=3)
    ctl.set_goal((4.0, 0.0, 3.0))

    def boom(*a, **k):
        raise RuntimeError("solver down")

    ctl._planner.plan_trajectory = boom
    for i in range(3):
        ctl.compute_control_command(_state(0.1 * i), None, connection_quality=0.0)
    # the persistent failure latched the emergency descent
    cmd = ctl.compute_control_command(_state(0.4), None, connection_quality=0.0)
    assert ctl.current_mode is OperationalMode.EMERGENCY
    assert float(cmd.thrust) < 9.81
