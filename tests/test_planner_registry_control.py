"""Planner factory/ABC, tuning profiles, PID, and onboard controller
(reference base_planner.py, control_config.py, onboard_controller.py,
utils/pid_controller.py)."""

import numpy as np
import pytest

from dart_planner_tpu.common.errors import ConfigurationError, PlanningError
from dart_planner_tpu.common.pid import VectorPID
from dart_planner_tpu.common.types import DroneState, Trajectory
from dart_planner_tpu.control import (
    GeometricConfig,
    OnboardController,
    add_custom_profile,
    get_controller_config,
    get_recommended_profile,
    list_profiles,
)
from dart_planner_tpu.planning import BasePlanner, PlannerFactory, SE3MPCPlanner


# -- factory / ABC ----------------------------------------------------

def test_factory_creates_se3_planner():
    assert "se3_mpc" in PlannerFactory.list_available()
    p = PlannerFactory.create("se3_mpc")
    assert isinstance(p, SE3MPCPlanner)
    assert isinstance(p, BasePlanner)
    # dict config path (reference passes dicts through the factory)
    p2 = PlannerFactory.create("se3_mpc", {"prediction_horizon": 6})
    assert p2.config.prediction_horizon == 6


def test_factory_unknown_raises():
    with pytest.raises(PlanningError):
        PlannerFactory.create("nope")


def test_goal_and_state_validation(sample_state):
    p = PlannerFactory.create("se3_mpc")
    assert p.validate_goal(np.array([1.0, 2.0, 3.0]))
    assert not p.validate_goal(np.array([1.0, 2.0, 0.1]))  # too low
    assert not p.validate_goal(np.array([np.nan, 0.0, 3.0]))
    assert p.validate_state(sample_state)
    bad = DroneState.create(
        timestamp=0.0, position=(0, 0, 2), velocity=(50.0, 0, 0)
    )
    assert not p.validate_state(bad)
    assert not p.validate_state(None)


def test_stats_tracking_bounded():
    p = PlannerFactory.create("se3_mpc")
    for i in range(150):
        p._update_planning_stats(1.0, success=i % 2 == 0)
    st = p.planning_stats
    assert st["total_plans"] == 150
    assert st["successful_plans"] == 75
    assert len(st["planning_times"]) == 100  # bounded history
    p.reset_stats()
    assert p.planning_stats["total_plans"] == 0


# -- tuning profiles --------------------------------------------------

def test_profiles_exist_and_default():
    names = list_profiles()
    for req in ("sitl_optimized", "conservative", "aggressive"):
        assert req in names
    assert get_controller_config() == GeometricConfig()  # sitl default


def test_profile_lookup_and_recommendations():
    cons = get_controller_config("conservative")
    aggr = get_controller_config("aggressive")
    assert cons.kp_pos[0] < aggr.kp_pos[0]
    assert get_recommended_profile("racing") == "aggressive"
    assert get_recommended_profile("hardware") == "conservative"
    assert get_recommended_profile("unknown-scn") == "sitl_optimized"
    with pytest.raises(ConfigurationError):
        get_controller_config("definitely_missing")


def test_custom_profile_roundtrip():
    cfg = GeometricConfig()._replace(mass=2.5)
    add_custom_profile("heavy", cfg, "2.5 kg airframe")
    assert get_controller_config("heavy").mass == 2.5
    assert "heavy" in list_profiles()


# -- PID --------------------------------------------------------------

def test_vector_pid_proportional_and_integral():
    pid = VectorPID(kp=[2.0, 2.0], ki=[1.0, 1.0], integral_limit=0.5)
    pid.setpoint = np.array([1.0, -1.0])
    out = pid.update(np.zeros(2), dt=0.1)
    np.testing.assert_allclose(out, [2.1, -2.1])  # kp*e + ki*e*dt
    # windup clamps at the limit
    for _ in range(100):
        pid.update(np.zeros(2), dt=0.1)
    assert np.all(np.abs(pid._integral) <= 0.5 + 1e-12)


def test_vector_pid_derivative_first_sample_suppressed():
    pid = VectorPID(kp=0.0, kd=1.0)
    assert pid.update(0.0, 0.1) == 0.0  # no derivative kick
    out = pid.update(0.5, 0.1)  # error went 0 -> -0.5
    np.testing.assert_allclose(out, -5.0)


# -- onboard controller ----------------------------------------------

def _hover_traj(n=10, dt=0.1, z=2.0):
    ts = np.arange(n) * dt
    pos = np.tile([0.0, 0.0, z], (n, 1))
    return Trajectory(
        timestamps=ts,
        positions=pos.astype(np.float32),
        velocities=np.zeros((n, 3), np.float32),
        accelerations=np.zeros((n, 3), np.float32),
    )


def test_onboard_hover_equilibrium():
    ctl = OnboardController(mass=1.0)
    st = DroneState.create(timestamp=0.0, position=(0, 0, 2.0))
    cmd, target = ctl.compute_control_command(st, _hover_traj())
    np.testing.assert_allclose(target, [0, 0, 2.0])
    # at the setpoint: thrust = m*g, torque ~ 0
    assert float(cmd.thrust) == pytest.approx(9.81, abs=1e-3)
    np.testing.assert_allclose(np.asarray(cmd.torque), 0.0, atol=1e-6)


def test_onboard_corrects_altitude_error():
    ctl = OnboardController(mass=1.0)
    st = DroneState.create(timestamp=0.0, position=(0, 0, 1.5))  # 0.5 low
    cmd, _ = ctl.compute_control_command(st, _hover_traj())
    assert float(cmd.thrust) > 9.81  # climbs


def test_onboard_fallback_and_reset():
    ctl = OnboardController(mass=2.0)
    st = DroneState.create(timestamp=0.0, position=(0, 0, 2.0))
    cmd = ctl.get_fallback_command(st)
    assert float(cmd.thrust) == pytest.approx(2.0 * 9.81)
    ctl.compute_control_command(st, _hover_traj())
    ctl.reset()
    assert ctl.last_time is None


def test_onboard_interpolation_clamps():
    ctl = OnboardController()
    traj = _hover_traj(n=5, dt=0.1)
    p, v, a = ctl._interpolate_trajectory(99.0, traj)  # past the end
    np.testing.assert_allclose(p, [0, 0, 2.0])
    p, _, _ = ctl._interpolate_trajectory(-1.0, traj)  # before start
    np.testing.assert_allclose(p, [0, 0, 2.0])


def test_onboard_zero_dt_holds_hover():
    """Repeated timestamps must never command motor cut."""
    ctl = OnboardController(mass=1.0)
    st = DroneState.create(timestamp=1.0, position=(0, 0, 2.0))
    ctl.compute_control_command(st, _hover_traj())
    cmd, _ = ctl.compute_control_command(st, _hover_traj())  # same t -> dt=0
    assert float(cmd.thrust) == pytest.approx(9.81)


def test_planner_stats_bounded_and_shared():
    """SE3MPCPlanner routes stats through BasePlanner's capped history."""
    p = SE3MPCPlanner()
    for i in range(130):
        p._update_planning_stats(1.0, success=True)
    assert len(p.planning_stats["planning_times"]) == 100
    assert p.get_planning_stats()["total_plans"] == 130
