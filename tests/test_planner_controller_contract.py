"""Planner <-> controller interface contract (reference parity:
/root/reference/tests/test_planner_controller_contract.py, 317 LoC).

The planner's Trajectory must be directly consumable by the geometric
controller and the trajectory smoother without translation glue: the
shape/unit/frame/consistency guarantees both sides rely on are pinned
here so a change to either surface fails THIS test, not a flight.
"""

import numpy as np
import pytest

from dart_planner_tpu.common.types import DroneState, Trajectory
from dart_planner_tpu.control import GeometricController
from dart_planner_tpu.control.smoother import TrajectorySmoother
from dart_planner_tpu.planning import SE3MPCPlanner
from dart_planner_tpu.planning.se3_mpc import SE3MPCConfig


@pytest.fixture(scope="module")
def plan():
    planner = SE3MPCPlanner(SE3MPCConfig())
    planner.add_obstacle(center=(2.5, 0.5, 2.5), radius=0.5)
    state = DroneState.create(
        timestamp=1.5, position=(0.0, 0.0, 2.0), velocity=(0.5, 0.0, 0.0)
    )
    traj = planner.plan_trajectory(state, (5.0, 1.0, 3.0))
    return state, traj


def test_trajectory_shape_contract(plan):
    """Every field the controller/smoother consumes is present with the
    documented shapes (types.py Trajectory: (..., N) / (..., N, 3))."""
    _, traj = plan
    assert isinstance(traj, Trajectory)
    N = traj.timestamps.shape[-1]
    assert N == SE3MPCConfig().prediction_horizon
    for name in ("positions", "velocities", "accelerations",
                 "attitudes", "body_rates"):
        field = getattr(traj, name)
        assert field is not None, name
        assert field.shape[-2:] == (N, 3), name
    assert traj.thrusts is not None and traj.thrusts.shape[-1:] == (N,)


def test_trajectory_value_contract(plan):
    """SI floats, finite everywhere, monotonic timestamps starting at
    the request time, and internally consistent derivatives."""
    state, traj = plan
    cfg = SE3MPCConfig()
    ts = np.asarray(traj.timestamps)
    assert np.all(np.diff(ts) > 0)
    np.testing.assert_allclose(ts[0], state.timestamp, atol=1e-6)
    np.testing.assert_allclose(np.diff(ts), cfg.dt, rtol=1e-5)
    for name in ("positions", "velocities", "accelerations",
                 "attitudes", "body_rates", "thrusts"):
        v = np.asarray(getattr(traj, name))
        assert np.all(np.isfinite(v)), name
        assert v.dtype == np.float32, name
    # dynamics consistency: v_{k+1} ~ v_k + a_k dt (condensed rollout)
    v = np.asarray(traj.velocities)
    a = np.asarray(traj.accelerations)
    np.testing.assert_allclose(
        v[1:], v[:-1] + a[:-1] * cfg.dt, atol=1e-3
    )
    # thrust magnitudes within the box-bound envelope: bounds are
    # per-axis (tilt-limited x/y, z in [min, max]), so the NORM is
    # bounded by the box diagonal, not by max_thrust itself
    t = np.asarray(traj.thrusts)
    tan = np.tan(cfg.max_tilt_angle)
    assert np.all(
        t <= cfg.max_thrust * np.sqrt(1.0 + 2.0 * tan * tan) + 1e-3
    )
    # attitudes are Euler angles in radians (bounded), body rates sane
    assert np.all(np.abs(np.asarray(traj.attitudes)) <= np.pi + 1e-6)


def test_controller_consumes_every_step(plan):
    """Feeding each trajectory step to the controller yields finite,
    envelope-bounded commands — no unit or frame translation needed."""
    state, traj = plan
    ctrl = GeometricController()
    pos = np.asarray(traj.positions)
    vel = np.asarray(traj.velocities)
    acc = np.asarray(traj.accelerations)
    for k in range(pos.shape[0]):
        cmd = ctrl.compute_control(state, pos[k], vel[k], acc[k])
        thrust = float(np.asarray(cmd.thrust))
        torque = np.asarray(cmd.torque)
        assert np.isfinite(thrust) and thrust >= 0.0
        assert np.all(np.isfinite(torque))


def test_smoother_accepts_planner_output(plan):
    """The C2 smoother splices the planner's trajectory and serves
    interpolated setpoints inside the plan's time span."""
    state, traj = plan
    sm = TrajectorySmoother()
    ts = np.asarray(traj.timestamps)
    sm.update_trajectory(traj, float(ts[0]))
    for t in np.linspace(float(ts[0]), float(ts[-1]), 7):
        pos, vel, acc = sm.get_desired_state(t, state)
        for v in (pos, vel, acc):
            assert np.all(np.isfinite(np.asarray(v)))
    # interpolation passes near the plan knots once the splice-in
    # transition has completed
    p_end, _, _ = sm.get_desired_state(float(ts[-1]), state)
    np.testing.assert_allclose(
        np.asarray(p_end), np.asarray(traj.positions)[-1], atol=0.5
    )
