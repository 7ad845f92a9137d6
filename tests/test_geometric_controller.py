"""Geometric SE(3) controller math, anti-windup, yaw singularity, tilt
limiting, and failsafe (reference test_controller_dynamics.py,
test_controller_torque_calculation.py,
control/test_geometric_controller_anti_windup.py,
control/test_geometric_controller_yaw_singularity.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dart_planner_tpu.common.types import DroneState
from dart_planner_tpu.control.geometric import (
    ControllerState,
    ControlSetpoint,
    GeometricConfig,
    GeometricController,
    _desired_frame,
    _tilt_limit,
    compute_body_rate_command,
    compute_control,
)

CFG = GeometricConfig()


def _drone(pos=(0, 0, 2.0), vel=(0, 0, 0), att=(0, 0, 0), omega=(0, 0, 0), t=0.0):
    return DroneState.create(
        timestamp=t, position=pos, velocity=vel, attitude=att,
        angular_velocity=omega,
    )


def _tick(cfg, drone, sp, state=None, dt=0.001):
    state = state or ControllerState.zeros(cfg)
    return compute_control(cfg, state, drone, sp, dt)


# -- control-law numerics ---------------------------------------------

def test_hover_equilibrium():
    """At the setpoint with zero errors: thrust = m*g, torque = 0
    (hand-computed SE(3) math, reference test_controller_dynamics.py)."""
    sp = ControlSetpoint.hover_at(jnp.asarray([0.0, 0.0, 2.0]))
    cmd, st = _tick(CFG, _drone(), sp)
    assert float(cmd.thrust) == pytest.approx(CFG.mass * CFG.gravity, rel=1e-5)
    np.testing.assert_allclose(np.asarray(cmd.torque), 0.0, atol=1e-6)
    assert not bool(st.failsafe_active)


def test_thrust_magnitude_includes_mass():
    """thrust = m * ||acc_des - g||; a 2 kg vehicle needs twice the
    hover thrust of a 1 kg one."""
    sp = ControlSetpoint.hover_at(jnp.asarray([0.0, 0.0, 2.0]))
    cmd1, _ = _tick(CFG._replace(mass=1.0, max_thrust=100.0), _drone(), sp)
    cmd2, _ = _tick(CFG._replace(mass=2.0, max_thrust=100.0), _drone(), sp)
    assert float(cmd2.thrust) == pytest.approx(2 * float(cmd1.thrust), rel=1e-5)


def test_position_error_maps_to_pid_acceleration():
    """1 m altitude error -> thrust = m * (g + kp_z) exactly (kd, ki
    inactive with zero velocity error and empty integral)."""
    cfg = CFG._replace(max_thrust=100.0)
    sp = ControlSetpoint.hover_at(jnp.asarray([0.0, 0.0, 3.0]))
    cmd, _ = _tick(cfg, _drone(pos=(0, 0, 2.0)), sp)
    expected = cfg.mass * (cfg.gravity + cfg.kp_pos[2] * 1.0)
    assert float(cmd.thrust) == pytest.approx(expected, rel=1e-5)


def test_torque_opposes_yaw_error_with_hand_value():
    """Yaw error 0.05 rad about z: tau_z = -kp_att_z * sin(0.05)/... via
    e_R = 0.5 vee(R_d^T R - R^T R_d) (reference
    test_controller_torque_calculation.py)."""
    sp = ControlSetpoint.hover_at(jnp.asarray([0.0, 0.0, 2.0]))
    cmd, _ = _tick(CFG, _drone(att=(0, 0, 0.05)), sp)
    expected_z = -CFG.kp_att[2] * float(np.sin(0.05))
    assert float(cmd.torque[2]) == pytest.approx(expected_z, rel=1e-4)
    # roll/pitch untouched
    np.testing.assert_allclose(np.asarray(cmd.torque[:2]), 0.0, atol=1e-6)


def test_torque_includes_gyroscopic_term():
    """Omega x (I Omega) appears in the torque (reference :690)."""
    omega = (1.0, 2.0, 0.0)
    sp = ControlSetpoint.hover_at(jnp.asarray([0.0, 0.0, 2.0]))
    cfg = CFG._replace(kd_att=(0.0, 0.0, 0.0), kp_att=(0.0, 0.0, 0.0))
    cmd, _ = _tick(cfg, _drone(omega=omega), sp)
    I = np.asarray(cfg.inertia)
    expected = np.cross(omega, I * np.asarray(omega))
    np.testing.assert_allclose(np.asarray(cmd.torque), expected, atol=1e-6)


def test_torque_saturation_flags():
    sp = ControlSetpoint.hover_at(jnp.asarray([0.0, 0.0, 2.0]))
    cmd, st = _tick(CFG, _drone(att=(0, 0, 0.5)), sp)  # big yaw error
    assert float(cmd.torque[2]) == pytest.approx(-CFG.max_torque_xyz[2])
    assert bool(st.last_torque_saturated[2])


# -- tilt limiting ----------------------------------------------------

def test_tilt_limit_projects_to_cone_preserving_azimuth():
    b3 = jnp.asarray([0.9, 0.0, 0.435])  # ~65 deg tilt
    out = np.asarray(_tilt_limit(CFG, b3))
    assert out[2] == pytest.approx(np.cos(CFG.max_tilt_angle), rel=1e-6)
    assert out[1] == pytest.approx(0.0, abs=1e-7)
    assert out[0] > 0  # azimuth preserved


def test_tilt_limit_never_inverts_below_horizon():
    """Reference's cos(max)/b3_z scaling flips the lateral direction when
    b3_z < 0; the cone projection must not (module docstring :162-171)."""
    b3 = jnp.asarray([0.8, 0.0, -0.6])  # commanded below the horizon
    out = np.asarray(_tilt_limit(CFG, b3))
    assert out[0] > 0  # same lateral direction
    assert out[2] == pytest.approx(np.cos(CFG.max_tilt_angle), rel=1e-6)


# -- yaw singularity --------------------------------------------------

@pytest.mark.parametrize("yaw", [0.0, 1.2, np.pi / 2, -2.5])
def test_desired_frame_orthonormal_everywhere(yaw):
    """Near-singular thrust directions (b3 aligned with the yaw vector)
    must still give a right-handed orthonormal frame (reference
    yaw-singularity suite)."""
    for b3 in (
        [np.cos(yaw), np.sin(yaw), 1e-4],  # aligned with c: singular
        [np.cos(yaw) * 0.99, np.sin(yaw) * 0.99, 0.14],
        [0.0, 0.0, 1.0],
    ):
        b3 = jnp.asarray(b3) / jnp.linalg.norm(jnp.asarray(b3))
        R = np.asarray(_desired_frame(CFG, b3, jnp.asarray(yaw)))
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-5)
        np.testing.assert_allclose(R[:, 2], np.asarray(b3), atol=1e-6)


def test_yaw_convention_reference_vs_lee():
    """yaw_convention='reference' reproduces the reference's -90deg-yawed
    desired frame at hover (bug-compatible); 'lee' gives identity."""
    b3 = jnp.asarray([0.0, 0.0, 1.0])
    R_lee = np.asarray(_desired_frame(CFG, b3, jnp.asarray(0.0)))
    np.testing.assert_allclose(R_lee, np.eye(3), atol=1e-6)
    R_ref = np.asarray(
        _desired_frame(
            CFG._replace(yaw_convention="reference"), b3, jnp.asarray(0.0)
        )
    )
    # b1 = c x b3 = (1,0,0) x (0,0,1) = (0,-1,0): -90 deg about z
    np.testing.assert_allclose(R_ref[:, 0], [0, -1, 0], atol=1e-6)


# -- anti-windup ------------------------------------------------------

def _wind_up(cfg, n=400):
    state = ControllerState.zeros(cfg)
    sp = ControlSetpoint.hover_at(jnp.asarray([0.0, 0.0, 50.0]))  # huge err
    drone = _drone(vel=(0, 0, -5.0))
    for _ in range(n):
        _, state = compute_control(cfg, state, drone, sp, 0.01)
    return state


@pytest.mark.parametrize("method", ["clamping", "back_calculation"])
def test_integral_bounded_under_saturation(method):
    """Sustained saturation must not wind the integral past its caps
    (reference anti-windup suite :309)."""
    cfg = CFG._replace(anti_windup_method=method)
    state = _wind_up(cfg)
    integral = np.asarray(state.integral_vel_error)
    per_axis = np.asarray(cfg.max_integral_per_axis)
    assert (np.abs(integral) <= per_axis + 1e-6).all()
    assert np.linalg.norm(integral) <= cfg.max_integral_pos + 1e-6
    assert bool(state.last_thrust_saturated)


def test_integral_accumulates_when_unsaturated():
    cfg = CFG._replace(max_thrust=1000.0)  # never saturates
    state = ControllerState.zeros(cfg)
    sp = ControlSetpoint.hover_at(jnp.asarray([0.0, 0.0, 2.0]))
    drone = _drone(vel=(0.0, 0.0, -0.5))  # persistent velocity error
    for _ in range(10):
        _, state = compute_control(cfg, state, drone, sp, 0.01)
    assert float(state.integral_vel_error[2]) > 0.04  # ~ 0.5 * 10 * 0.01


# -- failsafe ---------------------------------------------------------

def test_invalid_dt_triggers_failsafe():
    """dt <= 0 or > 0.1 s: hold last valid thrust, zero torque
    (reference :442-443)."""
    sp = ControlSetpoint.hover_at(jnp.asarray([0.0, 0.0, 2.0]))
    for bad_dt in (0.0, -0.01, 0.5):
        cmd, st = _tick(CFG, _drone(att=(0, 0, 0.3)), sp, dt=bad_dt)
        assert bool(st.failsafe_active)
        assert float(cmd.thrust) == pytest.approx(CFG.mass * CFG.gravity)
        np.testing.assert_allclose(np.asarray(cmd.torque), 0.0)


def test_persistent_tracking_failure_counts_up_and_triggers():
    cfg = CFG._replace(failsafe_trigger_count=5)
    state = ControllerState.zeros(cfg)
    sp = ControlSetpoint.hover_at(jnp.asarray([50.0, 0.0, 2.0]))  # 50 m off
    drone = _drone(vel=(-5.0, 0, 0))  # velocity error too
    for _ in range(7):
        cmd, state = compute_control(cfg, state, drone, sp, 0.01)
    assert bool(state.failsafe_active)
    np.testing.assert_allclose(np.asarray(cmd.torque), 0.0)


def test_facade_halves_gains_on_first_failsafe():
    ctl = GeometricController(CFG._replace(failsafe_trigger_count=2))
    kp0 = ctl.config.kp_pos[0]
    for i in range(5):
        ctl.compute_control(
            _drone(vel=(-5.0, 0, 0), t=0.01 * (i + 1)),
            (50.0, 0.0, 2.0), (0.0, 0.0, 0.0), (0.0, 0.0, 0.0),
        )
    assert ctl.config.kp_pos[0] == pytest.approx(kp0 * 0.5)
    metrics = ctl.get_performance_metrics()
    assert metrics["total_samples"] == 5
    assert metrics["mean_position_error"] == pytest.approx(50.0, rel=1e-3)


# -- batching & body rates --------------------------------------------

def test_controller_is_batchable():
    """One vmapped call controls a fleet (no reference counterpart)."""
    B = 16
    rng = np.random.default_rng(0)
    drones = DroneState.create(
        timestamp=np.zeros(B),
        position=rng.normal(0, 1, (B, 3)) + [0, 0, 5],
        velocity=rng.normal(0, 0.5, (B, 3)),
        attitude=rng.normal(0, 0.1, (B, 3)),
        angular_velocity=rng.normal(0, 0.1, (B, 3)),
    )
    sp = ControlSetpoint.hover_at(jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 5.0]), (B, 3)))
    state = ControllerState.zeros(CFG, batch_shape=(B,))
    cmd, st = jax.vmap(
        lambda d, s, p: compute_control(CFG, s, d, p, 0.001)
    )(drones, state, sp)
    assert cmd.thrust.shape == (B,)
    assert np.isfinite(np.asarray(cmd.thrust)).all()
    assert np.isfinite(np.asarray(cmd.torque)).all()


def test_body_rate_command_normalized():
    sp = ControlSetpoint.hover_at(jnp.asarray([0.0, 0.0, 2.0]))
    brc, _ = compute_body_rate_command(
        CFG, ControllerState.zeros(CFG), _drone(), sp, 0.001
    )
    assert 0.0 <= float(brc.thrust) <= 1.0
    assert float(brc.thrust) == pytest.approx(
        CFG.mass * CFG.gravity / CFG.max_thrust, rel=1e-5
    )
