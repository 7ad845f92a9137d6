"""Hardware layer tests (reference hardware/test_motor_model.py,
test_motor_mixing.py, test_pixhawk_interface.py scope — MAVLink mocked)."""

import asyncio
from unittest.mock import MagicMock

import numpy as np
import pytest

from dart_planner_tpu.common.errors import HardwareError, ValidationError
from dart_planner_tpu.common.types import Trajectory
from dart_planner_tpu.hardware import (
    LatencyBuffer,
    MotorMixer,
    SafetyValidatedVehicleIO,
    SimulatedVehicleIO,
    VehicleIOFactory,
    create_default_motor_model,
    create_x_configuration,
    fit_quadratic_motor_model,
)
from dart_planner_tpu.hardware.motor_model import BenchTestData
import jax.numpy as jnp


# ---- motor model ----
def test_motor_model_roundtrip():
    m = create_default_motor_model()
    for thrust in (0.5, 3.0, 8.0, 11.9):
        pwm = m.pwm_from_thrust(thrust, motor_id=0)
        back = m.thrust_from_pwm(pwm, motor_id=0)
        np.testing.assert_allclose(back, thrust, rtol=1e-6)
    assert m.thrust_from_pwm(1.0, motor_id=0) == pytest.approx(12.0)


def test_motor_model_fit_from_bench_data():
    pwm = np.linspace(0.1, 1.0, 10)
    true_thrust = 7.5 * pwm**2 + 3.0 * pwm + 0.2
    model = fit_quadratic_motor_model(
        [BenchTestData(pwm_values=pwm, thrust_values=true_thrust, motor_id=0)]
    )
    p = model.get_motor_parameters(0)
    np.testing.assert_allclose([p.thrust_a, p.thrust_b, p.thrust_c], [7.5, 3.0, 0.2], atol=1e-8)


def test_motor_model_bad_bench_data():
    with pytest.raises(HardwareError):
        fit_quadratic_motor_model(
            [BenchTestData(pwm_values=[0.1, 0.2], thrust_values=[1.0, 2.0])]
        )


# ---- motor mixer ----
def test_mixer_hover_allocation_symmetric():
    mx = MotorMixer(create_x_configuration())
    f = mx.allocate_thrusts(14.715, np.zeros(3))
    np.testing.assert_allclose(f, 14.715 / 4, rtol=1e-9)
    # wrench round trip
    w = mx.wrench_from_thrusts(f)
    np.testing.assert_allclose(w, [14.715, 0, 0, 0], atol=1e-9)


def test_mixer_torque_allocation_signs():
    mx = MotorMixer(create_x_configuration())
    # positive roll torque -> left motors (positive y) spin up? tau_x = sum F*y
    f = mx.allocate_thrusts(10.0, np.array([0.5, 0.0, 0.0]))
    w = mx.wrench_from_thrusts(f)
    np.testing.assert_allclose(w, [10.0, 0.5, 0.0, 0.0], atol=1e-9)
    f2 = mx.allocate_thrusts(10.0, np.array([0.0, 0.0, 0.1]))
    w2 = mx.wrench_from_thrusts(f2)
    np.testing.assert_allclose(w2, [10.0, 0.0, 0.0, 0.1], atol=1e-9)


def test_mixer_pwm_saturation_counting():
    mx = MotorMixer(create_x_configuration())
    pwm = mx.mix_commands(100.0, np.zeros(3))  # way over max thrust
    assert (pwm <= 1.0).all()
    assert mx.saturation_events == 1
    pwm2 = mx.mix_commands(10.0, np.zeros(3))
    assert (pwm2 > 0.0).all() and (pwm2 < 1.0).all()


def test_mixer_batch_allocation():
    mx = MotorMixer(create_x_configuration())
    thrust = np.full((8,), 12.0)
    torque = np.zeros((8, 3))
    f = mx.allocate_batch(thrust, torque)
    assert f.shape == (8, 4)
    np.testing.assert_allclose(f, 3.0, rtol=1e-9)


def test_mixer_validation():
    mx = MotorMixer(create_x_configuration())
    assert mx.validate_configuration() == []


# ---- latency buffer ----
def test_latency_buffer_delay():
    buf = LatencyBuffer(delay_s=0.05, dt=0.01)
    outs = [buf.push(i, timestamp=i * 0.01) for i in range(20)]
    # first 5 pushes echo input; afterwards output lags input by 5 samples
    assert outs[:5] == [0, 1, 2, 3, 4]
    assert outs[10] == 5 and outs[19] == 14
    assert buf.is_ready()
    assert buf.get_statistics()["actual_delay_s"] == pytest.approx(0.05)


# ---- vehicle IO ----
def test_factory_creates_simulated():
    v = VehicleIOFactory.create("simulated", {"initial_position": (0, 0, 0)})
    assert isinstance(v, SimulatedVehicleIO)
    with pytest.raises(HardwareError):
        VehicleIOFactory.create("warp-drive")


def test_simulated_vehicle_takeoff_flies():
    async def main():
        v = VehicleIOFactory.create("simulated")
        await v.connect()
        await v.arm()
        await v.takeoff(5.0)
        v.run_for(6.0)
        return v.get_state()

    state = asyncio.run(main())
    assert float(state.position[2]) > 3.0  # climbed toward 5 m


def test_simulated_vehicle_needs_arming():
    async def main():
        v = VehicleIOFactory.create("simulated")
        await v.connect()
        ok = await v.takeoff(5.0)  # not armed
        return ok

    assert asyncio.run(main()) is False


def test_safety_wrapper_rejects_bad_trajectories():
    async def main():
        inner = VehicleIOFactory.create("simulated")
        v = SafetyValidatedVehicleIO(inner, max_altitude=50.0, safety_radius=100.0)
        await v.connect()
        await v.arm()
        N = 20
        bad_alt = Trajectory(
            timestamps=jnp.arange(N, dtype=jnp.float32),
            positions=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 80.0]), (N, 3)),
        )
        with pytest.raises(ValidationError):
            await v.send_trajectory(bad_alt)
        bad_fence = Trajectory(
            timestamps=jnp.arange(N, dtype=jnp.float32),
            positions=jnp.broadcast_to(jnp.asarray([500.0, 0.0, 5.0]), (N, 3)),
        )
        with pytest.raises(ValidationError):
            await v.send_trajectory(bad_fence)
        with pytest.raises(ValidationError):
            await v.takeoff(60.0)
        return v.get_status()

    status = asyncio.run(main())
    assert status["rejected_commands"] == 3


# ---- mavlink (mocked) ----
def test_mavlink_adapter_with_mock():
    from dart_planner_tpu.hardware.mavlink_adapter import MavlinkVehicleIO

    mock_mavutil = MagicMock()
    conn = MagicMock()
    mock_mavutil.mavlink_connection.return_value = conn
    conn.wait_heartbeat.return_value = object()
    ack = MagicMock()
    ack.result = 0
    conn.recv_match.side_effect = lambda **kw: (
        ack if kw.get("type") == "COMMAND_ACK" else None
    )

    async def main():
        v = MavlinkVehicleIO({"connection_string": "udp:localhost:14550"},
                             mavutil=mock_mavutil)
        assert await v.connect()
        assert await v.arm()
        assert await v.takeoff(5.0)
        assert await v.land()
        await v.emergency_stop()
        return v

    v = asyncio.run(main())
    assert conn.mav.command_long_send.call_count == 4
    assert v.armed


def test_mavlink_adapter_requires_pymavlink():
    from dart_planner_tpu.hardware.mavlink_adapter import (
        MavlinkVehicleIO,
        _HAS_MAVLINK,
    )

    if not _HAS_MAVLINK:
        with pytest.raises(HardwareError):
            MavlinkVehicleIO({})


def test_safety_manager_catches_slow_unsafe_climb():
    """A climb toward an unsafe goal passes per-plan checks but the state
    monitor catches the breach (reference safety.py behavior)."""
    from dart_planner_tpu.common.types import DroneState
    from dart_planner_tpu.hardware import SafetyLimits, SafetyManager

    async def main():
        v = VehicleIOFactory.create("simulated")
        await v.connect()
        await v.arm()
        sm = SafetyManager(SafetyLimits(max_altitude=50.0))
        # simulate states climbing past the ceiling
        for z in (10.0, 30.0, 49.0, 51.0, 55.0):
            ok = await sm.monitor_safety(
                DroneState.create(position=(0.0, 0.0, z)), v
            )
        return sm, ok

    sm, ok = asyncio.run(main())
    assert not ok
    assert sm.get_safety_violations() == 2  # 51 and 55
    assert "altitude" in sm.last_violation


def test_safety_manager_velocity_envelope():
    from dart_planner_tpu.common.types import DroneState
    from dart_planner_tpu.hardware import SafetyManager

    sm = SafetyManager()
    bad = DroneState.create(velocity=(20.0, 0.0, 0.0))
    assert sm.check_state(bad) is not None
    assert "speed" in sm.check_state(bad)
