"""AirSim interface (mock client), motor latency calibration, and the
secure hardware gate (reference airsim_interface.py,
motor_latency_calibration.py, secure_hardware_interface.py)."""

import asyncio
import time
from types import SimpleNamespace

import numpy as np
import pytest

from dart_planner_tpu.common.errors import (
    HardwareError,
    SecurityError,
    UnsupportedCommandError,
)
from dart_planner_tpu.common.types import ControlCommand
from dart_planner_tpu.hardware import (
    AirSimDroneInterface,
    AirSimVehicleIO,
    MotorLatencyCalibrator,
    SecureHardwareInterface,
    SimulatedVehicleIO,
    VehicleIOFactory,
)
from dart_planner_tpu.hardware.secure_interface import ConnectionState
from dart_planner_tpu.security.auth import AuthManager, Role


def run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


# -- mock AirSim client ----------------------------------------------


class _Future:
    def join(self):
        return None


class MockAirSimClient:
    def __init__(self):
        self.calls = []
        self.api_control = False
        self.armed = False

    def confirmConnection(self):
        self.calls.append("confirm")

    def enableApiControl(self, on, name=""):
        self.api_control = on

    def armDisarm(self, arm, name=""):
        self.armed = arm

    def getMultirotorState(self, name=""):
        vec = lambda x, y, z: SimpleNamespace(x_val=x, y_val=y, z_val=z)  # noqa
        quat = SimpleNamespace(w_val=1.0, x_val=0.0, y_val=0.0, z_val=0.0)
        return SimpleNamespace(
            kinematics_estimated=SimpleNamespace(
                position=vec(1.0, 2.0, -3.0),  # NED
                linear_velocity=vec(0.1, 0.2, -0.3),
                angular_velocity=vec(0.0, 0.0, 0.0),
                orientation=quat,
            )
        )

    def moveByAngleRatesThrottleAsync(self, *a, **kw):
        self.calls.append(("rates", a))
        return _Future()

    def takeoffAsync(self, **kw):
        self.calls.append("takeoff")
        return _Future()

    def moveToZAsync(self, *a, **kw):
        return _Future()

    def landAsync(self, **kw):
        self.calls.append("land")
        return _Future()

    def hoverAsync(self, name=""):
        self.calls.append("hover")
        return _Future()

    def simPause(self, on):
        self.calls.append(("pause", on))


def test_airsim_requires_client_or_package():
    with pytest.raises(HardwareError):
        AirSimDroneInterface()


def test_airsim_state_ned_to_enu_conversion():
    iface = AirSimDroneInterface(client=MockAirSimClient())
    run(iface.connect())
    st = run(iface.get_state())
    # NED (n=1, e=2, d=-3) -> ENU (e=2, n=1, u=3)
    np.testing.assert_allclose(np.asarray(st.position), [2.0, 1.0, 3.0])
    np.testing.assert_allclose(np.asarray(st.velocity), [0.2, 0.1, 0.3])


def test_airsim_command_and_metrics():
    client = MockAirSimClient()
    iface = AirSimDroneInterface(client=client)
    # rejected before connect
    cmd = ControlCommand(
        thrust=np.float32(10.0), torque=np.zeros(3, np.float32)
    )
    assert not run(iface.send_control_command(cmd))
    run(iface.connect())
    assert run(iface.send_control_command(cmd))
    m = iface.get_performance_metrics()
    assert m["counters"]["commands_sent"] == 1
    assert m["counters"]["command_rejected"] == 1


def test_airsim_vehicle_io_registered_and_mission():
    assert "airsim" in VehicleIOFactory.list_available()
    vio = AirSimVehicleIO(client=MockAirSimClient())
    run(vio.connect())
    run(vio.takeoff(3.0))
    assert vio.iface.armed
    st = run(vio.poll_state())
    assert vio.get_state() is st
    run(vio.land())
    assert not vio.iface.armed
    status = vio.get_status()
    assert status["connected"] and not status["armed"]


# -- motor latency calibration ---------------------------------------


class FakeStepAdapter:
    """Actuator model: holds the previous output during the latency window,
    then settles at the new target (alternating steps up/down)."""

    def __init__(self, latency_s=0.005):
        self.latency_s = latency_s
        self._cmd_time = None
        self._current = 0.0
        self._target = 0.0

    def send_test_command(self, cmd):
        self._current = self.get_response_state()["throttle"]
        self._target = (
            0.0 if self._current > 0 else cmd["magnitude"]
        )  # toggle so every step is observable
        self._cmd_time = time.perf_counter()

    def get_response_state(self):
        if (
            self._cmd_time is not None
            and time.perf_counter() - self._cmd_time >= self.latency_s
        ):
            return {"throttle": self._target}
        return {"throttle": self._current}


def test_latency_calibration_measures_step_response():
    cal = MotorLatencyCalibrator(
        FakeStepAdapter(latency_s=0.005),
        config={"num_samples": 6, "settle_time_s": 0.0},
    )
    result = cal.calibrate_latency()
    assert result.num_samples == 6
    assert 4.0 <= result.mean_latency_ms <= 30.0
    assert result.recommended_max_latency_ms >= result.mean_latency_ms
    lo, hi = result.confidence_interval_ms
    assert lo <= result.mean_latency_ms <= hi
    assert result.quality in ("excellent", "good", "acceptable")
    report = cal.get_calibration_report()
    assert report["status"] == "calibrated"


def test_latency_calibration_timeout_gives_poor():
    class DeadAdapter:
        def send_test_command(self, cmd):
            pass

        def get_response_state(self):
            return {"throttle": 0.0}

    cal = MotorLatencyCalibrator(
        DeadAdapter(),
        config={"num_samples": 2, "timeout_s": 0.02, "settle_time_s": 0.0},
    )
    result = cal.calibrate_latency()
    assert result.num_samples == 0
    assert result.quality == "poor"


# -- secure hardware interface ---------------------------------------


@pytest.fixture
def secure_env():
    auth = AuthManager()
    auth.register_user("op", "pw-op-123", Role.OPERATOR)
    auth.register_user("watch", "pw-watch-1", Role.VIEWER)
    op_token = auth.create_access_token(auth.authenticate("op", "pw-op-123"))
    view_token = auth.create_access_token(
        auth.authenticate("watch", "pw-watch-1")
    )
    shi = SecureHardwareInterface(SimulatedVehicleIO(), auth)
    return shi, op_token, view_token


def test_secure_command_permissions(secure_env):
    shi, op_token, view_token = secure_env
    run(shi.connect(op_token))
    assert shi.state == ConnectionState.CONNECTED
    assert run(shi.send_secure_command(op_token, "arm"))
    with pytest.raises(SecurityError):
        run(shi.send_secure_command(view_token, "arm"))
    with pytest.raises(UnsupportedCommandError):
        run(shi.send_secure_command(op_token, "warp_drive"))
    log = shi.get_command_audit_log(op_token)
    statuses = [(e["command_type"], e["status"]) for e in log]
    assert ("arm", "executed") in statuses
    assert ("arm", "denied") in statuses


def test_emergency_stop_blocks_until_reauth(secure_env):
    shi, op_token, view_token = secure_env
    run(shi.connect(op_token))
    # viewers may trigger the stop
    assert run(shi.emergency_stop(view_token))
    assert shi.get_connection_status()["emergency_stop_engaged"]
    with pytest.raises(SecurityError):
        run(shi.send_secure_command(op_token, "takeoff"))
    # disengage requires operator re-auth with valid password
    with pytest.raises(SecurityError):
        shi.disengage_emergency_stop(op_token, "op", "wrong")
    assert shi.disengage_emergency_stop(op_token, "op", "pw-op-123")
    assert shi.state == ConnectionState.CONNECTED
    assert run(shi.send_secure_command(op_token, "arm"))


def test_secure_telemetry(secure_env):
    shi, op_token, view_token = secure_env
    run(shi.connect(view_token))
    tele = shi.get_secure_telemetry(view_token)
    assert tele["connection_state"] == "connected"
    assert tele["emergency_stop_engaged"] is False


def test_estop_latches_via_send_secure_command(secure_env):
    """emergency_stop through the generic command channel must latch the
    software estop exactly like the dedicated method."""
    shi, op_token, _ = secure_env
    run(shi.connect(op_token))
    assert run(shi.send_secure_command(op_token, "emergency_stop"))
    assert shi.get_connection_status()["emergency_stop_engaged"]
    with pytest.raises(SecurityError):
        run(shi.send_secure_command(op_token, "arm"))


def test_airsim_attitude_ned_to_enu():
    """East-facing drone: NED yaw=+pi/2 must become ENU yaw=0."""
    import numpy as _np
    from types import SimpleNamespace as NS

    client = MockAirSimClient()
    # NED quaternion for yaw=+pi/2 about D: (w, z) = (cos(pi/4), sin(pi/4))
    q = NS(w_val=_np.cos(_np.pi / 4), x_val=0.0, y_val=0.0,
           z_val=_np.sin(_np.pi / 4))
    base = client.getMultirotorState()

    def east_state(name=""):
        k = base.kinematics_estimated
        return NS(kinematics_estimated=NS(
            position=k.position, linear_velocity=k.linear_velocity,
            angular_velocity=k.angular_velocity, orientation=q))

    client.getMultirotorState = east_state
    iface = AirSimDroneInterface(client=client)
    run(iface.connect())
    st = run(iface.get_state())
    assert abs(float(np.asarray(st.attitude)[2])) < 1e-6  # ENU yaw = 0
