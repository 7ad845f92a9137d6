"""Hardware mission orchestration (hardware/mission.py).

Mirrors the reference's mission coverage: the mocked-MAVLink mission of
tests/test_pixhawk_interface.py:384 (start/stop over a fake link) and
the gathered control/planning/telemetry/safety loop structure of
pixhawk_interface.py:297-314, plus the failsafe paths (:678-713).
"""

import asyncio
import time

import numpy as np
import pytest

from dart_planner_tpu.hardware.mission import (
    MissionConfig,
    MissionRunner,
    start_mission,
)
from dart_planner_tpu.hardware.simulated_vehicle import SimulatedVehicleIO


def _sim_vehicle(control_dt=0.01, z0=2.0):
    return SimulatedVehicleIO(
        {"initial_position": (0.0, 0.0, z0), "control_dt": control_dt}
    )


def _fast_config(**kw):
    base = dict(
        control_frequency=100.0,
        planning_frequency=10.0,
        waypoint_tolerance=0.8,
        mission_timeout_s=240.0,
    )
    base.update(kw)
    return MissionConfig(**base)


def test_simulated_mission_to_completion():
    """Full mission: connect -> arm -> 2 waypoints -> complete, through
    the 4-loop orchestrator on the in-process vehicle. Wall-clock
    coupled, so retried once (same policy as tests/test_apps.py)."""
    last = None
    for _ in range(2):
        try:
            _run_sim_mission()
            return
        except AssertionError as e:
            last = e
    raise last


def _run_sim_mission():
    async def main():
        vehicle = _sim_vehicle()
        await vehicle.connect()
        await vehicle.arm()
        vehicle.step()  # pre-warm control-path compiles
        runner = MissionRunner(vehicle, _fast_config())
        report = await runner.start_mission(
            [(3.0, 0.0, 3.0), (3.0, 3.0, 3.0)]
        )
        return vehicle, runner, report

    vehicle, runner, report = asyncio.run(main())
    assert report["mission_complete"], report
    assert report["waypoints_reached"] == 2
    assert report["failsafe_reason"] is None
    assert report["planning_failures"] == 0
    assert report["commands_sent"] > 50
    assert report["telemetry_rows"] > 3
    # scheduler accounting came through the quartic integration layer
    assert report["scheduler"]["tasks"]["control"]["execution_count"] > 50


def test_mission_requires_connection():
    async def main():
        vehicle = _sim_vehicle()
        runner = MissionRunner(vehicle, _fast_config())
        with pytest.raises(RuntimeError, match="not connected"):
            await runner.start_mission([(1.0, 0.0, 2.0)])

    asyncio.run(main())


def test_failsafe_on_altitude_violation():
    """Safety monitor envelope check (PX:705): a waypoint above the
    ceiling drives the vehicle through it -> failsafe + landed."""

    async def main():
        vehicle = _sim_vehicle()
        await vehicle.connect()
        await vehicle.arm()
        vehicle.step()
        runner = MissionRunner(
            vehicle, _fast_config(max_altitude=2.5, mission_timeout_s=120.0)
        )
        report = await runner.start_mission([(0.0, 0.0, 6.0)])
        return report

    report = asyncio.run(main())
    assert not report["mission_complete"]
    assert "altitude" in (report["failsafe_reason"] or ""), report


def test_saturation_watchdog_catches_unstable_control():
    """The motor-saturation watchdog (PX:408-411). At control_dt=0.02
    the attitude loop (gains tuned for 400 Hz) chatters at the torque
    limit; the mixer counts the saturated allocations and the watchdog
    must ground the mission instead of flying a chattering vehicle."""

    async def main():
        vehicle = _sim_vehicle(control_dt=0.02)
        await vehicle.connect()
        await vehicle.arm()
        vehicle.step()
        runner = MissionRunner(
            vehicle,
            _fast_config(
                saturation_watchdog_threshold=25, mission_timeout_s=120.0
            ),
        )
        report = await runner.start_mission([(3.0, 0.0, 3.0)])
        return report

    report = asyncio.run(main())
    assert not report["mission_complete"]
    assert "saturation" in (report["failsafe_reason"] or ""), report
    assert report["saturation_events"] > 25


def test_stop_mission_lands():
    async def main():
        vehicle = _sim_vehicle()
        await vehicle.connect()
        await vehicle.arm()
        runner = MissionRunner(vehicle, _fast_config())
        task = asyncio.create_task(
            runner.start_mission([(50.0, 0.0, 3.0)])  # far: won't finish
        )
        await asyncio.sleep(1.0)
        await runner.stop_mission()
        report = await asyncio.wait_for(task, timeout=30.0)
        return report

    report = asyncio.run(main())
    assert not report["mission_complete"]


# ------------------------------------------------------- mocked MAVLink

class _ScriptedMavlink:
    """Minimal pymavlink stand-in: heartbeats, COMMAND_ACKs, and a
    scripted LOCAL_POSITION_NED walk toward a target (the role of
    MockMAVLinkConnection in the reference's test_pixhawk_interface.py:30)."""

    class _Msg:
        def __init__(self, msg_type, **kw):
            self._t = msg_type
            self.__dict__.update(kw)

        def get_type(self):
            return self._t

    def __init__(self, goal_enu, travel_s=3.0, heartbeat_until=1e9):
        self.goal = np.asarray(goal_enu, float)
        self.start = np.array([0.0, 0.0, 2.0])
        self.travel_s = travel_s
        self.heartbeat_until = heartbeat_until
        self.t0 = None
        self._cycle = 0
        self.body_rate_targets = 0
        self.target_system = 1
        self.target_component = 1
        self.mav = self  # .mav.* methods live on self

    # -- transport factory surface --
    def mavlink_connection(self, *a, **kw):
        return self

    def wait_heartbeat(self, timeout=None):
        self.t0 = time.time()
        return object()

    def close(self):
        pass

    # -- mav.* senders --
    def request_data_stream_send(self, *a):
        pass

    def command_long_send(self, *a):
        pass

    def set_attitude_target_send(self, *a):
        self.body_rate_targets += 1

    # -- receive side --
    def _pos_enu(self):
        u = min((time.time() - self.t0) / self.travel_s, 1.0)
        return self.start + u * (self.goal - self.start)

    def recv_match(self, type=None, blocking=False, timeout=None):
        if type == "COMMAND_ACK":
            return self._Msg("COMMAND_ACK", result=0)
        self._cycle = (self._cycle + 1) % 4
        if self._cycle == 1:
            p = self._pos_enu()
            v = (self.goal - self.start) / self.travel_s
            return self._Msg(
                "LOCAL_POSITION_NED",
                x=p[0], y=p[1], z=-p[2],  # adapter flips NED z -> ENU
                vx=v[0], vy=v[1], vz=-v[2],
            )
        if self._cycle == 2:
            return self._Msg(
                "ATTITUDE",
                roll=0.0, pitch=0.0, yaw=0.0,
                rollspeed=0.0, pitchspeed=0.0, yawspeed=0.0,
            )
        if self._cycle == 3 and time.time() - self.t0 < self.heartbeat_until:
            return self._Msg("HEARTBEAT")
        return None


def test_mocked_mavlink_mission_to_completion():
    """The full reference mission call stack (SURVEY section 3.4) over a
    mocked MAVLink link: connect -> arm -> start_mission -> 400 Hz
    body-rate targets + 50 Hz replans -> waypoint reached."""
    from dart_planner_tpu.hardware.mavlink_adapter import MavlinkVehicleIO

    goal = (2.0, 0.0, 3.0)
    mock = _ScriptedMavlink(goal_enu=goal, travel_s=3.0)

    async def main():
        vehicle = MavlinkVehicleIO(
            {"connection_string": "udp:mock"}, mavutil=mock
        )
        await vehicle.connect()
        report = await start_mission(
            vehicle,
            [goal],
            config=_fast_config(
                planning_frequency=5.0, mission_timeout_s=60.0
            ),
        )
        return vehicle, report

    vehicle, report = asyncio.run(main())
    assert report["mission_complete"], report
    assert report["waypoints_reached"] == 1
    assert mock.body_rate_targets > 10  # the 400 Hz loop actually ran
    assert report["avg_planning_time_ms"] > 0.0
    assert vehicle.armed  # runner armed the vehicle itself


def test_mocked_mavlink_heartbeat_loss_failsafe():
    """Heartbeat loss -> failsafe (PX:689): the scripted link stops
    heartbeating; the safety monitor must ground the mission."""
    from dart_planner_tpu.hardware.mavlink_adapter import MavlinkVehicleIO

    # vehicle crawls (travel_s huge) and the link dies after 0.5 s
    mock = _ScriptedMavlink(
        goal_enu=(30.0, 0.0, 3.0), travel_s=1e6, heartbeat_until=0.5
    )

    async def main():
        vehicle = MavlinkVehicleIO(
            {"connection_string": "udp:mock"}, mavutil=mock
        )
        await vehicle.connect()
        runner = MissionRunner(
            vehicle,
            _fast_config(
                planning_frequency=5.0,
                heartbeat_timeout_s=1.0,
                mission_timeout_s=60.0,
            ),
        )
        return await runner.start_mission([(30.0, 0.0, 3.0)])

    report = asyncio.run(main())
    assert not report["mission_complete"]
    assert report["failsafe_reason"] == "heartbeat lost", report
