"""End-to-end three-layer mission THROUGH the RT control layer.

The integration the reference exercises via its SITL suite
(/root/reference/tests/test_dart_sitl_comprehensive.py:1): L1
GlobalMissionPlanner goals -> L2 SE(3) MPC plans -> trajectory smoother
-> the real-time control-loop executor (C++ `native/rt_executor.cpp`
when built, the Python fallback otherwise) -> simulated rigid-body
plant flying on the loop's thrust/body-rate commands. Asserts the
mission progresses through its waypoints and the RT loop's deadline
accounting stays sane.

Wall-clock coupled (the RT loop is a real thread) — retried once, same
policy as tests/test_apps.py.
"""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from dart_planner_tpu.common.types import DroneState
from dart_planner_tpu.control.smoother import TrajectorySmoother
from dart_planner_tpu.ops import so3
from dart_planner_tpu.planning.global_mission import (
    GlobalMissionPlanner,
    MissionPhase,
    SemanticWaypoint,
)
from dart_planner_tpu.planning.se3_mpc import SE3MPCConfig, SE3MPCPlanner
from dart_planner_tpu.runtime.rt_executor import create_control_loop

GRAVITY = np.array([0.0, 0.0, -9.81])
MASS = 1.5


class _Plant:
    """Minimal rigid plant flown on thrust + body-rate commands (the
    actuation interface the RT loop outputs, matching PX4 offboard
    body-rate control)."""

    def __init__(self, position):
        self.pos = np.asarray(position, float)
        self.vel = np.zeros(3)
        self.att = np.zeros(3)  # roll, pitch, yaw

    def step(self, thrust, rates, dt):
        self.att = self.att + np.asarray(rates) * dt
        self.att[:2] = np.clip(self.att[:2], -0.6, 0.6)
        R = np.asarray(
            so3.euler_to_rotmat(jnp.asarray(self.att, jnp.float32))
        )
        acc = R @ np.array([0.0, 0.0, float(thrust)]) / MASS + GRAVITY
        self.vel = self.vel + acc * dt
        self.pos = self.pos + self.vel * dt

    def drone_state(self, t):
        return DroneState.create(
            timestamp=t,
            position=self.pos,
            velocity=self.vel,
            attitude=self.att,
        )


def _attitude_setpoint(acc_des):
    """Desired attitude + thrust from the smoothed acceleration
    setpoint — direct differential-flatness formulas at yaw 0 (the
    library's thrust_yaw_to_rotmat reproduces the reference's -90deg
    yaw convention by design, which would couple this plant's axes)."""
    u = MASS * (np.asarray(acc_des, float) - GRAVITY)
    pitch = np.arctan2(u[0], max(u[2], 1e-6))
    roll = np.arctan2(-u[1], float(np.hypot(u[0], u[2])))
    return np.array([roll, pitch, 0.0]), float(np.linalg.norm(u))


def test_three_layer_mission_through_rt_executor():
    last = None
    for _ in range(2):
        try:
            _run()
            return
        except AssertionError as e:
            last = e
    raise last


def _run():
    mission = GlobalMissionPlanner()
    mission.set_mission_waypoints(
        [
            SemanticWaypoint((3.0, 0.0, 3.0), "survey_corner"),
            SemanticWaypoint((3.0, 3.0, 3.0), "goal_pad"),
        ]
    )
    planner = SE3MPCPlanner(SE3MPCConfig())
    smoother = TrajectorySmoother()
    loop = create_control_loop(frequency_hz=200.0, prefer_native=True)
    loop.set_gains(
        [1.5, 1.5, 4.0], [0.0, 0.0, 0.2], [1.0, 1.0, 2.5],
        [6.0, 6.0, 3.0], [0.0, 0.0, 0.0], [0.5, 0.5, 0.3],
    )

    plant = _Plant([0.0, 0.0, 0.5])
    phases_seen = set()
    waypoints_hit = 0

    # pre-warm the jit compiles outside the timed mission
    st = plant.drone_state(0.0)
    traj = planner.plan_trajectory(st, mission.get_current_goal(st))
    smoother.update_trajectory(traj, 0.0)
    smoother.get_desired_state(0.0, st)
    _attitude_setpoint([0.0, 0.0, 0.0])

    loop.start()
    try:
        t0 = time.perf_counter()
        last_plan = -1.0
        last_tick = t0
        deadline = t0 + 45.0
        goal = None
        while time.perf_counter() < deadline:
            now = time.perf_counter() - t0
            st = plant.drone_state(now)
            phases_seen.add(mission.current_phase)
            if now - last_plan >= 0.1:  # 10 Hz replans (L1 + L2)
                goal = mission.get_current_goal(st)
                traj = planner.plan_trajectory(st, goal)
                traj = traj.replace(
                    timestamps=traj.timestamps
                    - traj.timestamps[..., 0]
                    + now
                )
                smoother.update_trajectory(traj, now)
                last_plan = now
            # smoothed setpoint -> RT loop -> plant (inner tick).
            # Attitude setpoint carries the lateral position feedback
            # (the C++ loop's PID only corrects thrust/z — the
            # reference's simplified fast loop, rt_executor.cpp:252-267);
            # this PD term is the L3 geometric controller's role.
            pos_d, vel_d, acc_d = smoother.get_desired_state(now, st)
            acc_cmd = (
                np.asarray(acc_d, float)
                + 2.5 * (np.asarray(pos_d, float) - plant.pos)
                + 3.0 * (np.asarray(vel_d, float) - plant.vel)
            )
            att_d, thrust_ff = _attitude_setpoint(acc_cmd)
            loop.set_state(plant.pos, plant.vel, plant.att, np.zeros(3))
            loop.set_setpoint(
                np.asarray(pos_d), np.asarray(vel_d), att_d,
                np.zeros(3), thrust_ff=thrust_ff,
            )
            cmd = loop.get_command()
            t_now = time.perf_counter()
            dt = min(t_now - last_tick, 0.05)
            last_tick = t_now
            if cmd is not None:
                plant.step(
                    cmd["thrust"],
                    [cmd["roll_rate"], cmd["pitch_rate"], cmd["yaw_rate"]],
                    dt,
                )
            if goal is not None and np.linalg.norm(
                plant.pos - np.asarray(goal)
            ) < 0.6:
                waypoints_hit += 1
            if mission.current_phase in (
                MissionPhase.LANDING, MissionPhase.EMERGENCY,
            ):
                break
            time.sleep(0.004)
    finally:
        loop.stop()

    stats = loop.get_stats()
    # the mission progressed through the layer stack: takeoff happened,
    # navigation engaged, and the plant reached goals en route
    assert MissionPhase.TAKEOFF in phases_seen
    assert MissionPhase.NAVIGATION in phases_seen, phases_seen
    assert waypoints_hit > 0, (
        f"plant never reached a goal; pos={plant.pos}, phases={phases_seen}"
    )
    assert mission.current_phase is MissionPhase.LANDING, (
        mission.current_phase, plant.pos,
    )
    # RT-layer health: the loop really ran, and deadline misses did not
    # explode (generous bound — CI boxes are heavily derated)
    assert stats["iteration_count"] > 500, stats
    assert stats["missed_deadlines"] <= 0.5 * stats["iteration_count"], stats
    # planner health through the whole mission
    pstats = planner.get_planning_stats()
    assert pstats["success_rate"] > 0.9, pstats
