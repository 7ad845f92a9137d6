"""Pure-software vehicle (reference hardware/simulated_vehicle_io.py).

Runs the rigid-body physics + geometric controller + trajectory smoother
in-process: ``send_trajectory`` feeds the smoother, ``step(dt)`` advances
the closed loop. Registered as ``"simulated"`` in the
:class:`~dart_planner_tpu.hardware.vehicle_io.VehicleIOFactory` exactly
like the reference (simulated_vehicle_io.py registration).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from dart_planner_tpu.common.types import DroneState, Trajectory
from dart_planner_tpu.control import geometric
from dart_planner_tpu.control.smoother import (
    SmootherConfig,
    SmootherState,
    get_desired_state,
    update_trajectory,
)
from dart_planner_tpu.hardware.vehicle_io import VehicleIO, VehicleIOFactory
from dart_planner_tpu.sim import physics as phys


class SimulatedVehicleIO(VehicleIO):
    """(reference simulated_vehicle_io.py:1-329)"""

    def __init__(self, config: Optional[dict] = None):
        super().__init__(config)
        cfg = config or {}
        self.physics = phys.PhysicsConfig(
            mass=cfg.get("mass", 1.5), max_thrust=cfg.get("max_thrust", 25.0)
        )
        self.controller_config = geometric.GeometricConfig(
            mass=self.physics.mass, max_thrust=self.physics.max_thrust
        )
        horizon = cfg.get("horizon", 20)
        # long failsafe: one-shot trajectories (takeoff/land) must finish
        # without 10 Hz re-feeds; real missions replan far faster anyway
        self.smoother_config = SmootherConfig(failsafe_timeout=60.0)
        self._reset_state(cfg.get("initial_position", (0.0, 0.0, 0.0)), horizon)
        self.sim_time = 0.0
        self.control_dt = cfg.get("control_dt", 0.0025)  # 400 Hz
        self.last_command = None

    def _reset_state(self, position, horizon: int) -> None:
        self.rb = phys.RigidBodyState.from_drone_state(
            DroneState.create(position=position)
        )
        self.ctrl_state = geometric.ControllerState.zeros(self.controller_config)
        self.smoother_state = SmootherState.zeros(horizon)

    # -- VehicleIO interface --
    async def connect(self) -> bool:
        self.connected = True
        return True

    async def disconnect(self) -> None:
        self.connected = False

    def get_state(self) -> Optional[DroneState]:
        return self.rb.to_drone_state(self.sim_time)

    async def send_trajectory(self, trajectory: Trajectory) -> bool:
        if not self.armed:
            return False
        self.smoother_state = update_trajectory(
            self.smoother_config, self.smoother_state, trajectory, self.sim_time
        )
        return True

    async def arm(self) -> bool:
        self.armed = True
        return True

    async def disarm(self) -> bool:
        self.armed = False
        return True

    async def takeoff(self, altitude: float) -> bool:
        if not self.armed:
            return False
        p = np.asarray(self.rb.position)
        target = np.array([p[0], p[1], altitude], np.float32)
        N = self.smoother_state.positions.shape[0]
        ts = self.sim_time + 0.2 * np.arange(N)
        alpha = np.linspace(0, 1, N)[:, None]
        traj = Trajectory(
            timestamps=jnp.asarray(ts, jnp.float32),
            positions=jnp.asarray((1 - alpha) * p + alpha * target, jnp.float32),
            velocities=jnp.zeros((N, 3), jnp.float32),
            accelerations=jnp.zeros((N, 3), jnp.float32),
        )
        return await self.send_trajectory(traj)

    async def land(self) -> bool:
        p = np.asarray(self.rb.position)
        return await self.takeoff(0.0) if self.armed else False

    async def emergency_stop(self) -> None:
        """Cut motors (reference emergency behavior)."""
        self.armed = False

    # -- simulation stepping (software-only extension) --
    def step(self, dt: Optional[float] = None) -> DroneState:
        """Advance one control tick: smoother -> controller -> physics."""
        dt = dt or self.control_dt
        ds = self.rb.to_drone_state(self.sim_time)
        (pos_d, vel_d, acc_d), self.smoother_state = get_desired_state(
            self.smoother_config,
            self.smoother_state,
            jnp.asarray(self.sim_time, jnp.float32),
            ds,
        )
        sp = geometric.ControlSetpoint(
            position=pos_d,
            velocity=vel_d,
            acceleration=acc_d,
            yaw=jnp.zeros(()),
            yaw_rate=jnp.zeros(()),
        )
        cmd, self.ctrl_state = geometric.compute_control(
            self.controller_config, self.ctrl_state, ds, sp, dt
        )
        if not self.armed:
            cmd = cmd.replace(thrust=jnp.zeros_like(cmd.thrust))
        # expose the actuated wrench for external watchdogs (the mission
        # runner's motor-saturation monitor, hardware/mission.py)
        self.last_command = cmd
        self.rb = phys.rigid_body_step(self.physics, self.rb, cmd, dt)
        self.sim_time += dt
        return self.get_state()

    def run_for(self, duration: float) -> DroneState:
        steps = int(duration / self.control_dt)
        for _ in range(steps):
            self.step()
        return self.get_state()


VehicleIOFactory.register("simulated", SimulatedVehicleIO)
