"""Monte-Carlo fleet with mapper-perceived worlds and in-flight sensing.

The full BASELINE config-4 pipeline at example scale: sample randomized
start/goal pairs and per-episode TRUE sphere worlds, perceive them
through the explicit voxel mapper (scans -> log-odds -> blob-suppressed
extraction), then fly every episode closed-loop in ONE batched
executable — 10 Hz SE(3) MPC replans, 400 Hz geometric control, wind,
sensor noise, and 3 m proximity sensing that reveals blind-spot spheres
mid-flight (the reference's 10 Hz in-flight mapper refresh,
/root/reference/src/dart_planner/cloud/main_improved_threelayer.py:206).

Runs anywhere (CPU included; the TPU fused kernels engage automatically
on TPU via method="auto"). bench.py runs the same pipeline at 2048
episodes on the chip.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dart_planner_tpu.planning import se3_mpc
from dart_planner_tpu.sim import (
    ClosedLoopConfig,
    WorldConfig,
    closed_loop,
    sample_worlds,
)
from dart_planner_tpu.sim.worlds import perceive_worlds


def main(episodes: int = 32):
    on_tpu = jax.default_backend() == "tpu"
    cfg = ClosedLoopConfig(
        # small horizon keeps the example quick on CPU; bench.py runs N=20
        mpc=se3_mpc.SE3MPCConfig(
            prediction_horizon=8, max_iterations=6, tail_iterations=0
        ),
        wind_mean=1.0,
        wind_std=0.5,
        sensor_noise_std=0.02,
        sense_radius=3.0,
        # unknown-space conservatism: cap planned speed to 2 m/s near
        # corridor regions the pre-flight scans never observed (the
        # mapper's prior-0.5 signal made actionable; see bench.py for
        # the measured crash-rate effect on the 2048-episode fleet)
        unknown_speed_cap=2.0,
    )
    wc = WorldConfig()
    key = jax.random.PRNGKey(0)
    start = jnp.asarray([0.0, 0.0, 3.0])
    goal = jnp.asarray([6.0, 3.0, 4.0])

    k_fleet, k_world = jax.random.split(key)
    ep_key, states, goals = closed_loop.sample_fleet(
        k_fleet, episodes, start, goal
    )
    tobs, tmask = sample_worlds(wc, k_world, episodes, states.position, goals)
    pobs, pmask, corridor_cov = perceive_worlds(
        wc, tobs, tmask, states.position, goals,
        max_obstacles=cfg.mpc.max_obstacles,
        corridor_samples=wc.corridor_samples,
    )

    res = closed_loop.simulate_episode(
        cfg, ep_key, states, goals,
        obstacles=pobs, obstacle_mask=pmask,
        method="auto" if on_tpu else "xla",
        true_obstacles=tobs, true_obstacle_mask=tmask,
        corridor_observed=corridor_cov,
    )
    print(f"episodes:        {episodes}")
    print(f"success rate:    {float(jnp.mean(res.success)):.3f}")
    print(f"crash rate:      {float(jnp.mean(res.crashed)):.3f}")
    print(f"tracking RMSE:   {float(jnp.mean(res.tracking_rmse)):.3f} m")
    print(
        "min true-sphere clearance (fleet mean): "
        f"{float(jnp.mean(res.min_obstacle_clearance)):.2f} m"
    )
    print(f"final distance p50: "
          f"{float(jnp.median(res.final_distance)):.2f} m")


if __name__ == "__main__":
    main()
