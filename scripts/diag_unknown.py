"""Calibrate the unknown-space speed cap (VERDICT round-3 item 3).

Runs the bench config-4 fleet (randomized starts/goals/wind/noise +
mapper-perceived obstacle worlds + 3 m in-flight proximity sensing) at
several ``unknown_speed_cap`` settings and reports success / crash /
RMSE, plus the corridor-coverage census the cap keys on.

Usage: python scripts/diag_unknown.py [--episodes 2048] [--caps 0,5,4,3]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=2048)
    ap.add_argument("--caps", type=str, default="0,5,4,3")
    ap.add_argument("--method", type=str, default="auto")
    # defaults = the SHIPPED ClosedLoopConfig values (margin 1.5,
    # coverage 0.6) so rerunning the sweep with no flags reproduces
    # the production setting (docs/quality.md)
    ap.add_argument("--margin", type=float, default=1.5)
    ap.add_argument("--ramp", type=float, default=3.0)
    ap.add_argument("--coverage", type=float, default=0.6)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dart_planner_tpu.sim import ClosedLoopConfig, WorldConfig
    from dart_planner_tpu.sim import closed_loop, sample_worlds
    from dart_planner_tpu.sim.worlds import perceive_worlds

    print(f"platform={jax.devices()[0].platform} episodes={args.episodes}")

    wc = WorldConfig()
    n = args.episodes
    key = jax.random.PRNGKey(args.seed)
    start = jnp.asarray([0.0, 0.0, 3.0])
    goal = jnp.asarray([6.0, 3.0, 4.0])
    k_fleet, k_world = jax.random.split(key)
    ep_key, states, goals = closed_loop.sample_fleet(k_fleet, n, start, goal)
    tobs, tmask = sample_worlds(wc, k_world, n, states.position, goals)
    pobs, pmask, cov = perceive_worlds(
        wc, tobs, tmask, states.position, goals,
        max_obstacles=8, corridor_samples=wc.corridor_samples,
    )
    cov_np = np.asarray(cov)
    unk = cov_np < 0.5
    print(
        f"corridor coverage: mean={cov_np.mean():.3f} "
        f"p10={np.percentile(cov_np, 10):.3f} "
        f"samples-unknown={unk.mean():.3f} "
        f"episodes-with-unknown={(unk.any(axis=1)).mean():.3f}"
    )

    base = ClosedLoopConfig(
        wind_mean=1.0, wind_std=0.5, sensor_noise_std=0.02, sense_radius=3.0,
        unknown_margin=args.margin, unknown_ramp=args.ramp,
        unknown_coverage=args.coverage,
    )
    print(
        f"margin={args.margin} ramp={args.ramp} coverage={args.coverage}"
    )
    header = (
        f"{'cap':>5s} {'success':>8s} {'crash':>7s} {'rmse':>7s} "
        f"{'clear':>7s} {'final_d p95':>11s} {'wall_s':>7s}"
    )
    print(header)
    for cap in [float(c) for c in args.caps.split(",")]:
        cfg = base._replace(unknown_speed_cap=cap)
        co = cov if cap > 0 else None
        t0 = time.perf_counter()
        res = closed_loop.simulate_episode(
            cfg, ep_key, states, goals, obstacles=pobs,
            obstacle_mask=pmask, method=args.method, true_obstacles=tobs,
            true_obstacle_mask=tmask, corridor_observed=co,
        )
        jax.block_until_ready(res.final_distance)
        wall = time.perf_counter() - t0
        fd = np.asarray(res.final_distance)
        print(
            f"{cap:5.1f} {float(jnp.mean(res.success)):8.4f} "
            f"{float(jnp.mean(res.crashed)):7.4f} "
            f"{float(jnp.mean(res.tracking_rmse)):7.4f} "
            f"{float(jnp.mean(res.min_obstacle_clearance)):7.3f} "
            f"{np.percentile(fd, 95):11.3f} {wall:7.1f}"
        )

    # Do uncapped crashes happen near unknown corridor samples? (signal
    # coverage check: if crashes cluster on unknown-adjacent episodes,
    # the cap is hitting the right cohort.)
    res0 = closed_loop.simulate_episode(
        base, ep_key, states, goals, obstacles=pobs, obstacle_mask=pmask,
        method=args.method, true_obstacles=tobs, true_obstacle_mask=tmask,
    )
    crashed = np.asarray(res0.crashed)
    if crashed.any():
        print(
            "uncapped crash episodes: "
            f"{crashed.sum()} total; with >=1 unknown corridor sample: "
            f"{unk.any(axis=1)[crashed].mean():.3f} "
            f"(fleet-wide base rate {(unk.any(axis=1)).mean():.3f})"
        )


if __name__ == "__main__":
    main()
