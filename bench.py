"""Headline benchmark: batched SE(3) MPC throughput (solves/s/chip, N=20).

Prints ONE JSON line. ``vs_baseline`` is measured throughput over the
north-star target of 1,000 solves/s/chip (BASELINE.md); extra fields record
the single-solve device latency against the reference's 50 ms real-time
budget (/root/reference/tests/test_real_time_latency.py:109-120).

Timing methodology: the dev TPU sits behind a network tunnel on which
``block_until_ready`` can return before execution finishes, so naive
per-call timing measures enqueue, not compute. Instead each measurement
dispatches a *data-dependent chain* of R solves (the warm-start output of
solve k feeds solve k+1, so the device must run them serially) and times
until a scalar from the final result is fetched; the tunnel round trip is
measured separately with a trivial chain (R=0 equivalent) and subtracted.
"""

import json
import time

import numpy as np


def _fetch(x):
    return float(np.asarray(x))


def main():
    import os

    import jax

    # persistent compile cache shared with scripts/tpu_smoke.py — the
    # full-config fused kernel takes minutes to compile cold. Seed it
    # from the repo-shipped entries first (fresh-container case).
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scripts"))
    from tpu_smoke import _seed_compile_cache

    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    _seed_compile_cache(cache_dir)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dart_planner_tpu.planning import se3_mpc

    config = se3_mpc.SE3MPCConfig()  # N=20, 12 Newton iterations
    rng = np.random.default_rng(0)

    def problem(batch):
        obs = np.concatenate(
            [
                rng.normal(0, 4, (batch, 4, 3)),
                rng.uniform(0.3, 1.2, (batch, 4, 1)),
            ],
            axis=-1,
        ).astype(np.float32)
        return se3_mpc.make_problem(
            rng.normal(0, 2, (batch, 3)).astype(np.float32) + [0, 0, 5],
            rng.normal(0, 1, (batch, 3)).astype(np.float32),
            rng.normal(0, 5, (batch, 3)).astype(np.float32) + [0, 0, 5],
            obstacles=obs,
            config=config,
        )

    def solve(prob, u):
        # "auto" = fully-fused Pallas solve kernel on TPU, XLA elsewhere
        return se3_mpc.solve(config, prob, u, block_b=1024)

    def timed_chain(prob, u0, reps, passes=3):
        """Seconds per solve-call: R chained solves, one scalar fetch.
        Takes the fastest of several passes — the tunnel RTT is noisy
        (25-55 ms observed), so single passes over/under-correct."""
        best = float("inf")
        rtt_best = float("inf")
        u = solve(prob, u0).thrusts  # warm-up + drain the device queue
        _fetch(u[..., 0, 0].sum())
        for _ in range(passes):
            t0 = time.perf_counter()
            for _ in range(reps):
                u = solve(prob, u).thrusts
            _fetch(u[..., 0, 0].sum())
            total = time.perf_counter() - t0
            # round-trip baseline: identical fetch with zero extra solves
            t0 = time.perf_counter()
            _fetch(u[..., 0, 0].sum())
            rtt = time.perf_counter() - t0
            best = min(best, max(total - rtt, 1e-9) / reps)
            rtt_best = min(rtt_best, rtt)
        return best, rtt_best

    # --- batched throughput, 4096 scenarios ---
    # headline = the SHIPPING two-phase config (12 Newton rounds + the
    # adaptive tail-refinement pass that takes per-solve convergence
    # 0.75 -> 0.96, docs/quality.md). The single-phase rate (identical
    # kernel, tail_iterations=0 — the round-3 semantics) is reported
    # alongside: the tail pass is a quality/throughput CONFIG choice,
    # and the gap is its honest price.
    batch = 4096
    prob = jax.device_put(problem(batch))
    u0 = se3_mpc.initialize_thrusts(config, prob)

    # the two configs are timed with INTERLEAVED passes: the tunneled
    # chip's throughput drifts ±20-30% over minutes (CLAUDE.md), so
    # sequential sections can report the two-phase solve "faster" than
    # its own phase 1 — interleaving shares the weather
    config_p1 = config._replace(tail_iterations=0)

    def solve_p1(prob_, u):
        return se3_mpc.solve(config_p1, prob_, u, block_b=1024)

    def one_pass(fn, u, reps):
        t0 = time.perf_counter()
        for _ in range(reps):
            u = fn(prob, u).thrusts
        _fetch(u[..., 0, 0].sum())
        total = time.perf_counter() - t0
        t0 = time.perf_counter()
        _fetch(u[..., 0, 0].sum())
        rtt_s = time.perf_counter() - t0
        return max(total - rtt_s, 1e-9) / reps, rtt_s, u

    u_ship = (lambda r: r.thrusts)(
        se3_mpc.solve(config, prob, u0, block_b=1024)
    )
    _fetch(u_ship[..., 0, 0].sum())
    u_p1 = solve_p1(prob, u0).thrusts
    _fetch(u_p1[..., 0, 0].sum())
    per_call = per_call_p1 = float("inf")
    rtt = float("inf")
    for _ in range(3):
        t, r, u_ship = one_pass(
            lambda p, u: se3_mpc.solve(config, p, u, block_b=1024),
            u_ship, 30,
        )
        per_call = min(per_call, t)
        rtt = min(rtt, r)
        t, r, u_p1 = one_pass(solve_p1, u_p1, 30)
        per_call_p1 = min(per_call_p1, t)
        rtt = min(rtt, r)
    solves_per_s = batch / per_call
    phase1_solves_per_s = batch / per_call_p1

    # --- single-solve device latency ---
    prob1 = jax.device_put(problem(1))
    u1 = se3_mpc.initialize_thrusts(config, prob1)
    lat_s, _ = timed_chain(prob1, u1, reps=100)

    # --- planner-to-actuator dispatch path: precompiled single solve
    # with donated on-device warm start -> one setpoint fetch -> C++
    # 400 Hz RT executor tick (native/rt_executor.cpp). This is the
    # reference's actual CI latency gate
    # (/root/reference/tests/test_real_time_latency.py:109-120:
    # total p95 < 50 ms). Raw = through the dev tunnel; the headline
    # p95 is tunnel-corrected (see runtime/fast_path.py docstring). ---
    from dart_planner_tpu.runtime import rt_executor
    from dart_planner_tpu.runtime.fast_path import (
        PlannerFastPath,
        measure_latency,
    )

    fp = PlannerFastPath(config)
    loop = rt_executor.create_control_loop(frequency_hz=400.0)
    loop.set_gains(
        kp_pos=[7.0, 7.0, 8.5], ki_pos=[0.5] * 3, kd_pos=[4.0] * 3,
        kp_att=[10.0] * 3, ki_att=[0.1] * 3, kd_att=[1.0] * 3,
    )
    loop.start()
    try:
        rt = measure_latency(fp, loop, n_replans=200)
    finally:
        loop.stop()

    # --- 100k+ fleet (BASELINE config 5, single-chip share) ---
    fleet = 131072
    prob_f = jax.device_put(problem(fleet))
    u_f = se3_mpc.initialize_thrusts(config, prob_f)
    per_fleet, _ = timed_chain(prob_f, u_f, reps=6, passes=2)
    fleet_rate = fleet / per_fleet

    # --- closed-loop Monte-Carlo (BASELINE config 4): 6 s episodes,
    # randomized starts + wind + sensor noise + per-episode obstacle
    # fields perceived through the explicit mapper; 10 Hz replans,
    # 400 Hz fused control+physics tick blocks. Reports QUALITY
    # (success/crash/RMSE vs the reference's >=80% Monte-Carlo criterion,
    # /root/reference/tests/test_monte_carlo_sim.py:75-81) alongside
    # throughput. ---
    import jax.numpy as jnp

    from dart_planner_tpu.sim import ClosedLoopConfig, WorldConfig

    mc_cfg = ClosedLoopConfig(
        wind_mean=1.0, wind_std=0.5, sensor_noise_std=0.02,
        sense_radius=3.0,  # in-flight proximity sensing (10 Hz refresh)
        # unknown-space conservatism: cap planned speed to 2 m/s near
        # corridor regions the pre-flight scans never observed (ramping
        # back to max_velocity 3 m beyond a 1 m margin). Dodging a
        # sphere first sensed at 3 m needs ~0.6 s; at 2 m/s that is
        # ~1.2 m of travel. Measured (scripts/diag_unknown.py, 2048
        # episodes): crash 0.0107 -> 0.0049, success 0.9546 -> 0.9644.
        unknown_speed_cap=2.0,
    )
    wc = WorldConfig()
    mc_n = 2048
    key = jax.random.PRNGKey(0)
    start = jnp.asarray([0.0, 0.0, 3.0])
    goal = jnp.asarray([6.0, 3.0, 4.0])

    # world sampling + mapper perception is one-time fleet setup;
    # the timed loop is the closed-loop simulation itself
    from dart_planner_tpu.sim import closed_loop, sample_worlds
    from dart_planner_tpu.sim.worlds import perceive_worlds

    k_fleet, k_world = jax.random.split(key)
    ep_key, states, goals = closed_loop.sample_fleet(
        k_fleet, mc_n, start, goal
    )
    tobs, tmask = sample_worlds(wc, k_world, mc_n, states.position, goals)
    pobs, pmask, corridor_cov = perceive_worlds(
        wc, tobs, tmask, states.position, goals,
        max_obstacles=mc_cfg.mpc.max_obstacles,
        corridor_samples=wc.corridor_samples,
    )

    def run_mc():
        return closed_loop.simulate_episode(
            mc_cfg, ep_key, states, goals, obstacles=pobs,
            obstacle_mask=pmask, method="auto", true_obstacles=tobs,
            true_obstacle_mask=tmask, corridor_observed=corridor_cov,
        )

    res = run_mc()  # compile
    _fetch(jnp.sum(res.final_distance))
    mc_best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = run_mc()
        _fetch(jnp.sum(res.final_distance))
        total = time.perf_counter() - t0
        t0 = time.perf_counter()
        _fetch(jnp.sum(res.final_distance))  # bare-fetch round trip
        mc_best = min(mc_best, max(total - (time.perf_counter() - t0), 1e-9))
    episodes_per_s = mc_n / mc_best
    mc_success = float(jnp.mean(res.success))
    mc_crash = float(jnp.mean(res.crashed))
    mc_rmse = float(jnp.mean(res.tracking_rmse))
    mc_clear = float(jnp.mean(res.min_obstacle_clearance))

    # --- enforced latency gates (reference CI thresholds,
    # /root/reference/tests/test_real_time_latency.py:109-120). The
    # tunnel-corrected numbers are gated — they are what a locally
    # attached chip would see; the raw figures ride a 25-55 ms dev
    # tunnel and are reported, not gated. A violation still prints the
    # JSON line, then fails the run loudly. ---
    gates = {
        "planning_host_p95_ms": (rt["planning_host_p95_ms"], 50.0),
        "control_tick_p95_ms": (rt["control_tick_p95_ms"], 5.0),
        "planner_to_actuator_p95_ms": (
            rt["planner_to_actuator_p95_ms"], 50.0
        ),
    }
    gate_failures = [
        f"{k}={v:.3f} >= {lim}" for k, (v, lim) in gates.items() if v >= lim
    ]

    print(
        json.dumps(
            {
                "metric": "batched SE(3) MPC throughput (N=20, 4096 scenarios)",
                "value": round(solves_per_s, 1),
                "unit": "solves/s/chip",
                "vs_baseline": round(solves_per_s / 1000.0, 3),
                "single_solve_device_ms": round(lat_s * 1e3, 4),
                "single_solve_budget_ms": 50.0,
                # identical kernel with the adaptive tail pass off (the
                # round-3 fixed-budget semantics): the headline value's
                # gap to this is the measured price of taking per-solve
                # convergence 0.75 -> 0.96 (docs/quality.md)
                "phase1_solves_per_s": round(phase1_solves_per_s, 1),
                "planner_to_actuator_p95_ms": round(
                    rt["planner_to_actuator_p95_ms"], 3
                ),
                "planner_to_actuator_raw_p95_ms": round(
                    rt["planner_to_actuator_raw_p95_ms"], 3
                ),
                "planning_host_p95_ms": round(rt["planning_host_p95_ms"], 3),
                "control_tick_p95_ms": round(rt["control_tick_p95_ms"], 4),
                "fleet_131072_solves_per_s": round(fleet_rate, 1),
                "closed_loop_episodes_per_s": round(episodes_per_s, 1),
                "mc_success_rate": round(mc_success, 4),
                "mc_crash_rate": round(mc_crash, 4),
                "tracking_rmse_m": round(mc_rmse, 4),
                "mean_min_obstacle_clearance_m": round(mc_clear, 3),
                "batch_step_ms": round(per_call * 1e3, 3),
                "tunnel_rtt_ms": round(rtt * 1e3, 2),
                "device": str(jax.devices()[0].platform),
                "latency_gate_ok": not gate_failures,
            }
        )
    )
    if gate_failures:
        import sys

        print("LATENCY GATE FAILED: " + "; ".join(gate_failures),
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
