"""Headline benchmark: batched SE(3) MPC throughput (solves/s/chip, N=20).

Prints a cumulative JSON line after EVERY completed section; the LAST
line printed is always the most complete result. ``vs_baseline`` is
measured throughput over the north-star target of 1,000 solves/s/chip
(BASELINE.md); extra fields record the single-solve device latency and
the planner->actuator dispatch path against the reference's CI gates
(/root/reference/tests/test_real_time_latency.py:109-120).

Survivability (round-5 redesign — round 4's driver run was killed by an
external timeout mid-compile and recorded NOTHING, BENCH_r04.json
rc=124): sections run in priority order, each wrapped so an error skips
it instead of aborting the run; a watchdog thread enforces a global
wall-clock budget (``BENCH_BUDGET_S``, default 480 s) and, on expiry,
prints the cumulative JSON with ``"truncated": true`` and exits 0 — a
partial result always beats an empty rc=124. The same JSON is mirrored
to ``BENCH_PARTIAL.json`` after each section. ``--compile-only`` builds
every executable the measured run needs (no timed passes) so
``scripts/make_cache_seed.py`` can capture them into the repo-shipped
compile-cache seed; a seeded fresh container then measures in ~2-4 min
instead of compiling for ~10+.

Timing methodology: the dev TPU sits behind a network tunnel on which
``block_until_ready`` can return before execution finishes, so naive
per-call timing measures enqueue, not compute. Instead each measurement
dispatches a *data-dependent chain* of R solves (the warm-start output
of solve k feeds solve k+1, so the device must run them serially) and
times until a scalar from the final result is fetched; the tunnel round
trip is measured separately with a trivial chain and subtracted, min
over >=3 passes (the RTT is 25-55 ms and noisy).
"""

import json
import os
import sys
import threading
import time

import numpy as np

_ROOT = os.path.dirname(os.path.abspath(__file__))
_PARTIAL = os.path.join(_ROOT, "BENCH_PARTIAL.json")


def _fetch(x):
    return float(np.asarray(x))


class _Report:
    """Cumulative result store + watchdog.

    Every ``update``/``error`` rewrites ``BENCH_PARTIAL.json`` and prints
    the full cumulative JSON line, so an external ``timeout`` kill in
    section k can never erase sections 1..k-1 from the captured tail.
    """

    def __init__(self, budget_s: float):
        self.t0 = time.monotonic()
        self.budget = budget_s
        self.lock = threading.Lock()
        self.data = {
            "metric": "batched SE(3) MPC throughput (N=20, 4096 scenarios)",
            "value": None,
            "unit": "solves/s/chip",
            "vs_baseline": None,
            "sections": [],
            "truncated": False,
        }
        self._watchdog = threading.Timer(budget_s, self._on_deadline)
        self._watchdog.daemon = True
        self._watchdog.start()

    def remaining(self) -> float:
        return self.budget - (time.monotonic() - self.t0)

    def update(self, section: str, **fields) -> None:
        with self.lock:
            self.data.update(fields)
            self.data["sections"].append(section)
            self._dump()

    def error(self, section: str, exc: BaseException) -> None:
        with self.lock:
            msg = f"{section}: {type(exc).__name__}: {exc}"
            self.data.setdefault("section_errors", []).append(msg[:200])
            self._dump()

    def _dump(self) -> None:
        self.data["elapsed_s"] = round(time.monotonic() - self.t0, 1)
        line = json.dumps(self.data)
        try:
            with open(_PARTIAL, "w") as f:
                f.write(line + "\n")
        except OSError:
            pass
        print(line, flush=True)

    def _on_deadline(self) -> None:
        # A section (usually a cold Mosaic compile through a degraded
        # tunnel, CLAUDE.md) overran the global budget: ship what we
        # have. rc=0 with partial data beats the driver's rc=124 with
        # nothing. os._exit because the main thread is blocked in C.
        with self.lock:
            self.data["truncated"] = True
            self._dump()
        os._exit(0)

    def finish(self) -> None:
        self._watchdog.cancel()


def main() -> int:
    compile_only = "--compile-only" in sys.argv[1:]
    budget = float(
        os.environ.get("BENCH_BUDGET_S", "3600" if compile_only else "480")
    )
    rep = _Report(budget)

    import jax

    if os.environ.get("DART_FORCE_CPU"):
        # machinery testing off-chip: env vars alone do NOT switch this
        # environment's JAX off the TPU (the axon plugin wins), only the
        # config flag does (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")

    # persistent compile cache shared with scripts/tpu_smoke.py — the
    # full-config fused kernel takes minutes to compile cold. Seed it
    # from the repo-shipped entries first (fresh-container case).
    sys.path.insert(0, os.path.join(_ROOT, "scripts"))
    from tpu_smoke import _seed_compile_cache

    cache_dir = os.environ.get(
        "DART_JAX_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache")
    )
    _seed_compile_cache(cache_dir)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from dart_planner_tpu.planning import se3_mpc

    config = se3_mpc.SE3MPCConfig()  # N=20, two-phase adaptive tail
    config_p1 = config._replace(tail_iterations=0)
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

    def solve_p1(prob, u):
        return se3_mpc.solve(config_p1, prob, u, block_b=1024)

    def timed_chain(prob, u0, reps, passes=3):
        """Seconds per solve-call: R chained solves, one scalar fetch.
        Takes the fastest of several passes — the tunnel RTT is noisy
        (25-55 ms observed), so single passes over/under-correct."""
        best = float("inf")
        rtt_best = float("inf")
        u = solve(prob, u0).thrusts  # warm-up + drain the device queue
        _fetch(u[..., 0, 0].sum())
        if compile_only:
            return best, rtt_best
        for _ in range(passes):
            t0 = time.perf_counter()
            for _ in range(reps):
                u = solve(prob, u).thrusts
            _fetch(u[..., 0, 0].sum())
            total = time.perf_counter() - t0
            # round-trip baseline: identical fetch, zero extra solves
            t0 = time.perf_counter()
            _fetch(u[..., 0, 0].sum())
            rtt = time.perf_counter() - t0
            best = min(best, max(total - rtt, 1e-9) / reps)
            rtt_best = min(rtt_best, rtt)
        return best, rtt_best

    # ------------------------------------------------------------------
    # Section 1 (headline): batched throughput, 4096 scenarios.
    # headline = the SHIPPING two-phase config (12 Newton rounds + the
    # adaptive tail-refinement pass that takes per-solve convergence
    # 0.75 -> 0.96, docs/quality.md). The single-phase rate (identical
    # kernel, tail_iterations=0 — the round-3 semantics) is reported
    # alongside; the gap is the tail pass's honest price. The two
    # configs are timed with INTERLEAVED passes: the tunneled chip's
    # throughput drifts +-20-30% over minutes (CLAUDE.md), so
    # sequential sections can report the two-phase solve "faster" than
    # its own phase 1 — interleaving shares the weather.
    # ------------------------------------------------------------------
    def sec_throughput():
        batch = 4096
        prob = jax.device_put(problem(batch))
        u0 = se3_mpc.initialize_thrusts(config, prob)

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

        u_ship = solve(prob, u0).thrusts  # warm-up / compile two-phase
        _fetch(u_ship[..., 0, 0].sum())
        u_p1 = solve_p1(prob, u0).thrusts  # warm-up / compile phase-1
        _fetch(u_p1[..., 0, 0].sum())
        if compile_only:
            return
        per_call = per_call_p1 = float("inf")
        rtt = float("inf")
        for i in range(3):
            t, r, u_ship = one_pass(solve, u_ship, 30)
            per_call = min(per_call, t)
            rtt = min(rtt, r)
            t, r, u_p1 = one_pass(solve_p1, u_p1, 30)
            per_call_p1 = min(per_call_p1, t)
            rtt = min(rtt, r)
            if i == 0:
                # provisional headline as early as possible: if an
                # external timeout tighter than BENCH_BUDGET_S kills the
                # run, the tail already carries a usable value (refined
                # by the final cumulative line when we get there)
                rep.update(
                    "throughput_provisional",
                    value=round(batch / per_call, 1),
                    vs_baseline=round(batch / per_call / 1000.0, 3),
                    phase1_solves_per_s=round(batch / per_call_p1, 1),
                    device=str(jax.devices()[0].platform),
                )
        rep.update(
            "throughput",
            value=round(batch / per_call, 1),
            vs_baseline=round(batch / per_call / 1000.0, 3),
            # identical kernel with the adaptive tail pass off (the
            # round-3 fixed-budget semantics): the headline's gap to
            # this is the measured price of per-solve convergence
            # 0.75 -> 0.96 (docs/quality.md)
            phase1_solves_per_s=round(batch / per_call_p1, 1),
            batch_step_ms=round(per_call * 1e3, 3),
            tunnel_rtt_ms=round(rtt * 1e3, 2),
            device=str(jax.devices()[0].platform),
        )

    # ------------------------------------------------------------------
    # Section 2: single-solve device latency (reference budget: 50 ms).
    # ------------------------------------------------------------------
    def sec_single():
        prob1 = jax.device_put(problem(1))
        u1 = se3_mpc.initialize_thrusts(config, prob1)
        lat_s, _ = timed_chain(prob1, u1, reps=100)
        if compile_only:
            return
        rep.update(
            "single",
            single_solve_device_ms=round(lat_s * 1e3, 4),
            single_solve_budget_ms=50.0,
        )

    # ------------------------------------------------------------------
    # Section 3: planner-to-actuator dispatch path — precompiled single
    # solve with donated on-device warm start -> one setpoint fetch ->
    # C++ 400 Hz RT executor tick (native/rt_executor.cpp). This is the
    # reference's actual CI latency gate
    # (/root/reference/tests/test_real_time_latency.py:109-120: total
    # p95 < 50 ms). Raw = through the dev tunnel; the headline p95 is
    # tunnel-corrected (see runtime/fast_path.py docstring).
    # ------------------------------------------------------------------
    gate_failures = []

    def sec_fastpath():
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
            rt = measure_latency(
                fp, loop, n_replans=2 if compile_only else 150
            )
        finally:
            loop.stop()
        if compile_only:
            return
        # enforced latency gates (reference CI thresholds). The
        # tunnel-corrected numbers are gated — they are what a locally
        # attached chip would see; the raw figures ride a 25-55 ms dev
        # tunnel and are reported, not gated.
        gates = {
            "planning_host_p95_ms": (rt["planning_host_p95_ms"], 50.0),
            "control_tick_p95_ms": (rt["control_tick_p95_ms"], 5.0),
            "planner_to_actuator_p95_ms": (
                rt["planner_to_actuator_p95_ms"], 50.0
            ),
        }
        gate_failures.extend(
            f"{k}={v:.3f} >= {lim}"
            for k, (v, lim) in gates.items() if v >= lim
        )
        rep.update(
            "fastpath",
            planner_to_actuator_p95_ms=round(
                rt["planner_to_actuator_p95_ms"], 3
            ),
            planner_to_actuator_raw_p95_ms=round(
                rt["planner_to_actuator_raw_p95_ms"], 3
            ),
            planning_host_p95_ms=round(rt["planning_host_p95_ms"], 3),
            control_tick_p95_ms=round(rt["control_tick_p95_ms"], 4),
            latency_gate_ok=not gate_failures,
        )

    # ------------------------------------------------------------------
    # Section 4: 100k+ fleet (BASELINE config 5, single-chip share).
    # ------------------------------------------------------------------
    def sec_fleet():
        fleet = 131072
        prob_f = jax.device_put(problem(fleet))
        u_f = se3_mpc.initialize_thrusts(config, prob_f)
        per_fleet, _ = timed_chain(prob_f, u_f, reps=6, passes=2)
        if compile_only:
            return
        rep.update(
            "fleet", fleet_131072_solves_per_s=round(fleet / per_fleet, 1)
        )

    # ------------------------------------------------------------------
    # Section 5: closed-loop Monte-Carlo (BASELINE config 4): 6 s
    # episodes, randomized starts + wind + sensor noise + per-episode
    # obstacle fields perceived through the explicit mapper; 10 Hz
    # replans, 400 Hz fused control+physics tick blocks. Reports
    # QUALITY (success/crash/RMSE vs the reference's >=80% Monte-Carlo
    # criterion, /root/reference/tests/test_monte_carlo_sim.py:75-81)
    # alongside throughput.
    # ------------------------------------------------------------------
    def sec_mc():
        from dart_planner_tpu.sim import (
            ClosedLoopConfig,
            WorldConfig,
            closed_loop,
            sample_worlds,
        )
        from dart_planner_tpu.sim.worlds import perceive_worlds

        mc_cfg = ClosedLoopConfig(
            wind_mean=1.0, wind_std=0.5, sensor_noise_std=0.02,
            sense_radius=3.0,  # in-flight proximity sensing (10 Hz)
            # unknown-space conservatism (SHIPPED ClosedLoopConfig
            # defaults: margin 1.5 m, coverage 0.6): cap planned speed
            # to 2 m/s near corridor regions the pre-flight scans never
            # observed (crash 0.0107 -> 0.0049, scripts/diag_unknown.py).
            # Together with the round-5 goal-margin clamp (on by
            # default: ClosedLoopConfig.mpc goal_margin_clamp 0.5 /
            # floor 0.6) the 2048-episode fleet measures success
            # 0.9937 / crash 0.0049 / timeout 0.0015 (docs/quality.md).
            unknown_speed_cap=2.0,
        )
        wc = WorldConfig()
        mc_n = 2048
        key = jax.random.PRNGKey(0)
        start = jnp.asarray([0.0, 0.0, 3.0])
        goal = jnp.asarray([6.0, 3.0, 4.0])

        # world sampling + mapper perception is one-time fleet setup;
        # the timed loop is the closed-loop simulation itself
        k_fleet, k_world = jax.random.split(key)
        ep_key, states, goals = closed_loop.sample_fleet(
            k_fleet, mc_n, start, goal
        )
        tobs, tmask = sample_worlds(
            wc, k_world, mc_n, states.position, goals
        )
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
        if compile_only:
            return
        mc_best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            res = run_mc()
            _fetch(jnp.sum(res.final_distance))
            total = time.perf_counter() - t0
            t0 = time.perf_counter()
            _fetch(jnp.sum(res.final_distance))  # bare-fetch round trip
            mc_best = min(
                mc_best, max(total - (time.perf_counter() - t0), 1e-9)
            )
        rep.update(
            "mc",
            closed_loop_episodes_per_s=round(mc_n / mc_best, 1),
            mc_success_rate=round(float(jnp.mean(res.success)), 4),
            mc_crash_rate=round(float(jnp.mean(res.crashed)), 4),
            tracking_rmse_m=round(float(jnp.mean(res.tracking_rmse)), 4),
            mean_min_obstacle_clearance_m=round(
                float(jnp.mean(res.min_obstacle_clearance)), 3
            ),
        )

    sections = [
        ("throughput", sec_throughput),
        ("single", sec_single),
        ("fastpath", sec_fastpath),
        ("fleet", sec_fleet),
        ("mc", sec_mc),
    ]
    for name, fn in sections:
        if rep.remaining() < 15.0:
            rep.error(name, TimeoutError("skipped: global budget spent"))
            continue
        try:
            fn()
        except Exception as e:  # isolate: one bad section loses itself only
            rep.error(name, e)

    rep.finish()
    if compile_only:
        print(
            f"compile-only pass done in "
            f"{time.monotonic() - rep.t0:.1f} s",
            file=sys.stderr,
        )
        return 0
    with rep.lock:
        rep._dump()  # final (most complete) line is the last printed
    if gate_failures:
        print("LATENCY GATE FAILED: " + "; ".join(gate_failures),
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
