"""Quick fused-kernel throughput probe (real TPU).

Times ONLY the 4096-batch fused-solve step (the bench.py headline path)
so kernel experiments get a fast keep-or-revert number without the full
bench. Uses the same chained-solve methodology (data-dependent chain +
single scalar fetch − bare-fetch RTT, min over passes).

Usage: python scripts/bench_kernel.py [--batch 4096] [--reps 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("--block-b", type=int, default=1024)
    ap.add_argument("--obstacles", type=int, default=4)
    ap.add_argument("--horizon", type=int, default=20)
    ap.add_argument("--newton", type=int, default=12)
    ap.add_argument("--tail-iters", type=int, default=None,
                    help="override tail_iterations (default: config)")
    ap.add_argument("--tail-cg", type=int, default=None)
    ap.add_argument("--tail-capacity", type=float, default=None)
    args = ap.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dart_planner_tpu.planning import se3_mpc

    config = se3_mpc.SE3MPCConfig(
        prediction_horizon=args.horizon, max_iterations=args.newton,
        max_obstacles=max(8, args.obstacles),
    )
    overrides = {}
    if args.tail_iters is not None:
        overrides["tail_iterations"] = args.tail_iters
    if args.tail_cg is not None:
        overrides["tail_cg_iterations"] = args.tail_cg
    if args.tail_capacity is not None:
        overrides["tail_capacity"] = args.tail_capacity
    if overrides:
        config = config._replace(**overrides)
    print(
        f"N={config.prediction_horizon} newton={config.max_iterations} "
        f"tail={config.tail_iterations}@{config.tail_cg_iterations} "
        f"cap={config.tail_capacity}"
    )
    rng = np.random.default_rng(0)
    batch = args.batch
    obs = np.concatenate(
        [
            rng.normal(0, 4, (batch, args.obstacles, 3)),
            rng.uniform(0.3, 1.2, (batch, args.obstacles, 1)),
        ],
        axis=-1,
    ).astype(np.float32)
    prob = jax.device_put(se3_mpc.make_problem(
        rng.normal(0, 2, (batch, 3)).astype(np.float32) + [0, 0, 5],
        rng.normal(0, 1, (batch, 3)).astype(np.float32),
        rng.normal(0, 5, (batch, 3)).astype(np.float32) + [0, 0, 5],
        obstacles=obs,
        config=config,
    ))
    u0 = se3_mpc.initialize_thrusts(config, prob)

    def solve(u):
        return se3_mpc.solve(config, prob, u, block_b=args.block_b)

    t0 = time.time()
    res = solve(u0)
    cost = float(np.asarray(res.cost.mean()))
    print(f"compile+first run {time.time() - t0:.1f}s mean cost {cost:.1f}")

    best = float("inf")
    for _ in range(args.passes):
        u = u0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            u = solve(u).thrusts
        float(np.asarray(u[..., 0, 0].sum()))
        total = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(u[..., 0, 0].sum()))
        rtt = time.perf_counter() - t0
        per = max(total - rtt, 1e-9) / args.reps
        print(f"pass: {per * 1e3:.3f} ms/step (rtt {rtt * 1e3:.1f} ms)")
        best = min(best, per)
    print(
        f"BEST {best * 1e3:.3f} ms/step = {batch / best:,.0f} solves/s "
        f"(batch {batch}, block_b {args.block_b}, K={args.obstacles})"
    )


if __name__ == "__main__":
    main()
