"""Per-process entry for the multi-process fleet harness.

Launched N times (once per "host") by tests/test_distributed.py or
scripts/measure_scaling.py. Every process:

1. joins the jax.distributed cluster (CPU backend, D virtual local
   devices via --xla_force_host_platform_device_count),
2. builds the global ("hosts", "devices") mesh,
3. generates ONLY ITS OWN slice of a seeded global scenario fleet,
4. runs parallel.scenario.solve_fleet (shard_map + psum stats),
5. process 0 prints one JSON line: psum'd FleetStats, a single-process
   reference recomputation of the same global fleet, and throughput.

The printed stats come from collectives that crossed real process
boundaries (gRPC DCN path), so equality with the local recomputation
proves the multi-process mesh + host-local sharding + cross-process
psum all work — the thing tests/test_scaling.py's single-process
virtual mesh cannot prove.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--global-batch", type=int, default=64)
    ap.add_argument("--horizon", type=int, default=10)
    ap.add_argument("--iterations", type=int, default=4)
    ap.add_argument("--measure", action="store_true",
                    help="also time chained solves (weak scaling)")
    ap.add_argument("--tail-iterations", type=int, default=0,
                    help="two-phase adaptive tail rounds (the shipping "
                         "config uses 8); per-shard compaction makes the "
                         "multi-process result differ from the "
                         "single-process reference BY DESIGN, so the "
                         "parity section is skipped when > 0")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    # force CPU with D virtual local devices BEFORE the first jax import
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")  # sitecustomize override

    from dart_planner_tpu.parallel import distributed, scenario
    from dart_planner_tpu.planning import se3_mpc

    distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes
    mesh = distributed.global_fleet_mesh()

    # tail refinement off: its compaction refines the worst capacity
    # fraction PER SHARD, so the multi-process result would legitimately
    # differ from the single-process reference recomputation below — this
    # harness checks cross-process psum/mesh plumbing on the invariant
    # single-phase core (see parallel/scenario.py docstring).
    config = se3_mpc.SE3MPCConfig(
        prediction_horizon=args.horizon, max_iterations=args.iterations,
        tail_iterations=args.tail_iterations,
    )

    import numpy as np

    def make_global_problem(batch):
        """Seeded global fleet — identical on every process."""
        rng = np.random.default_rng(42)
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

    B = args.global_batch
    full = make_global_problem(B)
    # this process's host-local slice of the global fleet
    per = B // args.num_processes
    lo = args.process_id * per
    local = jax.tree_util.tree_map(lambda x: np.asarray(x)[lo:lo + per], full)
    prob = distributed.host_local_problem(local, mesh)

    res, stats = scenario.solve_fleet(config, mesh, prob, method="xla")
    jax.block_until_ready(res.thrusts)

    def fetch(x):
        return float(np.asarray(x.addressable_shards[0].data))

    out = {
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "stats": {
            "total": fetch(stats.total),
            "converged": fetch(stats.converged),
            "mean_cost": fetch(stats.mean_cost),
            "max_grad_norm": fetch(stats.max_grad_norm),
        },
    }

    if args.process_id == 0 and args.tail_iterations == 0:
        # single-process reference: same global fleet, plain local solve
        # (single-phase only: the tail pass selects its refine cohort
        # per shard, so multi-process results differ by design)
        ref = se3_mpc.solve_se3_mpc(config, full)
        out["reference"] = {
            "total": float(B),
            "converged": float(np.sum(np.asarray(ref.converged))),
            "mean_cost": float(np.mean(np.asarray(ref.cost))),
            "max_grad_norm": float(np.max(np.asarray(ref.grad_norm))),
        }

    if args.measure:
        out["throughput"] = distributed.measure_throughput(
            config, mesh, prob, reps=args.reps, method="xla"
        )

    if args.process_id == 0:
        print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
