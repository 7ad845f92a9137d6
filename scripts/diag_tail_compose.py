"""Break down the two-phase composition overhead (VERDICT r4, Weak #3).

Round-4 measurement: the tail-refine pass costs ~0.33 ms fixed +
0.08 ms/round *in composition*, vs 0.368 ms for all 8 rounds when the
compacted tail kernel runs standalone on pre-gathered inputs — i.e.
~0.6 ms of the shipping 2.1 ms step is composition glue / layout waste.
This probe isolates where it goes, all in ONE process (cross-process
numbers ride +-20-30% tunnel weather, docs/kernel.md):

  A    phase-1 only                      (tail_iterations=0)
  B1   two-phase, 1 tail round           (composed slope anchor)
  B8   two-phase, 8 tail rounds          (the shipping config)
  T1   standalone tail kernel, 1 round   (pre-gathered inputs)
  T8   standalone tail kernel, 8 rounds
  G    phase-1 + partition/gather/merge glue with an IDENTITY refine
       (no second kernel at all)

Derived:  composed slope   = (B8-B1)/7      vs standalone (T8-T1)/7
          fixed comp. cost = B1 - A - T1    (glue + launch + layouts)
          pure glue        = G - A
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dart_planner_tpu.ops import costs
    from dart_planner_tpu.planning import se3_mpc

    B = args.batch
    rng = np.random.default_rng(0)
    obs = np.concatenate(
        [rng.normal(0, 4, (B, 4, 3)), rng.uniform(0.3, 1.2, (B, 4, 1))],
        axis=-1,
    ).astype(np.float32)
    base = se3_mpc.SE3MPCConfig()
    prob = jax.device_put(se3_mpc.make_problem(
        rng.normal(0, 2, (B, 3)).astype(np.float32) + [0, 0, 5],
        rng.normal(0, 1, (B, 3)).astype(np.float32),
        rng.normal(0, 5, (B, 3)).astype(np.float32) + [0, 0, 5],
        obstacles=obs, config=base,
    ))
    u0 = se3_mpc.initialize_thrusts(base, prob)

    def one_pass(fn, u, reps=args.reps):
        t0 = time.perf_counter()
        for _ in range(reps):
            u = fn(u)
        float(np.asarray(u[..., 0, 0].sum()))
        total = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(u[..., 0, 0].sum()))
        rtt = time.perf_counter() - t0
        return max(total - rtt, 1e-9) / reps, u

    def solve_cfg(cfg):
        def fn(u):
            return se3_mpc.solve(cfg, prob, u, block_b=1024).thrusts
        return fn

    cfgA = base._replace(tail_iterations=0)
    cfgB1 = base._replace(tail_iterations=1)
    cfgB8 = base._replace(tail_iterations=8)

    # standalone tail kernel on PRE-gathered compact inputs (the ideal)
    C = max(1, int(np.ceil(base.tail_capacity * B)))
    resA = se3_mpc.solve(cfgA, prob, u0, block_b=1024)
    idx = jnp.argsort(~np.asarray(resA.converged), stable=True)[:C]
    prob_t = costs.Problem(*[
        None if x is None else jax.device_put(np.asarray(x)[idx])
        for x in prob
    ])
    u_t = jax.device_put(np.asarray(resA.thrusts)[idx])

    def tail_cfg(rounds):
        return base._replace(
            max_iterations=rounds, cg_iterations=base.tail_cg_iterations,
            newton_full_curvature=True, gn_warmup_iterations=0,
            tail_iterations=0,
            line_search_alphas=base.tail_line_search_alphas,
        )

    def tail_fn(rounds):
        cfg = tail_cfg(rounds)

        def fn(u):
            return se3_mpc.solve(cfg, prob_t, u, block_b=1024).thrusts
        return fn

    # glue-only: phase-1 + the partition/gather/merge of _tail_refine
    # with an identity "refine" (no second pallas_call)
    @jax.jit
    def glue_fn(u):
        res = se3_mpc._solve_once(cfgA, prob, u, True, "auto", 1024)
        unconv = (~res.converged).astype(jnp.int32)
        rank_u = jnp.cumsum(unconv) - 1
        n_unconv = rank_u[-1] + 1
        rank_c = jnp.cumsum(1 - unconv) - 1
        slot = jnp.where(unconv == 1, rank_u, n_unconv + rank_c)
        idx_ = jnp.zeros((B,), slot.dtype).at[slot].set(
            jnp.arange(B, dtype=slot.dtype)
        )[:C]
        ref_u = res.thrusts[idx_]
        ref_cost = res.cost[idx_]
        safe_slot = jnp.minimum(slot, C - 1)
        use_new = (slot < C) & (ref_cost[safe_slot] <= res.cost)
        sel = use_new[:, None, None]
        return jnp.where(sel, ref_u[safe_slot], res.thrusts)

    # variants are measured with INTERLEAVED passes: the tunneled chip's
    # throughput drifts +-20-30% over minutes, so sequential sections
    # produce nonsense (a first sequential run of this probe measured
    # the 8-round two-phase solve FASTER than its own phase 1)
    # per-variant reps sized so device time dominates the 25-55 ms RTT
    # being subtracted (the tiny standalone-tail kernels need hundreds
    # of chained reps or the correction swallows them)
    variants = [
        ("A_phase1", solve_cfg(cfgA), u0, args.reps),
        ("B1_two_phase_1r", solve_cfg(cfgB1), u0, args.reps),
        ("B8_two_phase_8r", solve_cfg(cfgB8), u0, args.reps),
        ("T1_tail_alone_1r", tail_fn(1), u_t, args.reps * 10),
        ("T8_tail_alone_8r", tail_fn(8), u_t, args.reps * 10),
        ("G_glue_identity", glue_fn, u0, args.reps),
    ]
    state = {}
    for name, fn, u_init, _ in variants:  # compile/warm-up all first
        t0 = time.time()
        u = fn(u_init)
        float(np.asarray(u[..., 0, 0].sum()))
        state[name] = u
        print(f"warm {name:20s} ({time.time() - t0:.0f}s)", flush=True)
    results = {name: float("inf") for name, _, _, _ in variants}
    for p in range(args.passes):
        for name, fn, _, reps in variants:
            per, state[name] = one_pass(fn, state[name], reps)
            results[name] = min(results[name], per * 1e3)
        print(f"pass {p}: " + "  ".join(
            f"{n}={results[n]:.3f}" for n, _, _, _ in variants), flush=True)
    for name, _, _, _ in variants:
        print(f"{name:20s} {results[name]:8.3f} ms/step")

    A = results["A_phase1"]
    b1, b8 = results["B1_two_phase_1r"], results["B8_two_phase_8r"]
    t1, t8 = results["T1_tail_alone_1r"], results["T8_tail_alone_8r"]
    g = results["G_glue_identity"]
    print(f"\ncomposed tail slope    {(b8 - b1) / 7:.4f} ms/round")
    print(f"standalone tail slope  {(t8 - t1) / 7:.4f} ms/round")
    print(f"fixed composition cost {b1 - A - t1:.4f} ms (glue+launch+layout)")
    print(f"pure glue (identity)   {g - A:.4f} ms")
    print(f"shipping step (B8)     {b8:.3f} ms vs ideal A+T8 "
          f"{A + t8:.3f} ms -> overhead {b8 - A - t8:.3f} ms")


if __name__ == "__main__":
    main()
