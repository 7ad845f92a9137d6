"""Mandatory TPU compile gate for the Pallas kernels.

Compiles + runs BOTH Pallas kernels (ops/pallas_mpc.py solve kernel,
ops/pallas_rollout.py tick-block kernel) on the REAL chip at small
shapes and checks basic solution sanity. Exits non-zero on any Mosaic
legalization / layout / VMEM failure or on garbage outputs.

Expected wall time on the tunneled dev chip: ~2 min with a warm
persistent compile cache (~/.cache/jax_comp_cache), up to ~8 min cold —
remote compiles ride the tunnel and the dev VM suspends inflate
wall-clock numbers.

Why this exists: the test suite runs the kernels in interpreter mode on
a CPU mesh, which can never catch Mosaic legalization failures (round 2
shipped a bool fori_loop carry that compiled fine interpreted but died
with `failed to legalize operation 'scf.for'` on hardware). Run this
after every change under ops/ and before every snapshot:

    python scripts/tpu_smoke.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    t0 = time.time()
    import jax
    import numpy as np

    # persistent compile cache: the full-config fused kernel takes minutes
    # to compile cold; warm reruns of this gate take seconds
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if jax.default_backend() != "tpu":
        print(f"FAIL: need a real TPU, got backend={jax.default_backend()}")
        return 2

    from dart_planner_tpu.planning import se3_mpc

    rng = np.random.default_rng(0)

    def problem(config, batch):
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

    # --- 1. fused solve kernel, FULL default config (the bench config:
    # N=20, two-stage Newton + full curvature — exactly what broke at r02)
    config = se3_mpc.SE3MPCConfig()
    prob = problem(config, 256)
    u0 = se3_mpc.initialize_thrusts(config, prob)
    try:
        res = se3_mpc.solve(config, prob, u0, method="fused", block_b=256)
        cost = np.asarray(res.cost)
        cost0 = np.asarray(se3_mpc._finalize(config, prob, u0).cost)
    except Exception as e:  # Mosaic errors surface here
        print(f"FAIL: fused solve kernel did not compile/run: {e!r}"[:2000])
        return 1
    if not np.all(np.isfinite(cost)):
        print("FAIL: fused solve produced non-finite costs")
        return 1
    if not np.all(cost <= cost0 + 1e-3):
        bad = int(np.sum(cost > cost0 + 1e-3))
        print(f"FAIL: fused solve did not descend on {bad}/256 scenarios")
        return 1
    t1 = time.time()
    print(f"ok: fused solve kernel (N=20 full config) in {t1 - t0:.1f}s; "
          f"mean cost {cost.mean():.1f} (init {cost0.mean():.1f})")

    # --- 1b. dynamic-vmax kernel variant (Problem.v_cap input row — the
    # unknown-space speed cap path used by the closed-loop Monte Carlo)
    import jax.numpy as jnp

    try:
        probc = prob._replace(v_cap=jnp.full((256,), 3.0, jnp.float32))
        resc = se3_mpc.solve(config, probc, u0, method="fused",
                             block_b=256)
        costc = np.asarray(resc.cost)
    except Exception as e:
        print(f"FAIL: dynamic-vmax solve kernel did not compile/run: "
              f"{e!r}"[:2000])
        return 1
    if not np.all(np.isfinite(costc)):
        print("FAIL: dynamic-vmax solve produced non-finite costs")
        return 1
    # a 3 m/s cap on these scenarios must strictly bind somewhere
    capped_speed = np.asarray(
        jnp.max(jnp.abs(resc.velocities), axis=(-1, -2))
    )
    free_speed = np.asarray(jnp.max(jnp.abs(res.velocities), axis=(-1, -2)))
    if not (capped_speed.max() < free_speed.max()):
        print("FAIL: dynamic v_cap did not bind (max speed "
              f"{capped_speed.max():.2f} vs uncapped {free_speed.max():.2f})")
        return 1
    t1b = time.time()
    print(f"ok: dynamic-vmax solve kernel in {t1b - t1:.1f}s; "
          f"max |v| {capped_speed.max():.2f} (uncapped "
          f"{free_speed.max():.2f})")
    t1 = t1b

    # --- 2. fused tick-block kernel via a tiny closed-loop episode batch
    # (also re-exercises the solve kernel at a second shape)
    from dart_planner_tpu.common.types import DroneState
    from dart_planner_tpu.sim import closed_loop

    cfg = closed_loop.ClosedLoopConfig(
        mpc=se3_mpc.SE3MPCConfig(
            prediction_horizon=8, max_iterations=4, cg_iterations=8
        ),
        substeps_per_plan=8,
        num_replans=3,
    )
    B = 128
    state0 = DroneState.zeros((B,))
    state0 = state0.replace(
        position=state0.position + np.array([0.0, 0.0, 2.0], np.float32)
    )
    goal = np.tile(np.array([[2.0, 1.0, 3.0]], np.float32), (B, 1))
    try:
        ep = closed_loop.simulate_episode(
            cfg, jax.random.PRNGKey(0), state0, goal, method="fused"
        )
        dist = np.asarray(ep.final_distance)
    except Exception as e:
        print(f"FAIL: fused tick-block kernel did not compile/run: {e!r}"[:2000])
        return 1
    if not np.all(np.isfinite(dist)):
        print("FAIL: tick-block episode produced non-finite distances")
        return 1
    # loose sanity bound only: the 3-replan episode covers ~60 ms of sim
    # time, so the vehicle barely moves — this is a compile gate, the
    # quality gates live in bench.py / tests
    d0 = float(np.linalg.norm(goal[0] - np.array([0.0, 0.0, 2.0]))) * 1.05
    if float(dist.mean()) > d0:
        print(f"FAIL: episodes diverged (mean final dist {dist.mean():.2f} "
              f"> initial {d0:.2f})")
        return 1
    print(f"ok: fused tick-block kernel in {time.time() - t1:.1f}s; "
          f"mean final distance {dist.mean():.3f} m (start {d0:.2f} m)")
    print(f"TPU SMOKE PASS ({time.time() - t0:.1f}s total)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
