"""Characterize the slowly-converging solver tail: bound-activity of the
projected gradient, cost-vs-iteration shape, and line-search sensitivity."""

import numpy as np
import jax
import jax.numpy as jnp

from dart_planner_tpu.planning import se3_mpc
from dart_planner_tpu.ops import costs
from dart_planner_tpu.common import frames

from diag_convergence import make_batch
from diag_newton_decrement import newton_decrement


def main():
    config, prob = make_batch(4096)
    u0 = se3_mpc.initialize_thrusts(config, prob)
    print(f"platform={jax.devices()[0].platform}")

    gt_cfg = config._replace(max_iterations=60, cg_iterations=25)
    gt = se3_mpc.solve(gt_cfg, prob, u0, method="xla")
    gt_cost = np.asarray(gt.cost, np.float64)

    res12 = se3_mpc.solve(config, prob, u0, method="xla")
    nd, _ = jax.jit(newton_decrement, static_argnums=0)(
        config, prob, res12.thrusts
    )
    tail = np.asarray(nd) > 1e-5
    print(f"tail fraction at 12 iters: {tail.mean():.4f}")

    # (a) is the tail's projected gradient concentrated near bounds?
    N = config.prediction_horizon
    dtype = res12.thrusts.dtype
    gvec = frames.gravity_vector(frames.WorldFrame.ENU, config.gravity).astype(dtype)
    lb, ub = config.thrust_bounds(dtype)
    lb_full = jnp.broadcast_to(lb, (N, 3))
    ub_full = jnp.broadcast_to(ub, (N, 3))
    u = res12.thrusts
    g = costs.condensed_grad(u, prob, config.weights, config.dt, config.mass, gvec)
    pg = np.asarray(jnp.clip(u - g, lb_full, ub_full) - u)
    near_bound = np.asarray(
        (u <= lb_full + 1e-2) | (u >= ub_full - 1e-2)
    )
    pg2 = pg**2
    frac_bound = (pg2 * near_bound).sum(axis=(-1, -2)) / np.maximum(
        pg2.sum(axis=(-1, -2)), 1e-12
    )
    print(
        "tail: |pg|^2 fraction on near-bound coords p50/p90:",
        f"{np.percentile(frac_bound[tail], 50):.3f}",
        f"{np.percentile(frac_bound[tail], 90):.3f}",
    )

    # obstacle proximity: fraction of tail scenarios whose trajectory is
    # inside an (inflated) obstacle hinge region
    pos = np.asarray(res12.positions)  # (B, N, 3)
    obs = np.asarray(prob.obstacles)  # (B, K, 4)
    mask = np.asarray(prob.obstacle_mask)
    d = np.linalg.norm(pos[:, None, :, :] - obs[:, :, None, :3], axis=-1)
    inflated = obs[:, :, 3:4] + config.safety_margin
    inside = ((d < inflated) & mask[:, :, None]).any(axis=(1, 2))
    print(
        f"hinge-active (inside margin) fraction: tail={inside[tail].mean():.3f} "
        f"converged={inside[~tail].mean():.3f}"
    )

    # (b) cost-vs-iteration shape for the tail cohort
    print("iters  tail-median-excess  tail-p95-excess")
    for k in (12, 16, 20, 28, 40):
        r = se3_mpc.solve(config._replace(max_iterations=k), prob, u0, method="xla")
        excess = (np.asarray(r.cost, np.float64) - gt_cost) / np.maximum(
            np.abs(gt_cost), 1e-9
        )
        print(
            f"{k:5d}  {np.median(excess[tail]):.3e}          "
            f"{np.percentile(excess[tail], 95):.3e}"
        )

    # (c) line-search grids (same 12-iteration budget), threaded through
    # SE3MPCConfig.line_search_alphas so each variant really retraces
    grids = {
        "default(6)": config.line_search_alphas,
        "wide(12)": (
            1.5, 1.0, 0.7, 0.5, 0.35, 0.25, 0.15, 0.1, 0.06, 0.03, 0.015,
            0.007,
        ),
        "overrelax(8)": (4.0, 2.0, 1.0, 0.5, 0.25, 0.1, 0.03, 0.01),
    }
    for name, grid in grids.items():
        cfg = config._replace(line_search_alphas=tuple(grid))
        r = se3_mpc.solve(cfg, prob, u0, method="xla")
        ndk, _ = jax.jit(newton_decrement, static_argnums=0)(
            cfg, prob, r.thrusts
        )
        excess = (np.asarray(r.cost, np.float64) - gt_cost) / np.maximum(
            np.abs(gt_cost), 1e-9
        )
        print(
            f"grid {name:13s}: conv(ftol)="
            f"{float(np.asarray(r.converged).mean()):.4f} "
            f"conv(nd<1e-5)={float((np.asarray(ndk) < 1e-5).mean()):.4f} "
            f"p95 excess={np.percentile(excess, 95):.2e}"
        )


if __name__ == "__main__":
    main()
