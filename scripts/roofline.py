"""Roofline / speed-of-light accounting for the fused solve kernel.

Two parts:

1. A static op-count model of ``ops/pallas_mpc._solver_kernel`` — VPU
   element-ops (with sublane padding, divides/sqrts weighted) and MXU
   passes per solve, as a function of the config. The counts were
   derived by walking the kernel source stage by stage; rerun after any
   kernel change.
2. Measured decomposition on the real chip: total batch-step time plus
   the marginal cost of one CG iteration, one line-search candidate, and
   one Newton round (finite-difference slopes over config variants).

Peak assumptions (TPU v5e / "v5 lite", 1 TensorCore @ ~1.5 GHz75e):
- VPU: vregs are (8 sublanes, 128 lanes), 4 independent ALUs ->
  4096 fp32 element-ops/cycle ~= 6.1e12 elem-ops/s. An FMA counts as
  ONE elem-op under this peak (the ALUs issue one vector op/cycle;
  6.1e12 is therefore the *op-issue* roofline, not a 2x-FLOP marketing
  number). Divide/sqrt/rsqrt go through the special unit; measured ~4x
  an add/mul, counted with weight 4.
- MXU: 4 128x128 systolic arrays; a (128, K)@(K, B) pass streams B
  lanes -> B/4 cycles when XLA splits lanes across MXUs. fp32
  ``Precision.HIGHEST`` = 6 bf16 passes, ``DEFAULT`` = 1 pass.

Usage:
  python scripts/roofline.py            # static model + measure (TPU)
  python scripts/roofline.py --static   # static model only (any host)
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

DIV_W = 4.0  # divide / sqrt weight vs add/mul (special-unit passes)


def pad8(x):
    return -(-x // 8) * 8


def static_counts(N=20, K=8, newton=12, cg=10, n_alphas=6, verbose=True):
    """VPU element-ops and MXU passes per scenario per solve.

    Row conventions: ops on (NP1, B) arrays cost NP1 padded rows per
    scenario; per-axis (N, B) slices cost pad8(N); per-scenario (1, B)
    scalars cost 8 (one sublane tile).
    """
    NP1 = pad8(3 * N)  # 64 for N=20
    RN = pad8(N)  # 24
    R1 = 8  # (1, B) scalar rows

    # --- rollout(u): pos/vel adds + acc FMA (2 HIGHEST matmuls) ---
    rollout_vpu = 3 * NP1
    rollout_mxu_hi = 2

    # --- obstacle_terms per obstacle (on (N,B) axis slices) ---
    # dx,dy,dz subs(3) ; d: 3 mul + 3 add + sqrt(w4) ; viol: sub,max,mul(3)
    # J: mul + reduce (~2) ; grad: coef div(w4)+mul, 3 FMA (6+... )
    # gn: act cmp+2 mul (3), inv_d2 mul+div(4+1), 6 blocks x (mul+FMA) (12)
    obs_cost_only = (3 + 3 + 3 + DIV_W + 3 + 3) * RN  # J rows only
    obs_grad_gn = (
        obs_cost_only
        + (DIV_W + 1 + 6) * RN  # coef + gx/gy/gz FMAs
        + (3 + 1 + DIV_W + 12) * RN  # act, inv_d2, 6 GN blocks
    )

    # --- cost_terms (quadratic densities + hinges + group sum) ---
    # D: pe sub + 4 terms x (mul,mul,add) ~ 13 rows of NP1; ground 4;
    # vel hinge 4; gsum ~1; thrust hinges ~ (sqrt + 6) x2 on RN rows
    cost_terms_vpu = (
        13 * NP1
        + 4 * NP1
        + 4 * NP1
        + NP1
        + K * obs_cost_only
        + 2 * (DIV_W + 6) * RN
    )

    # --- gradient assembly (2 HIGHEST matmuls + pullback adds) ---
    grad_vpu = (
        3 * NP1  # gpos FMA
        + K * obs_grad_gn
        + 5 * NP1  # ground hinge grad + gn diag
        + 6 * NP1  # gvel + vel hinge
        + 4 * NP1  # grad= mm+mm+FMA+FMA assembly adds
        + 2 * (DIV_W + 10) * RN  # thrust hinge grads + rank-1 data
    )
    grad_mxu_hi = 2

    # --- active set + Jacobi diag + minv ---
    mask_vpu = 6 * NP1
    diag_vpu = 6 * NP1 + (DIV_W + 1) * NP1  # cat/adds + max+div
    diag_mxu_hi = 2  # Sp2T, Sv2T

    # --- CG iteration ---
    # matvec: dv*free, penalty apply (15 RN), thrust apply (~20 RN),
    # assembly adds (4 NP1), out*free ; 6 DEFAULT matmuls
    matvec_vpu = NP1 + 15 * RN + 20 * RN + 4 * NP1 + NP1
    # scalars: p*ap + gsum + div + bcast + 3 FMAs + z mul + r*z + gsum + div + p FMA
    cg_scalar_vpu = (
        NP1 + NP1 + (DIV_W * R1) + NP1  # pap, gsum~NP1, alpha, bcast
        + 3 * NP1  # d, r FMAs + z mul
        + 2 * NP1 + DIV_W * R1 + 2 * NP1  # rz_new, beta, p update
    )
    cg_vpu = matvec_vpu + cg_scalar_vpu
    cg_mxu_default = 6

    # --- line search: per candidate = cand clip + rollout + cost_terms
    # + select; cur_cost reuses the rollout ---
    per_alpha_vpu = 3 * NP1 + rollout_vpu + cost_terms_vpu + 2.5 * NP1
    per_alpha_mxu_hi = 2
    linesearch_vpu = cost_terms_vpu + n_alphas * per_alpha_vpu
    linesearch_mxu_hi = n_alphas * per_alpha_mxu_hi

    per_newton_vpu = (
        rollout_vpu + grad_vpu + mask_vpu + diag_vpu
        + cg * cg_vpu + linesearch_vpu
    )
    per_newton_mxu_hi = (
        rollout_mxu_hi + grad_mxu_hi + diag_mxu_hi + linesearch_mxu_hi
    )
    per_newton_mxu_def = cg * cg_mxu_default

    total_vpu = newton * per_newton_vpu
    total_mxu_hi = newton * per_newton_mxu_hi
    total_mxu_def = newton * per_newton_mxu_def

    if verbose:
        print(f"static model (N={N} K={K} newton={newton} cg={cg} "
              f"alphas={n_alphas}, NP1={NP1}):")
        print(f"  VPU elem-ops/solve:        {total_vpu:,.0f}")
        print(f"    gradient+GN stage:       {newton*grad_vpu:,.0f}"
              f"  ({newton*grad_vpu/total_vpu:.0%})")
        print(f"    CG ({cg} iters):          {newton*cg*cg_vpu:,.0f}"
              f"  ({newton*cg*cg_vpu/total_vpu:.0%})")
        print(f"    line search ({n_alphas} alphas): "
              f"{newton*linesearch_vpu:,.0f}"
              f"  ({newton*linesearch_vpu/total_vpu:.0%})")
        print(f"  MXU passes/solve: {total_mxu_hi*6 + total_mxu_def} "
              f"bf16-equivalent ({total_mxu_hi} HIGHEST x6 + "
              f"{total_mxu_def} DEFAULT x1)")
    return {
        "vpu_elem_ops": total_vpu,
        "mxu_passes_bf16_equiv": total_mxu_hi * 6 + total_mxu_def,
        "per_cg_vpu": cg_vpu,
        "per_alpha_vpu": per_alpha_vpu,
        "NP1": NP1,
    }


VPU_PEAK = 4096 * 1.5e9  # elem-ops/s (see module docstring)
MXU_LANES_PER_CYCLE = 4 * 128  # 4 MXUs x 1 lane-column/cycle each


def mxu_seconds_per_block(passes, block_b=1024, clock=1.5e9):
    # one pass streams block_b lane columns; 4 MXUs split them
    return passes * (block_b / MXU_LANES_PER_CYCLE) / clock


def measure(batch=4096):
    import time

    import jax

    from dart_planner_tpu.planning import se3_mpc
    from diag_convergence import make_batch

    config, prob = make_batch(batch)
    u0 = se3_mpc.initialize_thrusts(config, prob)

    def timed(cfg, reps=20, passes=3):
        u = se3_mpc.solve(cfg, prob, u0).thrusts
        float(np.asarray(u[..., 0, 0].sum()))
        best = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            uu = u
            for _ in range(reps):
                uu = se3_mpc.solve(cfg, prob, uu).thrusts
            float(np.asarray(uu[..., 0, 0].sum()))
            total = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(np.asarray(uu[..., 0, 0].sum()))
            rtt = time.perf_counter() - t0
            best = min(best, max(total - rtt, 1e-9) / reps)
        return best

    base = timed(config)
    cg_hi = timed(config._replace(cg_iterations=config.cg_iterations + 5))
    ls_hi = timed(
        config._replace(
            line_search_alphas=config.line_search_alphas + (0.005, 0.002)
        )
    )
    nw_hi = timed(config._replace(max_iterations=config.max_iterations + 4))

    per_cg = (cg_hi - base) / 5 / config.max_iterations
    per_alpha = (ls_hi - base) / 2 / config.max_iterations
    per_newton = (nw_hi - base) / 4

    c = static_counts(
        N=config.prediction_horizon,
        K=8,
        newton=config.max_iterations,
        cg=config.cg_iterations,
        n_alphas=len(config.line_search_alphas),
        verbose=False,
    )
    sps = batch / base
    vpu_rate = c["vpu_elem_ops"] * sps
    print(f"\nmeasured (batch {batch}, platform "
          f"{jax.devices()[0].platform}):")
    print(f"  batch step: {base*1e3:.3f} ms -> {sps:,.0f} solves/s/chip")
    print(f"  marginal: CG iter {per_cg*1e6:.1f} us/iter/newton, "
          f"LS alpha {per_alpha*1e6:.1f} us/alpha/newton, "
          f"newton round {per_newton*1e6:.1f} us")
    print(f"  static VPU ops x measured rate = {vpu_rate:.3e} elem-ops/s")
    print(f"  VPU issue roofline {VPU_PEAK:.3e} -> "
          f"{vpu_rate/VPU_PEAK:.1%} of VPU peak")
    mxu_s = mxu_seconds_per_block(c["mxu_passes_bf16_equiv"]) * (batch / 1024)
    print(f"  modeled MXU busy time {mxu_s*1e3:.3f} ms/batch-step "
          f"({mxu_s/base:.0%} of wall)")
    # per-component efficiency from slopes
    cg_rate = c["per_cg_vpu"] / max(per_cg, 1e-12)
    ls_rate = c["per_alpha_vpu"] / max(per_alpha, 1e-12)
    print(f"  per-CG-iter: {c['per_cg_vpu']:.0f} elem-ops in "
          f"{per_cg*1e6:.1f} us -> {cg_rate*batch/VPU_PEAK:.1%} of peak")
    print(f"  per-LS-alpha: {c['per_alpha_vpu']:.0f} elem-ops in "
          f"{per_alpha*1e6:.1f} us -> {ls_rate*batch/VPU_PEAK:.1%} of peak")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--static", action="store_true")
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args()
    static_counts()
    if not args.static:
        measure(args.batch)
