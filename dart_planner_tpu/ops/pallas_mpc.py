"""Fused Pallas TPU kernel for the condensed SE(3) MPC solve.

One ``pallas_call`` runs the *entire* projected-Newton solve — gradient,
active-set masking, Jacobi-preconditioned CG, and the vectorized projected
line search — with every intermediate living in VMEM. The pure-XLA path
(:func:`dart_planner_tpu.planning.se3_mpc.solve_se3_mpc`) launches dozens
of kernels per Newton iteration and round-trips (batch, 3N) state through
HBM each time; at horizon N=20 the per-solve working set is ~1 KB, so that
path is entirely launch/bandwidth bound (~2% of chip peak). Fusing the
whole solve removes the HBM traffic and launch overhead and turns every
linear map into a shared (3N, 3N) MXU matmul against a lane-major scenario
block.

Data layout ("rows on sublanes, scenarios on lanes"):

- decision/state vectors are ``(NP, B_blk)`` with row index ``a * N + k``
  (axis-major: x steps 0..N-1, then y, then z), zero-padded to ``NP``
  (next multiple of 8) rows; scenario batch occupies the 128-wide lane
  dimension.
- all linear maps (quadratic Hessian, rollout maps S_p / S_v and their
  transposes) are constant ``(NP, NP)`` block-diagonal matrices shared by
  every scenario — ideal MXU shape ``(NP, NP) @ (NP, B_blk)``.
- per-step 3x3 obstacle Gauss-Newton blocks are six ``(N, B)`` arrays
  (symmetric block entries) applied element-wise on the VPU.

Algorithm and semantics are identical to ``solve_se3_mpc`` (same cost
model as reference se3_mpc_planner.py:516-550 with binding hinge
penalties; same Newton/CG/line-search schedule), so the two paths agree
to float32 tolerance — tests/test_pallas_mpc.py checks this on the CPU
interpreter.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dart_planner_tpu.ops import costs, dynamics

Array = jnp.ndarray

_HI = jax.lax.Precision.HIGHEST

# Line-search candidates (must match planning.se3_mpc._ALPHAS).
_ALPHAS = (1.0, 0.5, 0.25, 0.1, 0.03, 0.01)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _block_diag3(m: np.ndarray, np_rows: int) -> np.ndarray:
    """(N, N) per-axis map -> (NP, NP) block-diagonal over the 3 axes."""
    n = m.shape[0]
    out = np.zeros((np_rows, np_rows), np.float32)
    for a in range(3):
        out[a * n : (a + 1) * n, a * n : (a + 1) * n] = m
    return out


@functools.lru_cache(maxsize=32)
def _static_operands(config) -> dict:
    """Per-config constants: block-diagonal maps and row vectors (numpy)."""
    N = config.prediction_horizon
    NP = _round_up(3 * N, 8)
    S_p, S_v, t = dynamics.rollout_matrices(N, float(config.dt))
    m = config.mass
    Spm = (S_p / m).astype(np.float32)
    Svm = (S_v / m).astype(np.float32)
    w = config.weights
    H = costs.quadratic_hessian(N, config.dt, m, config.gravity, w)

    ops = {
        "H3": _block_diag3(H.astype(np.float32), NP),
        "Spm3": _block_diag3(Spm, NP),
        "Spm3T": _block_diag3(Spm.T, NP),
        "Svm3": _block_diag3(Svm, NP),
        "Svm3T": _block_diag3(Svm.T, NP),
        "Sp2T": _block_diag3((Spm * Spm).T, NP),
        "Sv2T": _block_diag3((Svm * Svm).T, NP),
    }

    # (NP, 1) row-vector constants (zero on padded rows).
    def rows(fn):
        v = np.zeros((NP, 1), np.float32)
        for a in range(3):
            for k in range(N):
                v[a * N + k, 0] = fn(a, k)
        return v

    hover = config.mass * config.gravity
    mtt = config.max_thrust * float(np.sin(config.max_tilt_angle))
    lb = np.array([-mtt, -mtt, config.min_thrust], np.float32)
    ub = np.array([mtt, mtt, config.max_thrust], np.float32)
    g_enu = np.array([0.0, 0.0, -config.gravity], np.float32)
    term = float(w.terminal)
    ops["hover"] = rows(lambda a, k: hover if a == 2 else 0.0)
    ops["lb"] = rows(lambda a, k: lb[a])
    ops["ub"] = rows(lambda a, k: ub[a])
    ops["g_acc"] = rows(lambda a, k: g_enu[a])
    # position-error weight per row: w_p, plus terminal multiplier at k=N-1
    ops["wp_row"] = rows(
        lambda a, k: w.position * (1.0 + (term if k == N - 1 else 0.0))
    )
    ops["diag_quad"] = np.ascontiguousarray(
        np.diag(ops["H3"])[:, None]
    ).astype(np.float32)
    # rollout drift terms that multiply p0 / v0 per row
    ops["t_row"] = rows(lambda a, k: float(t[k]))
    # gravity contribution to pos/vel: S_p @ g (per axis), constant
    spg = S_p @ np.ones(N)
    svg = S_v @ np.ones(N)
    ops["spg"] = rows(lambda a, k: float(spg[k]) * g_enu[a])
    ops["svg"] = rows(lambda a, k: float(svg[k]) * g_enu[a])
    ops["NP"] = NP
    return ops


def _solver_kernel(config, use_obstacles: bool, NP: int, KP: int, fast_cg: bool = True):
    """Build the kernel body (all config scalars close over as constants)."""
    N = config.prediction_horizon
    w = config.weights
    inv_m = 1.0 / config.mass
    n_alphas = len(_ALPHAS)
    pad_rows = NP - 3 * N

    w_obs = float(w.obstacle)
    w_g = float(w.ground)
    z_min = float(w.ground_altitude)
    w_vb = float(w.velocity_bound)
    v_max = float(w.max_velocity)
    use_ground = w_g > 0.0
    use_vel_hinge = w_vb > 0.0
    use_penalties = use_obstacles or use_ground or use_vel_hinge

    def axes(x):
        """Split (NP, B) into per-axis (N, B) row blocks."""
        return x[0:N], x[N : 2 * N], x[2 * N : 3 * N]

    def cat_axes(x, y, z):
        parts = [x, y, z]
        if pad_rows:
            parts.append(jnp.zeros((pad_rows, x.shape[1]), x.dtype))
        return jnp.concatenate(parts, axis=0)

    def mm(a, b):
        return jnp.dot(a, b, precision=_HI, preferred_element_type=jnp.float32)

    def mm_fast(a, b):
        """Reduced-precision matmul (single MXU pass, bf16 inputs) for the
        CG matvec only: the inexact-Newton direction tolerates ~1e-2
        relative error because the projected line search guards descent
        and the fp32 gradient/cost decide convergence. ~3x fewer MXU
        passes than Precision.HIGHEST on the dominant FLOP sink."""
        return jnp.dot(
            a, b,
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    mmc = mm_fast if fast_cg else mm  # CG-matvec precision

    def kernel(
        u_ref,
        cpos_ref,
        cvel_ref,
        goal_ref,
        obs_ref,
        mask_ref,
        H3_ref,
        Spm3_ref,
        Spm3T_ref,
        Svm3_ref,
        Svm3T_ref,
        Sp2T_ref,
        Sv2T_ref,
        hover_ref,
        lb_ref,
        ub_ref,
        gacc_ref,
        wp_ref,
        dq_ref,
        out_ref,
    ):
        C_pos = cpos_ref[:]
        C_vel = cvel_ref[:]
        goal = goal_ref[:]
        H3 = H3_ref[:]
        Spm3 = Spm3_ref[:]
        Spm3T = Spm3T_ref[:]
        Svm3 = Svm3_ref[:]
        Svm3T = Svm3T_ref[:]
        Sp2T = Sp2T_ref[:]
        Sv2T = Sv2T_ref[:]
        hover = hover_ref[:]
        lb = lb_ref[:]
        ub = ub_ref[:]
        g_rep = gacc_ref[:]
        wp_row = wp_ref[:]
        diag_quad = dq_ref[:]
        if use_obstacles:
            obs = obs_ref[:]
            omask = mask_ref[:]

        def rollout(uu):
            pos = C_pos + mm(Spm3, uu)
            vel = C_vel + mm(Svm3, uu)
            acc = uu * inv_m + g_rep
            return pos, vel, acc

        def obstacle_terms(pos, want_grad: bool, want_gn: bool):
            """Cost (1,B), pos-space gradient (NP,B), 6 GN block arrays."""
            px, py, pz = axes(pos)
            B = pos.shape[1]
            J = jnp.zeros((1, B), pos.dtype)
            gx = gy = gz = 0.0
            hxx = hyy = hzz = hxy = hxz = hyz = 0.0
            for o in range(KP):
                cx = obs[o : o + 1]
                cy = obs[KP + o : KP + o + 1]
                cz = obs[2 * KP + o : 2 * KP + o + 1]
                r = obs[3 * KP + o : 3 * KP + o + 1]
                mo = omask[o : o + 1]
                dx = px - cx
                dy = py - cy
                dz = pz - cz
                d = jnp.sqrt(dx * dx + dy * dy + dz * dz + 1e-9)
                viol = jnp.maximum(r - d, 0.0) * mo
                J = J + jnp.sum(viol * viol, axis=0, keepdims=True)
                if want_grad:
                    coef = (2.0 * w_obs) * viol / d
                    gx = gx - coef * dx
                    gy = gy - coef * dy
                    gz = gz - coef * dz
                if want_gn:
                    act = ((r > d).astype(d.dtype) * mo) * (2.0 * w_obs)
                    inv_d2 = act / (d * d)
                    hxx = hxx + inv_d2 * dx * dx
                    hyy = hyy + inv_d2 * dy * dy
                    hzz = hzz + inv_d2 * dz * dz
                    hxy = hxy + inv_d2 * dx * dy
                    hxz = hxz + inv_d2 * dx * dz
                    hyz = hyz + inv_d2 * dy * dz
            J = w_obs * J
            grad = None
            if want_grad:
                grad = cat_axes(
                    gx + jnp.zeros_like(px),
                    gy + jnp.zeros_like(px),
                    gz + jnp.zeros_like(px),
                )
            gn = (hxx, hyy, hzz, hxy, hxz, hyz) if want_gn else None
            return J, grad, gn

        def cost_terms(pos, vel, acc, uu):
            """Total cost (1, B) from precomputed rollout."""
            pe = pos - goal
            J = jnp.sum(wp_row * pe * pe, axis=0, keepdims=True)
            J = J + w.velocity * jnp.sum(vel * vel, axis=0, keepdims=True)
            J = J + w.acceleration * jnp.sum(acc * acc, axis=0, keepdims=True)
            du = uu - hover
            J = J + w.thrust * jnp.sum(du * du, axis=0, keepdims=True)
            if use_obstacles:
                Jo, _, _ = obstacle_terms(pos, False, False)
                J = J + Jo
            if use_ground:
                _, _, pz = axes(pos)
                gv = jnp.maximum(z_min - pz, 0.0)
                J = J + w_g * jnp.sum(gv * gv, axis=0, keepdims=True)
            if use_vel_hinge:
                vv = jnp.maximum(jnp.abs(vel) - v_max, 0.0)
                J = J + w_vb * jnp.sum(vv * vv, axis=0, keepdims=True)
            return J

        def newton_body(_, u):
            pos, vel, acc = rollout(u)

            # gradient in physical space, pulled back to thrust space
            gpos = 2.0 * wp_row * (pos - goal)
            if use_obstacles:
                _, g_obs, gn = obstacle_terms(pos, True, True)
                gpos = gpos + g_obs
                hxx, hyy, hzz, hxy, hxz, hyz = gn
            else:
                zero_nb = jnp.zeros((N, u.shape[1]), u.dtype)
                hxx = hyy = hzz = hxy = hxz = hyz = zero_nb
            if use_ground:
                _, _, pz = axes(pos)
                gv = jnp.maximum(z_min - pz, 0.0)
                gpos = gpos + cat_axes(
                    jnp.zeros_like(gv), jnp.zeros_like(gv), -2.0 * w_g * gv
                )
                hzz = hzz + (2.0 * w_g) * (pz < z_min).astype(u.dtype)
            gvel = 2.0 * w.velocity * vel
            if use_vel_hinge:
                vv = jnp.maximum(jnp.abs(vel) - v_max, 0.0)
                gvel = gvel + (2.0 * w_vb) * jnp.sign(vel) * vv
                hv = (2.0 * w_vb) * (jnp.abs(vel) > v_max).astype(u.dtype)
            grad = (
                mm(Spm3T, gpos)
                + mm(Svm3T, gvel)
                + (2.0 * w.acceleration * inv_m) * acc
                + (2.0 * w.thrust) * (u - hover)
            )

            # active-set mask (bound + outward gradient)
            eps = 1e-6
            at_lo = (u <= lb + eps) & (grad > 0)
            at_hi = (u >= ub - eps) & (grad < 0)
            free = (~(at_lo | at_hi)).astype(u.dtype)

            # Jacobi preconditioner diagonal
            diag = diag_quad + jnp.zeros_like(u)
            if use_penalties:
                hp_diag = cat_axes(hxx, hyy, hzz)
                diag = diag + mm(Sp2T, hp_diag)
                if use_vel_hinge:
                    diag = diag + mm(Sv2T, hv)
            minv = free / jnp.maximum(diag, 1e-8)

            def matvec(dv):
                dv = dv * free
                out = mmc(H3, dv)
                if use_penalties:
                    y = mmc(Spm3, dv)
                    yx, yy_, yz = axes(y)
                    zx = hxx * yx + hxy * yy_ + hxz * yz
                    zy = hxy * yx + hyy * yy_ + hyz * yz
                    zz = hxz * yx + hyz * yy_ + hzz * yz
                    out = out + mmc(Spm3T, cat_axes(zx, zy, zz))
                    if use_vel_hinge:
                        yv = mmc(Svm3, dv)
                        out = out + mmc(Svm3T, hv * yv)
                return out * free

            b = -(grad * free)
            r0 = b
            z0 = minv * r0
            rz0 = jnp.sum(r0 * z0, axis=0, keepdims=True)
            d0 = jnp.zeros_like(b)

            def cg_body(_, carry):
                d, r, z, p, rz = carry
                ap = matvec(p)
                pap = jnp.sum(p * ap, axis=0, keepdims=True)
                alpha = rz / jnp.maximum(pap, 1e-12)
                d = d + alpha * p
                r = r - alpha * ap
                z = minv * r
                rz_new = jnp.sum(r * z, axis=0, keepdims=True)
                beta = rz_new / jnp.maximum(rz, 1e-12)
                p = z + beta * p
                return d, r, z, p, rz_new

            d, *_ = jax.lax.fori_loop(
                0, config.cg_iterations, cg_body, (d0, r0, z0, z0, rz0)
            )
            d = d * free

            # projected line search (current iterate is the fallback;
            # strict-improvement update == argmin with earliest-tie rule)
            best_cost = cost_terms(pos, vel, acc, u)
            best_u = u
            for a in range(n_alphas):
                cand = jnp.clip(u + _ALPHAS[a] * d, lb, ub)
                cJ = cost_terms(*rollout(cand), cand)
                better = cJ < best_cost
                best_cost = jnp.where(better, cJ, best_cost)
                best_u = jnp.where(better, cand, best_u)
            return best_u

        u = jax.lax.fori_loop(0, config.max_iterations, newton_body, u_ref[:])
        out_ref[:] = u

    return kernel


def _transpose_rows(x: Array, NP: int) -> Array:
    """(B, N, 3) -> (NP, B) axis-major rows, zero-padded."""
    B, N, _ = x.shape
    xt = jnp.transpose(x, (2, 1, 0)).reshape(3 * N, B)
    return jnp.pad(xt, ((0, NP - 3 * N), (0, 0)))


def _untranspose_rows(xt: Array, N: int) -> Array:
    """(NP, B) -> (B, N, 3)."""
    B = xt.shape[1]
    return jnp.transpose(xt[: 3 * N].reshape(3, N, B), (2, 1, 0))


@functools.partial(
    jax.jit,
    static_argnames=("config", "use_obstacles", "block_b", "interpret", "fast_cg"),
)
def solve_thrusts_fused(
    config,
    prob: costs.Problem,
    u_init: Array,
    use_obstacles: bool = True,
    block_b: int = 256,
    interpret: bool = False,
    fast_cg: bool = True,
) -> Array:
    """Run the fused solve; returns final thrusts with ``u_init``'s shape.

    Accepts any leading batch shape (flattened internally); the scenario
    batch is padded to a multiple of ``block_b`` lanes and blocked across a
    1-D grid.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = config.prediction_horizon
    ops = _static_operands(config)
    NP = ops["NP"]
    K = prob.obstacles.shape[-2]
    KP = _round_up(max(K, 1), 8)

    batch_shape = u_init.shape[:-2]
    B = int(np.prod(batch_shape, dtype=np.int64)) if batch_shape else 1
    # never pad a small batch up to a large block (single-solve fast path)
    block_b = min(block_b, _round_up(max(B, 1), 128))
    Bp = _round_up(max(B, 1), block_b)
    dtype = jnp.float32

    def flat(x, trailing):
        return jnp.broadcast_to(
            jnp.asarray(x, dtype), batch_shape + trailing
        ).reshape((B,) + trailing)

    u0 = flat(u_init, (N, 3))
    p0 = flat(prob.p0, (3,))
    v0 = flat(prob.v0, (3,))
    if prob.goal.ndim == len(batch_shape) + 2:
        goal = flat(prob.goal, (N, 3))
    else:
        goal = jnp.broadcast_to(
            flat(prob.goal, (3,))[:, None, :], (B, N, 3)
        )
    obs = flat(prob.obstacles, (K, 4))
    omask = flat(prob.obstacle_mask.astype(dtype), (K,))

    # rollout constants per scenario: C_pos = p0 + t v0 + S_p g,  C_vel = ...
    t_row = jnp.asarray(ops["t_row"], dtype)  # (NP, 1)
    spg = jnp.asarray(ops["spg"], dtype)
    svg = jnp.asarray(ops["svg"], dtype)

    def rep3(x):  # (B, 3) -> (NP, B) per-axis constant rows
        xt = jnp.repeat(x.T, N, axis=0)  # (3N, B)
        return jnp.pad(xt, ((0, NP - 3 * N), (0, 0)))

    C_pos = rep3(p0) + t_row * rep3(v0) + spg
    C_vel = rep3(v0) + svg
    u0_t = _transpose_rows(u0, NP)
    goal_t = _transpose_rows(goal, NP)

    # obstacles: rows [cx*KP, cy*KP, cz*KP, r*KP]
    obs_p = jnp.pad(obs, ((0, 0), (0, KP - K), (0, 0)))
    obs_t = jnp.transpose(obs_p, (2, 1, 0)).reshape(4 * KP, B)
    mask_t = jnp.pad(omask, ((0, 0), (0, KP - K))).T  # (KP, B)

    def pad_b(x):
        return jnp.pad(x, ((0, 0), (0, Bp - B)))

    per_block = [
        pad_b(u0_t),
        pad_b(C_pos),
        pad_b(C_vel),
        pad_b(goal_t),
        pad_b(obs_t),
        pad_b(mask_t),
    ]
    shared_names = ["H3", "Spm3", "Spm3T", "Svm3", "Svm3T", "Sp2T", "Sv2T"]
    shared = [jnp.asarray(ops[k], dtype) for k in shared_names]
    vec_names = ["hover", "lb", "ub", "g_acc", "wp_row", "diag_quad"]
    vecs = [jnp.asarray(ops[k], dtype) for k in vec_names]

    grid = (Bp // block_b,)
    bspec = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, block_b), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    const_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = (
        [bspec(NP)] * 4
        + [bspec(4 * KP), bspec(KP)]
        + [const_spec((NP, NP))] * len(shared)
        + [const_spec((NP, 1))] * len(vecs)
    )

    kernel = _solver_kernel(config, use_obstacles, NP, KP, fast_cg=fast_cg)
    u_out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NP, Bp), dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=bspec(NP),
        interpret=interpret,
    )(*per_block, *shared, *vecs)

    u_final = _untranspose_rows(u_out[:, :B], N)
    return u_final.reshape(batch_shape + (N, 3)).astype(u_init.dtype)
