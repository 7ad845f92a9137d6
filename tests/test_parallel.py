"""Fleet sharding tests on the virtual 8-device CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dart_planner_tpu.parallel import scenario
from dart_planner_tpu.planning import se3_mpc


def _random_problem(config, batch, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.normal(0, 2, (batch, 3)).astype(np.float32) + [0, 0, 5]
    vel = rng.normal(0, 1, (batch, 3)).astype(np.float32)
    goal = rng.normal(0, 5, (batch, 3)).astype(np.float32) + [0, 0, 5]
    return se3_mpc.make_problem(pos, vel, goal, config=config)


def test_mesh_shapes():
    mesh = scenario.make_fleet_mesh()
    assert mesh.devices.size == 8
    mesh2 = scenario.make_fleet_mesh(hosts=2)
    assert mesh2.shape == {"hosts": 2, "devices": 4}
    with pytest.raises(ValueError):
        scenario.make_fleet_mesh(hosts=3)


def test_fleet_matches_single_chip():
    # strictly convex instance (hinge penalties off): the Newton path has
    # no near-tie line-search branches, so sharded and direct execution
    # must agree to float tolerance regardless of fusion/reduction order
    config = se3_mpc.SE3MPCConfig(
        prediction_horizon=10,
        max_iterations=6,
        ground_weight=0.0,
        velocity_bound_weight=0.0,
        tilt_weight=0.0,
        thrust_norm_weight=0.0,
    )
    batch = 32
    prob = _random_problem(config, batch)

    ref = se3_mpc.solve_se3_mpc(config, prob, use_obstacles=False)

    mesh = scenario.make_fleet_mesh(hosts=2)
    prob_s = scenario.shard_scenarios(prob, mesh)
    res, stats = scenario.solve_fleet(config, mesh, prob_s, use_obstacles=False)

    np.testing.assert_allclose(
        np.asarray(res.thrusts), np.asarray(ref.thrusts), rtol=1e-4, atol=1e-4
    )
    assert int(stats.total) == batch
    assert float(stats.converged) == float(jnp.sum(ref.converged))
    np.testing.assert_allclose(
        float(stats.mean_cost), float(jnp.mean(ref.cost)), rtol=1e-5
    )


def test_fleet_sharded_layout():
    config = se3_mpc.SE3MPCConfig(prediction_horizon=10, max_iterations=4)
    mesh = scenario.make_fleet_mesh(hosts=2)
    prob = scenario.shard_scenarios(_random_problem(config, 64), mesh)
    res, _ = scenario.solve_fleet(config, mesh, prob, use_obstacles=False)
    # result stays sharded over the whole mesh (no implicit gather)
    assert len(res.thrusts.sharding.device_set) == 8


def test_fleet_with_obstacles_runs():
    config = se3_mpc.SE3MPCConfig(prediction_horizon=10, max_iterations=4)
    mesh = scenario.make_fleet_mesh()
    batch = 16
    rng = np.random.default_rng(1)
    obs = np.concatenate(
        [rng.normal(0, 3, (batch, 2, 3)), rng.uniform(0.3, 1.0, (batch, 2, 1))],
        axis=-1,
    ).astype(np.float32)
    prob = se3_mpc.make_problem(
        rng.normal(0, 2, (batch, 3)).astype(np.float32) + [0, 0, 5],
        np.zeros((batch, 3), np.float32),
        rng.normal(0, 5, (batch, 3)).astype(np.float32) + [0, 0, 5],
        obstacles=obs,
        config=config,
    )
    prob = scenario.shard_scenarios(prob, mesh)
    res, stats = scenario.solve_fleet(config, mesh, prob)
    assert np.isfinite(np.asarray(res.cost)).all()
    assert int(stats.total) == batch


def test_fleet_composes_with_per_scenario_v_cap():
    """Regression (round-4 advisor): solve_fleet's in_specs must mirror
    the actual Problem pytree — a fleet carrying per-scenario velocity
    caps (the unknown-space slowdown feature) used to crash with a
    spec/structure mismatch."""
    config = se3_mpc.SE3MPCConfig(
        prediction_horizon=10, max_iterations=6, tail_iterations=0
    )
    batch = 32
    prob = _random_problem(config, batch, seed=4)
    caps = np.full((batch,), 1.5, np.float32)
    prob = prob._replace(v_cap=jnp.asarray(caps))
    mesh = scenario.make_fleet_mesh()
    prob_s = scenario.shard_scenarios(prob, mesh)
    res, stats = scenario.solve_fleet(config, mesh, prob_s)
    assert np.all(np.isfinite(np.asarray(res.cost)))
    # the 1.5 m/s cap must actually bind vs an uncapped solve
    res_free, _ = scenario.solve_fleet(
        config, mesh, prob_s._replace(v_cap=None)
    )
    v_cap = float(jnp.max(jnp.abs(res.velocities)))
    v_free = float(jnp.max(jnp.abs(res_free.velocities)))
    assert v_cap < v_free
