"""Voxel mapper tests (reference behaviors: test_mapper_trace_ray.py,
test_se3_mpc_with_mapper.py)."""

import jax.numpy as jnp
import numpy as np

from dart_planner_tpu.perception import (
    GeometricMapper,
    MapperConfig,
    create_map,
    extract_obstacles,
    query_occupancy,
    simulate_lidar_scan,
    update_with_scan,
    is_trajectory_safe,
)


def test_unknown_is_prior():
    m = GeometricMapper()
    assert np.isclose(m.query_occupancy(np.array([0.0, 0.0, 0.0])), 0.5)
    # out of bounds also prior
    assert np.isclose(m.query_occupancy(np.array([1e4, 0.0, 0.0])), 0.5)


def test_hit_raises_miss_lowers():
    m = GeometricMapper()
    origin = np.array([0.0, 0.0, 5.0])
    direction = np.array([1.0, 0.0, 0.0])
    m.update_map(origin[None], direction[None], np.array([10.0]))
    hit_point = origin + 10.0 * direction
    mid_point = origin + 5.0 * direction
    assert m.query_occupancy(hit_point) > 0.5
    assert m.query_occupancy(mid_point) < 0.5


def test_repeated_hits_saturate():
    m = GeometricMapper()
    origin = np.array([0.0, 0.0, 5.0])
    direction = np.array([1.0, 0.0, 0.0])
    for _ in range(20):
        m.update_map(origin[None], direction[None], np.array([10.0]))
    assert m.query_occupancy(origin + 10.0 * direction) > 0.95
    assert m.query_occupancy(origin + 5.0 * direction) < 0.05


def test_add_obstacle_and_safety():
    m = GeometricMapper()
    m.add_obstacle(np.array([5.0, 0.0, 5.0]), 1.0)
    assert m.is_collision(np.array([5.0, 0.0, 5.0]))
    assert not m.is_collision(np.array([-5.0, 0.0, 5.0]))
    through = np.stack(
        [np.linspace([0, 0, 5], [10, 0, 5], 20)]
    ).astype(np.float32)[0]
    around = through + np.array([0.0, 8.0, 0.0], np.float32)
    assert not m.is_trajectory_safe(through, safety_margin=0.5)
    assert m.is_trajectory_safe(around, safety_margin=0.5)


def test_lidar_scan_exact_ranges():
    config = MapperConfig()
    pos = jnp.asarray([0.0, 0.0, 5.0])
    obstacles = jnp.asarray([[10.0, 0.0, 5.0, 1.0]])
    mask = jnp.ones(1, bool)
    origins, dirs, dists = simulate_lidar_scan(config, pos, obstacles, mask, 360)
    d = np.asarray(dists)
    # ray 0 points +x: hits sphere at distance 10 - 1 = 9
    assert np.isclose(d[0], 9.0, atol=1e-4)
    # ray 180 points -x: miss
    assert np.isinf(d[180])
    assert np.isinf(d).sum() > 300


def test_scan_to_obstacles_to_planner_roundtrip():
    """lidar -> map -> extract obstacles -> they cover the true sphere."""
    m = GeometricMapper()
    true_center = np.array([8.0, 0.0, 5.0])
    obstacles = jnp.asarray([[8.0, 0.0, 5.0, 1.0]])
    pos = np.array([0.0, 0.0, 5.0], np.float32)
    for _ in range(5):
        o, d, t = m.simulate_lidar_scan(pos, obstacles)
        m.update_map(o, d, t)
    obs, mask = m.extract_obstacles(pos, max_obstacles=8, size_cells=48)
    assert mask.any()
    dist = np.linalg.norm(obs[mask][:, :3] - true_center, axis=-1)
    # extracted voxels sit on the sphere surface facing the sensor
    assert (np.abs(dist - 1.0) < 1.0).all()


def test_batched_maps_vmap():
    """Maps are pytrees: a batch of maps updates under vmap."""
    import jax

    config = MapperConfig(grid_size=(32, 32, 16), origin=(-8.0, -8.0, -4.0))
    B = 4
    maps = jax.vmap(lambda _: create_map(config))(jnp.arange(B))
    origins = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (B, 8, 1))
    dirs = jnp.tile(jnp.asarray([1.0, 0.0, 0.0]), (B, 8, 1))
    hits = jnp.full((B, 8), 4.0)
    maps2 = jax.vmap(lambda mm, o, dd, h: update_with_scan(config, mm, o, dd, h))(
        maps, origins, dirs, hits
    )
    occ = jax.vmap(
        lambda mm: query_occupancy(config, mm, jnp.asarray([4.0, 0.0, 1.0]))
    )(maps2)
    assert (np.asarray(occ) > 0.5).all()


def test_query_observed_distinguishes_unknown_from_uncertain():
    """query_observed exposes the unknown-space signal the reference
    surfaces as prior 0.5 (EGM:154-169): a never-seen voxel and an
    out-of-grid point are unobserved; any scanned voxel is observed even
    if its occupancy is near 0.5."""
    from dart_planner_tpu.perception import query_observed

    m = GeometricMapper()
    origin = np.array([0.0, 0.0, 5.0])
    direction = np.array([1.0, 0.0, 0.0])
    m.update_map(origin[None], direction[None], np.array([10.0]))
    pts = jnp.asarray(
        [
            [5.0, 0.0, 5.0],  # on the ray: observed (free)
            [10.0, 0.0, 5.0],  # hit cell: observed (occupied)
            [5.0, 20.0, 5.0],  # never scanned: unknown
            [1e4, 0.0, 5.0],  # out of grid: unknown
        ]
    )
    seen = np.asarray(query_observed(m.config, m.map, pts))
    assert seen.tolist() == [True, True, False, False]


def test_corridor_observed_fraction_profiles_scan_coverage():
    """Corridor samples inside the scanned region report high observed
    fraction; samples beyond the scan walk report ~0."""
    from dart_planner_tpu.perception import corridor_observed_fraction

    # short-range sensor so the corridor tail stays genuinely unscanned
    cfg = MapperConfig(
        resolution=0.5, grid_size=(64, 64, 32), origin=(-16.0, -16.0, -4.0),
        max_range=3.0,
    )
    vm = create_map(cfg)
    # scans around the first quarter of the corridor only
    start = jnp.asarray([0.0, 0.0, 3.0])
    goal = jnp.asarray([10.0, 0.0, 3.0])
    no_obs = jnp.zeros((1, 4), jnp.float32)
    no_mask = jnp.zeros((1,), bool)
    for frac in (0.0, 0.25):
        for dz in (-0.5, 0.0, 0.5):
            pos = start + frac * (goal - start) + jnp.asarray([0, 0, dz])
            o, d, hd = simulate_lidar_scan(cfg, pos, no_obs, no_mask, 360)
            vm = update_with_scan(cfg, vm, o, d, hd)
    frac_obs = np.asarray(
        corridor_observed_fraction(cfg, vm, start, goal, num_samples=10)
    )
    # scanned head of the corridor observed; unscanned tail unknown
    assert frac_obs[:3].min() > 0.6
    assert frac_obs[-2:].max() < 0.3
    assert frac_obs[0] > frac_obs[-1]
