"""Perception: JAX-native probabilistic voxel mapping.

Re-design of the reference ``ExplicitGeometricMapper``
(/root/reference/src/dart_planner/perception/explicit_geometric_mapper.py):
the sparse dict-of-voxels becomes a dense fixed-extent log-odds grid so
Bayesian updates, occupancy queries, trajectory-safety checks, and
obstacle extraction are all fixed-shape array ops that jit/vmap/shard.
"""

from dart_planner_tpu.perception.mapper import (
    MapperConfig,
    VoxelMap,
    create_map,
    update_with_scan,
    query_occupancy,
    query_observed,
    corridor_observed_fraction,
    is_trajectory_safe,
    local_occupancy_grid,
    extract_obstacles,
    simulate_lidar_scan,
    GeometricMapper,
)

__all__ = [
    "MapperConfig",
    "VoxelMap",
    "create_map",
    "update_with_scan",
    "query_occupancy",
    "query_observed",
    "corridor_observed_fraction",
    "is_trajectory_safe",
    "local_occupancy_grid",
    "extract_obstacles",
    "simulate_lidar_scan",
    "GeometricMapper",
]
