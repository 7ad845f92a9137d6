"""L1 mission layer tests (reference global_mission_planner behaviors)."""

import numpy as np

from dart_planner_tpu.common.types import DroneState
from dart_planner_tpu.neural_scene import (
    PlaceholderNeuralScene,
    UncertaintyField,
)
from dart_planner_tpu.planning.global_mission import (
    GlobalMissionConfig,
    GlobalMissionPlanner,
    MissionPhase,
    SemanticWaypoint,
)


def _state(pos):
    return DroneState.create(position=pos)


def test_takeoff_then_navigation_then_landing():
    gmp = GlobalMissionPlanner()
    gmp.set_mission_waypoints(
        [
            SemanticWaypoint(np.array([10.0, 0.0, 5.0]), "safe_zone"),
            SemanticWaypoint(np.array([20.0, 5.0, 5.0]), "landing_pad"),
        ]
    )
    # takeoff phase: goal above start
    goal = gmp.get_current_goal(_state((0.0, 0.0, 0.0)))
    assert gmp.current_phase is MissionPhase.TAKEOFF
    assert goal[2] == 5.0
    # reaching altitude flips to navigation
    goal = gmp.get_current_goal(_state((0.0, 0.0, 4.8)))
    assert gmp.current_phase is MissionPhase.NAVIGATION
    # navigate to wp1
    goal = gmp.get_current_goal(_state((0.0, 0.0, 5.0)))
    np.testing.assert_allclose(goal, [10, 0, 5], atol=1e-6)
    # arriving at wp1 advances to wp2 (landing pad -> +1m hover offset)
    goal = gmp.get_current_goal(_state((9.5, 0.0, 5.0)))
    np.testing.assert_allclose(goal, [20, 5, 6], atol=1e-6)
    # arriving at wp2 -> landing phase, descending goals
    gmp.get_current_goal(_state((20.0, 5.0, 5.5)))
    assert gmp.current_phase is MissionPhase.LANDING
    goal = gmp.get_current_goal(_state((20.0, 5.0, 5.0)))
    assert goal[2] == 4.0  # descend 1 m


def test_emergency_descent():
    gmp = GlobalMissionPlanner()
    gmp.trigger_emergency()
    goal = gmp.get_current_goal(_state((3.0, 3.0, 10.0)))
    assert gmp.current_phase is MissionPhase.EMERGENCY
    assert goal[2] == 8.0  # fast descent


def test_exploration_uses_uncertainty_field():
    uf = UncertaintyField(np.array([[-20, -20, 0], [20, 20, 10]]), resolution=2.0)
    # visiting home reduces local uncertainty; far region stays unknown
    cfg = GlobalMissionConfig(use_neural_scene=True)
    gmp = GlobalMissionPlanner(cfg, uncertainty_field=uf)
    gmp.current_phase = MissionPhase.EXPLORATION
    # start near a corner so the unexplored remainder's centroid is away
    state = _state((-15.0, -15.0, 5.0))
    goal = gmp.get_current_goal(state)
    # goal should be a high-uncertainty region center, not current position
    assert np.linalg.norm(goal - np.asarray([-15, -15, 5])) > 3.0
    assert uf.get_statistics()["mean_uncertainty"] < 1.0  # visit registered


def test_exploration_spiral_fallback():
    gmp = GlobalMissionPlanner()  # no uncertainty field
    gmp.current_phase = MissionPhase.EXPLORATION
    g1 = gmp.get_current_goal(_state((0.0, 0.0, 5.0)))
    g2 = gmp.get_current_goal(_state((0.0, 0.0, 5.0)))
    assert not np.allclose(g1, g2)  # spiral advances
    assert gmp.get_mission_status()["explored_regions"] == 2


def test_uncertainty_field_regions_and_targets():
    uf = UncertaintyField(np.array([[0, 0, 0], [10, 10, 4]]), resolution=1.0)
    # carve out a known (visited) area
    uf.reduce_uncertainty_around_position([2.0, 2.0, 2.0], radius=3.0, factor=0.1)
    regions = uf.identify_high_uncertainty_regions(threshold=0.7)
    assert regions, "unvisited space should form high-uncertainty regions"
    targets = uf.get_exploration_targets([2.0, 2.0, 2.0], max_targets=3)
    assert 1 <= len(targets) <= 3
    # targets lie in the unvisited zone
    assert all(np.linalg.norm(t - [2, 2, 2]) > 2.0 for t in targets)


def test_placeholder_neural_scene_queries():
    scene = PlaceholderNeuralScene(resolution=0.5)
    scene.initialize_scene(np.array([[0, 0, 0], [10, 10, 5]]))
    pts = np.array([[1.0, 1.0, 1.0], [2.0, 2.0, 2.0]])
    scene.update_incremental((pts, np.array([0.9, 0.8])))
    d = np.asarray(scene.query_density(pts))
    np.testing.assert_allclose(d, [0.9, 0.8], atol=1e-6)
    u = np.asarray(scene.query_uncertainty(pts))
    assert (u < 1.0).all()  # observed voxels lose uncertainty
    out = np.asarray(scene.query_density(np.array([[100.0, 0.0, 0.0]])))
    assert out[0] == 0.0  # out of bounds -> empty
    img = scene.render_view(None, (32, 32))
    assert img.shape == (32, 32)
    stats = scene.get_scene_statistics()
    assert stats["updates"] == 1
