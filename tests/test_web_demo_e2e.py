"""End-to-end web-demo test (reference parity:
/root/reference/tests/e2e/test_web_demo_e2e.py:1-108).

Boots ``apps.web_demo.main`` in-process (stdlib HTTP server + websocket
broadcaster), then drives the full demo loop through its public surface:
scenario catalogue -> health/status -> start a scenario -> receive live
``state_update`` WebSocket frames produced by the REAL stack (SE(3) MPC
replans + simulated vehicle) -> stop -> status reflects idle. Also the
error surface: unknown scenario 404, double-start 409.
"""

import asyncio
import json
import socket
import threading
import time
import urllib.request

import pytest

from dart_planner_tpu.apps import web_demo


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _get(port, path):
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=10
        ) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(port, path):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", method="POST"
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def demo_server():
    # find a port pair (REST on p, WebSocket on p+1)
    for _ in range(20):
        port = _free_port()
        with socket.socket() as s:
            if s.connect_ex(("127.0.0.1", port + 1)) != 0:
                break
    metrics_port = _free_port()
    t = threading.Thread(
        target=lambda: asyncio.run(
            web_demo.main(port=port, duration=240,
                          metrics_port=metrics_port)
        ),
        daemon=True,
    )
    t.start()
    deadline = time.time() + 30
    while time.time() < deadline:
        try:
            status, body = _get(port, "/api/health")
            if status == 200 and body["status"] == "healthy":
                return port, metrics_port
        except OSError:
            time.sleep(0.2)
    pytest.fail("web demo server did not come up")


def test_scenario_catalogue_and_page(demo_server):
    port, _ = demo_server
    status, scenarios = _get(port, "/api/scenarios")
    assert status == 200
    # reference catalogue parity (demos/web_demo/app.py:142-190)
    assert set(scenarios) == {
        "obstacle_avoidance", "precision_landing",
        "edge_autonomy", "multi_waypoint",
    }
    for sc in scenarios.values():
        assert {"name", "description", "start_pos", "goal_pos"} <= set(sc)
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/", timeout=10
    ) as r:
        page = r.read().decode()
    assert "WebSocket" in page and "api/scenarios" in page


def test_error_surface(demo_server):
    port, _ = demo_server
    status, body = _post(port, "/api/start/not_a_scenario")
    assert status == 404 and "unknown" in body["error"]
    status, _ = _get(port, "/api/nope")
    assert status == 404


def test_full_demo_flight(demo_server):
    """Start a real scenario, watch live frames stream over the
    WebSocket while the planner actually solves, then stop."""
    from websockets.sync.client import connect

    port, _ = demo_server
    with connect(f"ws://127.0.0.1:{port + 1}", open_timeout=15) as ws:
        status, body = _post(port, "/api/start/precision_landing")
        assert status == 200 and "started" in body["message"]

        # double-start must be rejected while running
        status, body = _post(port, "/api/start/edge_autonomy")
        assert status == 409

        status, st = _get(port, "/api/status")
        assert st["is_running"] and st["current_scenario"] == (
            "precision_landing"
        )
        assert st["connected_clients"] == 1

        frames = []
        deadline = time.time() + 120
        while len(frames) < 3 and time.time() < deadline:
            msg = json.loads(ws.recv(timeout=90))
            if msg["type"] == "state_update":
                frames.append(msg)
        assert len(frames) >= 3, "no live state frames received"

        f = frames[-1]
        # message-shape parity (demos/web_demo/app.py:383-407)
        assert {"drone_state", "plan", "trajectory", "performance",
                "scenario", "goal", "status"} <= set(f)
        assert f["scenario"] == "precision_landing"
        assert len(f["plan"]) == 20  # N=20 horizon from the real solver
        perf = f["performance"]
        # metrics are MEASURED (planner ran): planning time is a real
        # positive duration and the success-rate counter advanced
        assert perf["planning_time_ms"] > 0.0
        assert perf["success_rate"] > 0.0
        assert perf["mapping_queries_per_sec"] > 0.0
        # the vehicle is descending toward the pad (start z=20, goal 0.5)
        z0 = frames[0]["drone_state"]["position"][2]
        z1 = frames[-1]["drone_state"]["position"][2]
        assert z1 <= z0 + 0.5

        status, _ = _post(port, "/api/stop")
        assert status == 200

    deadline = time.time() + 10
    while time.time() < deadline:
        _, st = _get(port, "/api/status")
        if not st["is_running"]:
            break
        time.sleep(0.2)
    assert not st["is_running"]


def test_metrics_endpoint_serves_flight_metrics(demo_server):
    """The deploy/ stack's scrape target: after a flight,
    /metrics carries measured planner quantiles + the replan counter
    in Prometheus text-exposition format."""
    port, metrics_port = demo_server
    with urllib.request.urlopen(
        f"http://127.0.0.1:{metrics_port}/metrics", timeout=10
    ) as r:
        assert r.status == 200
        assert "text/plain" in r.headers["Content-Type"]
        body = r.read().decode()
    # recorded by the flight loop in test_full_demo_flight
    assert "dart_replans_total" in body
    assert 'dart_planning_time_ms{quantile="95"}' in body
    assert "dart_tracking_error_m" in body
