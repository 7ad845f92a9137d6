"""App-layer integration tests: full three-layer stack over real sockets
(reference edge<->cloud flow, SURVEY.md section 3.2/3.3)."""

import asyncio

import numpy as np
import pytest

from dart_planner_tpu.apps.cloud import ThreeLayerCloudController
from dart_planner_tpu.apps.edge import EdgeConfig, EdgeController, FailsafeTier
from dart_planner_tpu.apps.minimal_takeoff import minimal_takeoff
from dart_planner_tpu.comms import SecureSerializer
from dart_planner_tpu.planning.se3_mpc import SE3MPCConfig


def test_cli_parses():
    from dart_planner_tpu.apps.cli import main

    with pytest.raises(SystemExit):
        main([])  # no command
    with pytest.raises(SystemExit):
        main(["run"])  # missing --mode


def test_minimal_takeoff_flies():
    out = asyncio.run(minimal_takeoff(altitude=3.0, hover_s=1.0))
    assert out["peak_altitude"] > 2.0
    assert out["final_altitude"] < 1.5  # came back down


@pytest.mark.slow
def test_three_layer_edge_cloud_roundtrip():
    """cloud plans at 10 Hz over ZMQ in a separate process (as deployed);
    edge flies the plans in-process (stack 3.2+3.3). Wall-clock coupled,
    so retried once: on a saturated 2-CPU box the edge can get too few
    sim-seconds to climb (the reference marks such tests flaky-rerun)."""
    last_error = None
    for _attempt in range(2):
        try:
            _run_roundtrip()
            return
        except AssertionError as e:
            last_error = e
    raise last_error


def _run_roundtrip():
    import os
    import subprocess
    import sys
    import time

    key = "app-test-key"
    env = {
        **os.environ,
        "DART_ZMQ_SECRET": key,
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": os.pathsep.join(
            [os.path.dirname(os.path.dirname(__file__))]
            + os.environ.get("PYTHONPATH", "").split(os.pathsep)
        ),
    }
    proc = subprocess.Popen(
        [
            sys.executable,
            "-c",
            "import jax; jax.config.update('jax_platforms', 'cpu');"
            "import asyncio; from dart_planner_tpu.apps import cloud;"
            "asyncio.run(cloud.main(port=5733, duration=60.0))",
        ],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        async def scenario():
            edge = EdgeController(
                EdgeConfig(
                    cloud_port=5733,
                    control_frequency=50.0,
                    # generous decay windows: the cloud process spends its
                    # first ~10 s jit-compiling on the 2-CPU CI box
                    degraded_after_s=2.0,
                    autonomous_after_s=30.0,
                    emergency_after_s=120.0,
                ),
                serializer=SecureSerializer(secret_key=key),
            )
            edge.vehicle.rb = edge.vehicle.rb._replace(
                position=np.asarray([0.0, 0.0, 2.0], np.float32)
            )
            edge.vehicle.step()  # pre-warm the control-path compiles
            stats = await edge.run(duration=30.0)
            edge.stop()
            return stats

        stats = asyncio.run(scenario())
    finally:
        proc.terminate()
        proc.wait(timeout=10)
    # cloud link came up and the edge flew its plans
    assert stats["tier"] in (
        FailsafeTier.NOMINAL.value,
        FailsafeTier.DEGRADED.value,
    ), stats
    assert stats["ticks"] > 100, stats
    # the vehicle climbed toward the takeoff-phase goal (z=5)
    assert float(stats["final_position"][2]) > 2.3, stats


def test_edge_failsafe_without_cloud():
    async def scenario():
        edge = EdgeController(
            EdgeConfig(
                cloud_port=5799,  # nobody there
                control_frequency=100.0,
                degraded_after_s=0.1,
                autonomous_after_s=0.3,
                emergency_after_s=1.2,
            )
        )
        stats = await edge.run(duration=3.0)
        edge.stop()
        return stats

    stats = asyncio.run(scenario())
    # without a cloud the tier decays to EMERGENCY and the loop stops early
    assert stats["tier"] == FailsafeTier.EMERGENCY.value


def test_cli_serves_metrics_endpoint(monkeypatch):
    """DART_METRICS_PORT exposes the Prometheus exposition for any CLI
    mode (the deploy/ stack's scrape target; deploy/docker-compose.yml
    runs `cli run --mode=cloud` with it set)."""
    import json
    import socket
    import urllib.request

    from dart_planner_tpu.apps import cli

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    monkeypatch.setenv("DART_METRICS_PORT", str(port))

    captured = {}
    real_serve = None
    from dart_planner_tpu.common import metrics as metrics_mod

    orig = metrics_mod.MetricsManager.serve

    def spy(self, p, host="127.0.0.1"):
        srv = orig(self, p, host)
        captured["server"] = srv
        # probe while alive (cli shuts it down before returning)
        with urllib.request.urlopen(
            f"http://127.0.0.1:{p}/metrics", timeout=5
        ) as r:
            captured["status"] = r.status
            captured["body"] = r.read().decode()
        return srv

    monkeypatch.setattr(metrics_mod.MetricsManager, "serve", spy)
    metrics_mod.get_metrics().increment("cli_test_marker")
    rc = cli.main(["run", "--mode=edge", "--duration", "1"])
    assert rc == 0
    assert captured["status"] == 200
    assert "dart_cli_test_marker_total" in captured["body"]
