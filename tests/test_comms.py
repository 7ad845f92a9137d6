"""Communication tests: real ZMQ sockets on localhost between threads
(reference test_communication_flow.py / test_heartbeat_safety.py scope)."""

import asyncio
import time

import numpy as np
import pytest

from dart_planner_tpu.common.errors import CommunicationError, SecurityError
from dart_planner_tpu.comms import (
    CompressionType,
    HeartbeatConfig,
    HeartbeatMonitor,
    SecureSerializer,
    TelemetryCompressor,
    ZmqClient,
    ZmqServer,
)


# ---- serializer ----
def test_serializer_roundtrip_numpy():
    s = SecureSerializer(test_mode=True)
    obj = {
        "pos": np.array([1.0, 2.0, 3.0], np.float32),
        "traj": np.arange(12).reshape(4, 3),
        "label": "hello",
        "n": 7,
    }
    out = s.deserialize(s.serialize(obj))
    np.testing.assert_allclose(out["pos"], [1, 2, 3])
    assert out["traj"].shape == (4, 3) and out["traj"].dtype == np.int64
    assert out["label"] == "hello" and out["n"] == 7


def test_serializer_rejects_tampering():
    s = SecureSerializer(test_mode=True)
    raw = bytearray(s.serialize({"cmd": "land"}))
    # flip a byte inside the payload region
    idx = raw.find(b"land")
    raw[idx] = ord("x")
    with pytest.raises((SecurityError, CommunicationError)):
        s.deserialize(bytes(raw))


def test_serializer_rejects_cross_key():
    a = SecureSerializer(secret_key="key-a")
    b = SecureSerializer(secret_key="key-b")
    with pytest.raises(SecurityError):
        b.deserialize(a.serialize({"x": 1}))


def test_serializer_ttl_expiry():
    s = SecureSerializer(test_mode=True, message_ttl=0)
    raw = s.serialize({"x": 1})
    time.sleep(0.01)
    with pytest.raises(SecurityError):
        s.deserialize(raw)


# ---- zmq ----
def test_zmq_request_reply_roundtrip():
    serializer = SecureSerializer(secret_key="shared-test-key")
    server = ZmqServer(port=5591, serializer=serializer)
    server.add_handler("echo", lambda data: {"echoed": data})
    server.add_handler(
        "state", lambda data: {"pos": np.array([1.0, 2.0, 3.0])}
    )
    server.start()
    try:
        client = ZmqClient(
            port=5591,
            timeout_ms=2000,
            serializer=SecureSerializer(secret_key="shared-test-key"),
        )
        out = client.send_request("echo", {"v": 42})
        assert out == {"echoed": {"v": 42}}
        out2 = client.send_request("state")
        np.testing.assert_allclose(out2["pos"], [1, 2, 3])
        with pytest.raises(CommunicationError):
            client.send_request("nope")
        client.close()
    finally:
        server.stop()


def test_zmq_client_timeout_reconnects():
    client = ZmqClient(port=5599, timeout_ms=200)  # nobody listening
    with pytest.raises(CommunicationError):
        client.send_request("ping")
    client.close()


# ---- heartbeat ----
def test_heartbeat_triggers_emergency_on_loss():
    events = []

    async def main():
        mon = HeartbeatMonitor(
            HeartbeatConfig(interval_ms=20, timeout_ms=80),
            emergency_callback=lambda: events.append("emergency"),
        )
        mon.start_monitoring()
        # feed heartbeats for a while -> no emergency
        for _ in range(5):
            await asyncio.sleep(0.02)
            await mon.heartbeat_received()
        assert not mon.emergency_triggered
        # stop feeding -> emergency fires
        await asyncio.sleep(0.3)
        mon.stop_monitoring()
        return mon

    mon = asyncio.run(main())
    assert mon.emergency_triggered
    assert events == ["emergency"]
    assert mon.get_status()["emergency_triggered"]


# ---- telemetry ----
def test_telemetry_roundtrip_all_modes():
    tc = TelemetryCompressor()
    data = {
        "positions": np.random.rand(50, 3).astype(np.float32),
        "mode": "NOMINAL",
        "battery": 11.1,
    }
    for mode in CompressionType:
        pkt = tc.compress_telemetry(data, mode)
        out = tc.decompress_telemetry(pkt)
        np.testing.assert_allclose(
            np.asarray(out["positions"]), data["positions"], atol=1e-6
        )
        assert out["mode"] == "NOMINAL"
    stats = tc.get_compression_stats()
    assert stats["packets"] == len(CompressionType)


def test_telemetry_gzip_compresses_redundant_data():
    tc = TelemetryCompressor()
    data = {"zeros": np.zeros((1000, 3))}
    pkt = tc.compress_telemetry(data, CompressionType.BINARY_GZIP)
    assert pkt.compression_ratio > 5.0
