"""ZMQ REQ/REP transport.

Port of the reference ``ZmqServer``/``ZmqClient``
(/root/reference/src/dart_planner/communication/zmq_server.py:28-139,
zmq_client.py:28-148): REP socket with command->handler dispatch and
bind-address hardening, REQ client with poll timeout + auto-reconnect.
Payloads go through :class:`dart_planner_tpu.comms.serializer`.
"""

from __future__ import annotations

import threading
import warnings
from typing import Any, Callable, Dict, Optional

from dart_planner_tpu.common.errors import CommunicationError
from dart_planner_tpu.comms.serializer import SecureSerializer

try:
    import zmq

    _HAS_ZMQ = True
except ImportError:  # pragma: no cover - zmq is present in CI
    _HAS_ZMQ = False


def _require_zmq():
    if not _HAS_ZMQ:
        raise CommunicationError("pyzmq is not installed")


class ZmqServer:
    """(reference zmq_server.py:28-139)"""

    def __init__(
        self,
        port: int = 5555,
        bind_address: str = "127.0.0.1",
        serializer: Optional[SecureSerializer] = None,
    ):
        _require_zmq()
        if bind_address == "0.0.0.0":
            warnings.warn(
                "binding ZMQ to 0.0.0.0 exposes the control channel to all "
                "interfaces (reference zmq_server.py:38-52)",
                stacklevel=2,
            )
        self.port = port
        self.bind_address = bind_address
        self.serializer = serializer or SecureSerializer(test_mode=True)
        self._handlers: Dict[str, Callable[[Any], Any]] = {}
        self._ctx = zmq.Context.instance()
        self._sock = self._ctx.socket(zmq.REP)
        self._sock.bind(f"tcp://{bind_address}:{port}")
        self._running = False
        self._thread: Optional[threading.Thread] = None

    def add_handler(self, command: str, handler: Callable[[Any], Any]) -> None:
        """(reference :54-62)"""
        self._handlers[command] = handler

    def start(self, daemon: bool = True) -> None:
        """Serve requests on a daemon thread (reference :64-82)."""
        self._running = True
        self._thread = threading.Thread(target=self._serve, daemon=daemon)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        self._sock.close(0)

    def _serve(self) -> None:
        poller = zmq.Poller()
        poller.register(self._sock, zmq.POLLIN)
        while self._running:
            if not dict(poller.poll(timeout=100)):
                continue
            raw = self._sock.recv()
            try:
                reply = self._dispatch(raw)
            except Exception as e:  # never kill the REP loop
                reply = {"status": "error", "message": str(e)}
            self._sock.send(self.serializer.serialize(reply))

    def _dispatch(self, raw: bytes) -> Any:
        """command -> handler (reference :113-139)."""
        request = self.serializer.deserialize(raw)
        command = (
            request.get("command") if isinstance(request, dict) else None
        )
        handler = self._handlers.get(command)
        if handler is None:
            return {"status": "error", "message": f"unknown command {command!r}"}
        result = handler(request.get("data"))
        return {"status": "ok", "result": result}


class ZmqClient:
    """(reference zmq_client.py:28-148)"""

    def __init__(
        self,
        host: str = "localhost",
        port: int = 5555,
        timeout_ms: int = 1000,
        serializer: Optional[SecureSerializer] = None,
    ):
        _require_zmq()
        self.host = host
        self.port = port
        self.timeout_ms = timeout_ms
        self.serializer = serializer or SecureSerializer(test_mode=True)
        self._ctx = zmq.Context.instance()
        self._sock: Optional[zmq.Socket] = None
        self._connect()

    def _connect(self) -> None:
        if self._sock is not None:
            self._sock.close(0)
        self._sock = self._ctx.socket(zmq.REQ)
        self._sock.connect(f"tcp://{self.host}:{self.port}")

    def send_request(self, command: str, data: Any = None) -> Any:
        """REQ with poll timeout + auto-reconnect (reference :62-101)."""
        payload = self.serializer.serialize({"command": command, "data": data})
        self._sock.send(payload)
        if not self._sock.poll(self.timeout_ms, zmq.POLLIN):
            # REQ socket is now stuck; rebuild it (reference reconnect)
            self._connect()
            raise CommunicationError(
                f"request {command!r} timed out after {self.timeout_ms} ms"
            )
        reply = self.serializer.deserialize(self._sock.recv())
        if isinstance(reply, dict) and reply.get("status") == "error":
            raise CommunicationError(reply.get("message", "remote error"))
        return reply.get("result") if isinstance(reply, dict) else reply

    def close(self) -> None:
        if self._sock is not None:
            self._sock.close(0)
            self._sock = None
