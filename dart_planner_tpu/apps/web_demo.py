"""Browser demo: live SE(3) MPC flight over WebSocket.

Port of the reference web demo (demos/web_demo/app.py: FastAPI +
WebSocket 3-D demo wiring planner + mapper + controller with live
metrics). FastAPI/uvicorn are not in this image, so the server is
stdlib ``http.server`` (static page) + the ``websockets`` package
(state stream). The page draws a top-down canvas view of the vehicle,
goal, obstacles, and the live plan, with metric readouts.
"""

from __future__ import annotations

import asyncio
import http.server
import json
import threading
from typing import Optional, Set

import numpy as np

from dart_planner_tpu.common.logging_config import get_logger
from dart_planner_tpu.perception import GeometricMapper
from dart_planner_tpu.planning.se3_mpc import SE3MPCConfig, SE3MPCPlanner
from dart_planner_tpu.hardware.simulated_vehicle import SimulatedVehicleIO

logger = get_logger("apps.web_demo")

PAGE = """<!DOCTYPE html>
<html><head><title>DART-Planner TPU demo</title><style>
body{font-family:monospace;background:#111;color:#ddd;margin:20px}
canvas{background:#1a1a2e;border:1px solid #444}
#metrics{margin-top:8px;white-space:pre}
</style></head><body>
<h3>DART-Planner TPU &mdash; live SE(3) MPC</h3>
<canvas id="c" width="640" height="640"></canvas>
<div id="metrics">connecting&hellip;</div>
<script>
const c=document.getElementById('c'),x=c.getContext('2d');
const W=c.width,S=W/40;  // 40 m view
function px(p){return [W/2+p[0]*S, W/2-p[1]*S];}
const ws=new WebSocket('ws://'+location.hostname+':'+(parseInt(location.port)+1));
ws.onmessage=e=>{
  const d=JSON.parse(e.data);
  x.clearRect(0,0,W,W);
  x.strokeStyle='#333';
  for(let i=0;i<=40;i+=5){x.beginPath();x.moveTo(i*S,0);x.lineTo(i*S,W);
    x.moveTo(0,i*S);x.lineTo(W,i*S);x.stroke();}
  (d.obstacles||[]).forEach(o=>{const[a,b]=px(o);x.beginPath();
    x.arc(a,b,o[3]*S,0,7);x.fillStyle='rgba(200,60,60,.5)';x.fill();});
  if(d.plan){x.beginPath();x.strokeStyle='#4c9';
    d.plan.forEach((p,i)=>{const[a,b]=px(p);i?x.lineTo(a,b):x.moveTo(a,b);});
    x.stroke();}
  const[gx,gy]=px(d.goal);x.fillStyle='#fc3';x.fillRect(gx-4,gy-4,8,8);
  const[vx,vy]=px(d.position);x.beginPath();x.arc(vx,vy,6,0,7);
  x.fillStyle='#6af';x.fill();
  document.getElementById('metrics').textContent=
    `pos  ${d.position.map(v=>v.toFixed(2)).join(', ')}\\n`+
    `alt  ${d.position[2].toFixed(2)} m   speed ${d.speed.toFixed(2)} m/s\\n`+
    `plan ${d.plan_ms.toFixed(1)} ms   plans ${d.plans}   converged ${d.converged}`;
};
</script></body></html>"""


class DemoEngine:
    """In-process plan->fly loop feeding the websocket."""

    def __init__(self):
        self.vehicle = SimulatedVehicleIO({"initial_position": (0.0, 0.0, 2.0)})
        self.planner = SE3MPCPlanner(SE3MPCConfig())
        self.mapper = GeometricMapper()
        self.goal = np.array([12.0, 8.0, 4.0], np.float32)
        self.obstacles = [
            [6.0, 3.0, 3.0, 1.0],
            [9.0, 6.0, 4.0, 1.2],
        ]
        for o in self.obstacles:
            self.mapper.add_obstacle(np.asarray(o[:3], np.float32), o[3])
            self.planner.add_obstacle(np.asarray(o[:3], np.float32), o[3])
        self.vehicle.armed = True
        self.connected_clients: Set = set()

    async def tick(self) -> dict:
        state = self.vehicle.get_state()
        import time as _t

        t0 = _t.perf_counter()
        traj = self.planner.plan_trajectory(state, self.goal)
        plan_ms = (_t.perf_counter() - t0) * 1e3
        await self.vehicle.send_trajectory(traj)
        for _ in range(20):  # 0.05 s of flight per tick at 400 Hz
            self.vehicle.step()
        state = self.vehicle.get_state()
        stats = self.planner.get_planning_stats()
        return {
            "position": np.asarray(state.position).tolist(),
            "speed": float(np.linalg.norm(np.asarray(state.velocity))),
            "goal": self.goal.tolist(),
            "plan": np.asarray(traj.positions).tolist(),
            "obstacles": self.obstacles,
            "plan_ms": plan_ms,
            "plans": stats.get("total_plans", 0),
            "converged": f"{stats.get('success_rate', 0.0):.0%}",
        }


async def main(port: int = 8080, duration: Optional[float] = None) -> None:
    try:
        import websockets
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("websockets package required for the demo") from e

    engine = DemoEngine()

    class PageHandler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(PAGE.encode())

        def log_message(self, *a):  # quiet
            pass

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", port), PageHandler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    logger.info("web demo: http://127.0.0.1:%d (ws on %d)", port, port + 1)

    clients: Set = set()

    async def ws_handler(ws):
        clients.add(ws)
        try:
            await ws.wait_closed()
        finally:
            clients.discard(ws)

    async with websockets.serve(ws_handler, "127.0.0.1", port + 1):
        import time as _t

        t_end = _t.time() + duration if duration else None
        while t_end is None or _t.time() < t_end:
            frame = await engine.tick()
            if clients:
                msg = json.dumps(frame)
                await asyncio.gather(
                    *(c.send(msg) for c in list(clients)),
                    return_exceptions=True,
                )
            await asyncio.sleep(0.05)
    httpd.shutdown()
