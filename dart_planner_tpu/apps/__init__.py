"""Application entry points.

Mirrors the reference's app tier (SURVEY.md section 2.8 / 3):
``dart-planner-tpu`` CLI (reference dart_planner_cli.py), the
three-layer cloud planning service (cloud/main_improved_threelayer.py),
the edge control loop (edge/main_improved.py), a minimal takeoff demo
(minimal_takeoff.py), and a websocket web demo (demos/web_demo).
"""
