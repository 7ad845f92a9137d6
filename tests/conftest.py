"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; sharding tests run on XLA's
host-platform virtual devices (SURVEY.md section 4 "rebuild mapping").
Must run before the first jax import.
"""

import os

# Force-override: the environment presets JAX_PLATFORMS=axon (the real TPU
# tunnel, single-client); tests must not contend for it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# sitecustomize force-registers the axon TPU plugin and overrides
# jax_platforms via config — env vars alone don't stick. Re-override here.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # float64 available in tests;
# library code stays float32-first (dtype follows inputs).

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def sample_state():
    from dart_planner_tpu.common.types import DroneState

    return DroneState.create(
        timestamp=1.0,
        position=(1.0, -2.0, 5.0),
        velocity=(0.5, 0.2, -0.1),
        attitude=(0.02, -0.03, 0.4),
        angular_velocity=(0.01, 0.02, -0.05),
    )
