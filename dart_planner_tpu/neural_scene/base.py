"""Neural scene interface + placeholder.

Port of the reference ``neural_scene/base_neural_scene.py``:
``BaseNeuralScene`` abstract interface (:61-233 — initialize /
incremental update / density / uncertainty / semantic queries / view
rendering) and the voxel-grid ``PlaceholderNeuralScene`` (:265+). Real
NeRF/3DGS backends plug in behind the same interface; the placeholder
stores dense JAX grids so batched queries jit.
"""

from __future__ import annotations

import abc
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


class BaseNeuralScene(abc.ABC):
    """(reference base_neural_scene.py:61-233)"""

    @abc.abstractmethod
    def initialize_scene(self, bounds: np.ndarray) -> None: ...

    @abc.abstractmethod
    def update_incremental(
        self, observations: Any, camera_poses: Optional[Any] = None
    ) -> None: ...

    @abc.abstractmethod
    def query_density(self, positions: Array) -> Array: ...

    @abc.abstractmethod
    def query_uncertainty(self, positions: Array) -> Array: ...

    @abc.abstractmethod
    def query_semantic_label(self, positions: Array) -> Array: ...

    @abc.abstractmethod
    def render_view(self, camera_pose: Any, resolution: tuple) -> Array: ...

    @abc.abstractmethod
    def get_scene_statistics(self) -> Dict[str, Any]: ...


class PlaceholderNeuralScene(BaseNeuralScene):
    """Voxel-grid stand-in (reference base_neural_scene.py:265+): density /
    uncertainty / semantic grids over a fixed extent. Batched queries are
    jitted gathers; completely replaceable by a learned model."""

    def __init__(self, resolution: float = 0.5):
        self.resolution = resolution
        self.bounds: Optional[np.ndarray] = None
        self.density: Optional[Array] = None
        self.uncertainty: Optional[Array] = None
        self.semantics: Optional[Array] = None
        self.update_count = 0

    def initialize_scene(self, bounds: np.ndarray) -> None:
        """``bounds`` is (2, 3): [[min_xyz], [max_xyz]]."""
        self.bounds = np.asarray(bounds, np.float32)
        size = np.ceil(
            (self.bounds[1] - self.bounds[0]) / self.resolution
        ).astype(int)
        shape = tuple(np.maximum(size, 1))
        self.density = jnp.zeros(shape, jnp.float32)
        self.uncertainty = jnp.ones(shape, jnp.float32)  # unknown = 1.0
        self.semantics = jnp.zeros(shape, jnp.int32)

    def _indices(self, positions: Array) -> tuple[Array, Array]:
        lo = jnp.asarray(self.bounds[0])
        idx = jnp.floor((positions - lo) / self.resolution).astype(jnp.int32)
        shape = jnp.asarray(self.density.shape)
        inb = jnp.all((idx >= 0) & (idx < shape), axis=-1)
        idx = jnp.clip(idx, 0, shape - 1)
        return idx, inb

    def update_incremental(
        self, observations: Any, camera_poses: Optional[Any] = None
    ) -> None:
        """Accepts (positions (N,3), densities (N,)) pairs; writes the
        voxels and drops their uncertainty (reference incremental-update
        semantics without a learned model)."""
        positions, densities = observations
        idx, inb = self._indices(jnp.asarray(positions, jnp.float32))
        d = jnp.where(inb, jnp.asarray(densities, jnp.float32), 0.0)
        i, j, k = idx[..., 0], idx[..., 1], idx[..., 2]
        self.density = self.density.at[i, j, k].max(d)
        self.uncertainty = self.uncertainty.at[i, j, k].multiply(
            jnp.where(inb, 0.5, 1.0)
        )
        self.update_count += 1

    def query_density(self, positions: Array) -> Array:
        idx, inb = self._indices(jnp.asarray(positions, jnp.float32))
        v = self.density[idx[..., 0], idx[..., 1], idx[..., 2]]
        return jnp.where(inb, v, 0.0)

    def query_uncertainty(self, positions: Array) -> Array:
        idx, inb = self._indices(jnp.asarray(positions, jnp.float32))
        v = self.uncertainty[idx[..., 0], idx[..., 1], idx[..., 2]]
        return jnp.where(inb, v, 1.0)

    def query_semantic_label(self, positions: Array) -> Array:
        idx, inb = self._indices(jnp.asarray(positions, jnp.float32))
        v = self.semantics[idx[..., 0], idx[..., 1], idx[..., 2]]
        return jnp.where(inb, v, 0)

    def render_view(self, camera_pose: Any, resolution: tuple) -> Array:
        """Orthographic top-down density projection (placeholder render)."""
        img = jnp.max(self.density, axis=2)
        return jax.image.resize(img, resolution, "linear")

    def get_scene_statistics(self) -> Dict[str, Any]:
        return {
            "resolution": self.resolution,
            "voxels": int(np.prod(self.density.shape)) if self.density is not None else 0,
            "mean_uncertainty": float(jnp.mean(self.uncertainty))
            if self.uncertainty is not None
            else 1.0,
            "updates": self.update_count,
        }
