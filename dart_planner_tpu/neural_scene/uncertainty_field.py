"""Exploration uncertainty field.

Port of the reference ``neural_scene/uncertainty_field.py``: a dense
grid of exploration uncertainty (:41-64), per-position and regional
updates (:66-108), connected high-uncertainty region extraction
(:154-182, flood fill :308-371), and exploration target selection
(:184-219). Grid math is JAX; connected-component labeling (a 1 Hz L1
operation) uses ``scipy.ndimage.label`` on host.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

try:
    from scipy import ndimage

    _HAS_SCIPY = True
except ImportError:  # pragma: no cover
    _HAS_SCIPY = False


@dataclass
class UncertaintyRegion:
    """(reference uncertainty_field.py:373+)"""

    center: np.ndarray
    size_voxels: int
    mean_uncertainty: float


class UncertaintyField:
    """(reference uncertainty_field.py:33-306)"""

    def __init__(self, scene_bounds: np.ndarray, resolution: float = 1.0):
        self.bounds = np.asarray(scene_bounds, np.float32).reshape(2, 3)
        self.resolution = resolution
        size = np.maximum(
            np.ceil((self.bounds[1] - self.bounds[0]) / resolution).astype(int), 1
        )
        self.grid = jnp.ones(tuple(size), jnp.float32)  # unknown = 1.0
        self.update_count = 0

    # -- index helpers (reference :291-306) --
    def _to_idx(self, position) -> np.ndarray:
        idx = np.floor(
            (np.asarray(position) - self.bounds[0]) / self.resolution
        ).astype(int)
        return np.clip(idx, 0, np.asarray(self.grid.shape) - 1)

    def _to_pos(self, idx) -> np.ndarray:
        return self.bounds[0] + (np.asarray(idx) + 0.5) * self.resolution

    # -- updates --
    def update_uncertainty_at_position(
        self, position, uncertainty: float
    ) -> None:
        """(reference :66-88)"""
        i, j, k = self._to_idx(position)
        self.grid = self.grid.at[i, j, k].set(float(uncertainty))
        self.update_count += 1

    def reduce_uncertainty_around_position(
        self, position, radius: float, factor: float = 0.5
    ) -> None:
        """Observation visited a region (reference :221-260): scale down
        uncertainty within ``radius`` — vectorized mask, no loops."""
        shape = self.grid.shape
        import jax

        ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        kk = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
        centers = (
            jnp.stack([ii, jj, kk], axis=-1).astype(jnp.float32) + 0.5
        ) * self.resolution + jnp.asarray(self.bounds[0])
        d2 = jnp.sum((centers - jnp.asarray(position, jnp.float32)) ** 2, axis=-1)
        inside = d2 <= radius * radius
        self.grid = jnp.where(inside, self.grid * factor, self.grid)
        self.update_count += 1

    # -- queries --
    def get_uncertainty_at_position(self, position) -> float:
        """(reference :110-125)"""
        i, j, k = self._to_idx(position)
        return float(self.grid[i, j, k])

    def identify_high_uncertainty_regions(
        self, threshold: float = 0.7, min_voxels: int = 2
    ) -> List[UncertaintyRegion]:
        """Connected components above threshold (reference :154-182 with
        flood fill :308-371)."""
        if not _HAS_SCIPY:
            raise RuntimeError("scipy required for region labeling")
        mask = np.asarray(self.grid) > threshold
        labels, n = ndimage.label(mask)
        regions = []
        for lab in range(1, n + 1):
            sel = labels == lab
            count = int(sel.sum())
            if count < min_voxels:
                continue
            idx = np.argwhere(sel)
            center = self._to_pos(idx.mean(axis=0))
            regions.append(
                UncertaintyRegion(
                    center=center,
                    size_voxels=count,
                    mean_uncertainty=float(np.asarray(self.grid)[sel].mean()),
                )
            )
        regions.sort(key=lambda r: -r.mean_uncertainty * r.size_voxels)
        return regions

    def get_exploration_targets(
        self, current_position, max_targets: int = 5, threshold: float = 0.7
    ) -> List[np.ndarray]:
        """Nearest-first high-uncertainty centers (reference :184-219)."""
        regions = self.identify_high_uncertainty_regions(threshold)
        cur = np.asarray(current_position, np.float32)
        regions.sort(key=lambda r: np.linalg.norm(r.center - cur))
        return [r.center for r in regions[:max_targets]]

    def get_statistics(self) -> Dict[str, float]:
        """(reference :262-289)"""
        g = np.asarray(self.grid)
        return {
            "mean_uncertainty": float(g.mean()),
            "max_uncertainty": float(g.max()),
            "explored_fraction": float((g < 0.5).mean()),
            "updates": self.update_count,
        }
