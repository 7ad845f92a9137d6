"""Neural scene representation layer.

Mirror of the reference ``src/dart_planner/neural_scene/``: an abstract
scene-model interface (NeRF/3DGS integration point), a voxel-grid
placeholder implementation, and an exploration uncertainty field. The
grids live in JAX arrays so density/uncertainty queries batch and jit;
region extraction (a 1 Hz L1 operation) runs on host via scipy labeling.
"""

from dart_planner_tpu.neural_scene.base import (
    BaseNeuralScene,
    PlaceholderNeuralScene,
)
from dart_planner_tpu.neural_scene.uncertainty_field import (
    UncertaintyField,
    UncertaintyRegion,
)

__all__ = [
    "BaseNeuralScene",
    "PlaceholderNeuralScene",
    "UncertaintyField",
    "UncertaintyRegion",
]
