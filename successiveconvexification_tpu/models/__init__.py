from successiveconvexification_tpu.models.base import Model
from successiveconvexification_tpu.models.pointmass3dof import (
    PointMass3DoFParams,
    pointmass3dof_model,
)
from successiveconvexification_tpu.models.rocket6dof import (
    Rocket6DoFParams,
    rocket6dof_model,
)

__all__ = [
    "Model",
    "PointMass3DoFParams",
    "pointmass3dof_model",
    "Rocket6DoFParams",
    "rocket6dof_model",
]
