"""TPU-native successive convexification (SCvx) engine for powered-descent guidance.

A from-scratch JAX/Pallas reimagination of the capability of the Julia reference
``BenChung/SuccessiveConvexification`` (Szmuk-Acikmese free-final-time 6-DoF rocket
landing; see SURVEY.md — the reference mount was empty at survey time, so structural
claims are reconstruction-tagged there). The reference pipeline (RK4 multiple-shooting
discretization -> SOCP assembly -> external ECOS/JuMP conic solve -> trust-region
outer loop) is replaced by a fully batched, in-graph primal-dual interior-point SOCP
solver with a block-tridiagonal-plus-arrow KKT factorization, designed TPU-first:

* every SCvx iteration (linearize + assemble + IPM + accept) is ONE pure jittable
  function, vmapped over Monte-Carlo scenarios and sharded over a device mesh;
* cone variables live in structured pytrees grouped by cone type (no gathers);
* hot kernels (batched block factorizations, fused RK4+Jacobian linearization) have
  Pallas TPU implementations;
* convergence is tracked per lane with fixed-shape masked compute.
"""

from successiveconvexification_tpu.version import __version__

from successiveconvexification_tpu.config import (
    DiscretizationConfig,
    IPMConfig,
    ScvxConfig,
    SolverConfig,
)
from successiveconvexification_tpu.models import (
    PointMass3DoFParams,
    Rocket6DoFParams,
    pointmass3dof_model,
    rocket6dof_model,
)

_LAZY = {
    "ScvxState": "successiveconvexification_tpu.ops.scvx",
    "scvx_init": "successiveconvexification_tpu.ops.scvx",
    "scvx_iteration": "successiveconvexification_tpu.ops.scvx",
    "scvx_solve": "successiveconvexification_tpu.ops.scvx",
    "scvx_warm_start": "successiveconvexification_tpu.ops.scvx",
    "solve_batch": "successiveconvexification_tpu.parallel.batch",
    "solve_batch_compact": "successiveconvexification_tpu.parallel.batch",
    "solve_batch_sharded": "successiveconvexification_tpu.parallel.batch",
    "sample_dispersions": "successiveconvexification_tpu.parallel.batch",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

__all__ = [
    "__version__",
    "DiscretizationConfig",
    "IPMConfig",
    "ScvxConfig",
    "SolverConfig",
    "PointMass3DoFParams",
    "Rocket6DoFParams",
    "pointmass3dof_model",
    "rocket6dof_model",
    "ScvxState",
    "scvx_init",
    "scvx_iteration",
    "scvx_solve",
    "solve_batch",
    "solve_batch_compact",
]
