"""Device mesh and sharding helpers (SURVEY.md §2.3 P2/P7).

The reference is single-process with no parallelism; here the scenario axis of a
Monte-Carlo sweep is sharded over a ``jax.sharding.Mesh`` and XLA compiles the
collectives (psum for metrics) onto ICI/DCN — there is no NCCL/MPI analog to write:
on TPU the collective backend IS the compiler + interconnect, and this module is the
layer that programs it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SCENARIO_AXIS = "scenario"
KKT_AXIS = "kkt"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axes: Sequence[str] = (SCENARIO_AXIS,),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default: 1-D scenario mesh over all local devices. Pass ``axes=("scenario",
    "kkt")`` with a 2-D ``shape`` for the intra-problem-parallel configuration.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) if len(axes) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axes))


def scenario_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis scenario sharding."""
    return NamedSharding(mesh, P(SCENARIO_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_scenario_tree(tree, mesh: Mesh):
    """Place every leaf of a batched pytree with its leading axis sharded over
    the scenario mesh axis."""
    sh = scenario_sharding(mesh)

    def place(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, P(SCENARIO_AXIS, *([None] * (leaf.ndim - 1)))))

    return jax.tree.map(place, tree)
