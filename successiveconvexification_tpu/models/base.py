"""Model abstraction: continuous dynamics + per-stage convex constraint builder.

A ``Model`` is a *static* descriptor (hashable, safe to close over under jit) of one
vehicle/problem family; the numeric physical parameters live in a separate traced
pytree (e.g. ``Rocket6DoFParams``) so they can be batched for Monte-Carlo dispersion
sweeps (SURVEY.md §2.3 P1).

The reference couples problem definition, dynamics and SOCP assembly inside one Julia
file (SURVEY.md §1 L1/L2/L4); here the split is: ``Model.f`` is the continuous
dynamics (L2), ``Model.stage_cones`` emits the per-node convex-constraint data (the
model-specific part of L4), and everything else (trust region, virtual control,
feasibility buffers, costs) is assembled generically in ``ops/socp.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

# A stage-cone builder returns, for a single node k:
#   lin:  (G_lin (n_lin, nx+nu), h_lin (n_lin,))     rows meaning  G @ (dx,du) <= h
#   socs: tuple of (G_soc (d, nx+nu), h_soc (d,))    meaning  h - G @ (dx,du) in SOC(d)
# evaluated at the reference (xbar_k, ubar_k); the generic assembler appends the
# feasibility-buffer column and the trust-region cone.
StageConesFn = Callable[[Any, jnp.ndarray, jnp.ndarray], Tuple]


@dataclasses.dataclass(frozen=True, eq=False)
class Model:
    """Static problem-family descriptor. Instances are compared by identity."""

    name: str
    nx: int
    nu: int
    f: Callable[[Any, jnp.ndarray, jnp.ndarray], jnp.ndarray]
    stage_cones: StageConesFn
    n_lin: int                       # number of linear stage-constraint rows
    soc_dims: Tuple[int, ...]        # dims of the stage SOC constraints (static)
    mass_index: int | None           # state index of mass (for fuel cost), or None
    # Boundary-condition pin masks: True = component is fixed (delta pinned to 0).
    init_pinned: Tuple[bool, ...]    # length nx
    term_pinned: Tuple[bool, ...]    # length nx
    term_u_pinned: Tuple[bool, ...]  # length nu
    initial_guess: Callable[[Any, int], Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]

    def jacobians(self, params, x, u):
        """(A, B) = (df/dx, df/du) via forward-mode AD.

        The reference hand-derives these (SURVEY §2.1 C3); jacfwd is exact and under
        vmap/jit XLA fuses the nx+nu JVP columns into the same fused linearization
        kernel, so there is no TPU-side reason to hand-write them. An analytic path
        can be added as an optimization later with this as the correctness oracle.
        """
        A = jax.jacfwd(self.f, argnums=1)(params, x, u)
        B = jax.jacfwd(self.f, argnums=2)(params, x, u)
        return A, B


def safe_norm(v: jnp.ndarray, eps: float = 1e-12, axis=-1) -> jnp.ndarray:
    """||v|| with a nonzero subgradient at 0 (keeps jacfwd finite)."""
    return jnp.sqrt(jnp.sum(v * v, axis=axis) + eps)
