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
    # Optional projection of the state trajectory onto its manifold after each
    # accepted step (e.g. quaternion renormalization); None = identity.
    project_state: Callable[[jnp.ndarray], jnp.ndarray] | None = None
    # Optional per-node penalized directions: callable (params, xk, uk) ->
    # (n_dirs, nx+nu) rows v; the subproblem adds a large quadratic penalty
    # W*(v'delta)^2 per row (soft version of tangent_rows).
    penalized_dirs: Callable[[Any, jnp.ndarray, jnp.ndarray], jnp.ndarray] | None = None
    # Optional per-node HARD tangent-space equality rows: callable
    # (params, xk, uk) -> (n_tangent, nx+nu) rows T enforcing T @ delta = 0 at
    # every non-initial node. Used to pin first-order moves off a state
    # manifold the convex model cannot see — e.g. the RADIAL quaternion
    # direction: dq ∝ -qbar shrinks ||q|| and linearly fakes tilt-cone
    # satisfaction and defect reduction, which renormalization then undoes;
    # that breaks the SCvx acceptance ratio at first order (measured 24x
    # over-promise), so the constraint must be exact, not penalized.
    tangent_rows: Callable[[Any, jnp.ndarray, jnp.ndarray], jnp.ndarray] | None = None
    n_tangent: int = 0
    # Jacobian of the per-state manifold retraction (project_state on a single
    # state): (nx,) -> (nx, nx). When set, the discretization composes the
    # integrated flow with the retraction — x_{k+1} = P(phi(x_k, ...)) — so the
    # multiple-shooting defect lives ON the manifold: its radial component is
    # second-order and tangent-constrained deltas can always close it (without
    # this, the tangent constraint creates an irreducible virtual-control floor
    # = an artificial infeasible stationary point).
    project_jac: Callable[[jnp.ndarray], jnp.ndarray] | None = None
    # Manifold-SCP state reduction: per-node orthonormal tangent basis
    # B(xk): (nx, nr) with nr = reduced state dimension. The subproblem's state
    # deltas live in the reduced tangent space (dx = B dx~), which removes the
    # radial quaternion dimension entirely: no norm-shrink exploit, no tangent
    # equality rows, and the accepted-step retraction is always second-order.
    # None = identity (nr == nx).
    state_basis: Callable[[Any, jnp.ndarray], jnp.ndarray] | None = None
    nr: int = -1  # reduced dim; set to nx when state_basis is None

    # Reduced pin masks (length nr); default to the full-space masks when no
    # basis is set.
    init_pinned_r: Tuple[bool, ...] = ()
    term_pinned_r: Tuple[bool, ...] = ()

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
