"""RK4 multiple-shooting discretization of the linearized, time-dilated dynamics.

Produces, for every interval [tau_k, tau_{k+1}] (tau in [0,1], free final time via
the dilation sigma — reference components C4/C5, SURVEY.md §2.1/§3.2):

    x_{k+1} ≈ A_k x_k + Bm_k u_k + Bp_k u_{k+1} + S_k sigma + z_k

by integrating the augmented ODE with a fixed-step RK4 and first-order-hold controls:

    xdot   = sigma * f(x, u(tau))
    Phidot = sigma * A(x,u) Phi          (state transition matrix)
    Pdot   = -sigma * P A(x,u)           (its inverse, integrated directly — the
                                          reference applies Phi^-1 to the integrands
                                          the same way, SURVEY §3.2)
    Bmdot  = lam_minus * sigma * P B(x,u)
    Bpdot  = lam_plus  * sigma * P B(x,u)
    Sdot   = P f(x,u)
    zdot   = -sigma * P (A(x,u) x + B(x,u) u)

TPU-first design: there is NO sequential loop over k — the K-1 intervals are
independent (multiple shooting) and integrate as one vmapped fixed-step RK4 over a
[K-1, aug] tensor; under a scenario vmap this becomes [B, K-1, aug], which XLA fuses
into large batched linearization kernels (SURVEY §2.3 P3/P4).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from successiveconvexification_tpu.models.base import Model
from successiveconvexification_tpu.ops.precision import full_precision


class Discretization(NamedTuple):
    """Per-interval affine discrete dynamics, leading axis K-1."""

    A: jnp.ndarray    # (K-1, nx, nx)
    Bm: jnp.ndarray   # (K-1, nx, nu)  weight of u_k  (FOH "minus" matrix)
    Bp: jnp.ndarray   # (K-1, nx, nu)  weight of u_{k+1} (zero for ZOH)
    S: jnp.ndarray    # (K-1, nx)      weight of sigma
    z: jnp.ndarray    # (K-1, nx)      affine residual
    x_prop: jnp.ndarray  # (K-1, nx)   nonlinear propagation of x_k over the interval
    defect: jnp.ndarray  # (K-1, nx)   x_prop - x_{k+1} (multiple-shooting defect)


def _interval_aug_rk4(model: Model, params, xk, uk, ukp1, sigma, h, substeps, foh):
    """Integrate the augmented ODE over one interval; returns the affine maps."""
    nx, nu = model.nx, model.nu
    dtype = xk.dtype
    dt = h / substeps

    def u_of(tau):
        lam_p = tau / h if foh else jnp.zeros((), dtype)
        lam_m = 1.0 - lam_p
        return lam_m, lam_p, lam_m * uk + lam_p * ukp1

    def aug_dot(tau, aug):
        x, Phi, P, Bm, Bp, S, z = aug
        lam_m, lam_p, u = u_of(tau)
        fv = model.f(params, x, u)
        Ac, Bc = model.jacobians(params, x, u)
        sA = sigma * Ac
        sB = sigma * Bc
        return (
            sigma * fv,
            sA @ Phi,
            -P @ sA,
            lam_m * (P @ sB),
            lam_p * (P @ sB),
            P @ fv,
            -(P @ (sA @ x + sB @ u)),
        )

    aug = (
        xk,
        jnp.eye(nx, dtype=dtype),
        jnp.eye(nx, dtype=dtype),
        jnp.zeros((nx, nu), dtype=dtype),
        jnp.zeros((nx, nu), dtype=dtype),
        jnp.zeros((nx,), dtype=dtype),
        jnp.zeros((nx,), dtype=dtype),
    )

    def rk4_step(i, aug):
        tau = i.astype(dtype) * dt
        k1 = aug_dot(tau, aug)
        k2 = aug_dot(tau + dt / 2, jax.tree.map(lambda a, k: a + dt / 2 * k, aug, k1))
        k3 = aug_dot(tau + dt / 2, jax.tree.map(lambda a, k: a + dt / 2 * k, aug, k2))
        k4 = aug_dot(tau + dt, jax.tree.map(lambda a, k: a + dt * k, aug, k3))
        return jax.tree.map(
            lambda a, a1, a2, a3, a4: a + dt / 6 * (a1 + 2 * a2 + 2 * a3 + a4),
            aug, k1, k2, k3, k4,
        )

    aug = jax.lax.fori_loop(0, substeps, rk4_step, aug)
    x_end, Phi, P, Bm, Bp, S, z = aug
    # Convert interval-local integrals to node-to-node maps: M_k = Phi(h) @ integral.
    A_k = Phi
    Bm_k, Bp_k, S_k, z_k = Phi @ Bm, Phi @ Bp, Phi @ S, Phi @ z
    if model.project_jac is not None:
        # retraction-composed flow: x_{k+1} = P(phi(...)) ~ P(y) + Jp (phi - y);
        # the affine offset P(y) - Jp y keeps the map exact at the reference
        Jp = model.project_jac(x_end)
        y = x_end
        x_end = model.project_state(x_end)
        A_k, Bm_k, Bp_k = Jp @ A_k, Jp @ Bm_k, Jp @ Bp_k
        S_k = Jp @ S_k
        z_k = Jp @ z_k + (x_end - Jp @ y)
    return A_k, Bm_k, Bp_k, S_k, z_k, x_end


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("substeps", "foh"))
@full_precision
def discretize(model: Model, params, X, U, sigma, substeps: int, foh: bool = True
               ) -> Discretization:
    """Vectorized discretization of the full trajectory.

    Args:
      X: (K, nx) reference states, U: (K, nu) reference controls, sigma: scalar.
    """
    K = X.shape[0]
    h = jnp.asarray(1.0 / (K - 1), dtype=X.dtype)

    def one(xk, uk, ukp1):
        return _interval_aug_rk4(model, params, xk, uk, ukp1, sigma, h, substeps, foh)

    A, Bm, Bp, S, z, x_prop = jax.vmap(one)(X[:-1], U[:-1], U[1:])
    defect = x_prop - X[1:]
    return Discretization(A=A, Bm=Bm, Bp=Bp, S=S, z=z, x_prop=x_prop, defect=defect)


def _affine_compose(e1, e2):
    """Compose batched affine maps: e1 = (A1, c1) applied FIRST, then e2.

    (A2, c2) ∘ (A1, c1) = (A2 A1, A2 c1 + c2). Associative, so it feeds
    ``jax.lax.associative_scan`` (leading axis = the interval axis).
    """
    A1, c1 = e1
    A2, c2 = e2
    return (
        jnp.einsum("...ij,...jk->...ik", A2, A1),
        jnp.einsum("...ij,...j->...i", A2, c1) + c2,
    )


def condense(disc: Discretization) -> jnp.ndarray:
    """Cumulative state-transition matrices via ``associative_scan`` (P4a).

    Returns Phi of shape (K-1, nx, nx) with Phi[k] = A_k @ A_{k-1} @ ... @ A_0,
    i.e. the map from a node-0 state perturbation to the node-(k+1)
    perturbation under the discretized linear dynamics. SURVEY §2.3 P4(a):
    STM composition is associative, so the whole-horizon condensing runs in
    O(log K) depth on the MXU instead of a K-step sequential recursion.
    """
    return jax.lax.associative_scan(
        lambda a, b: jnp.einsum("...ij,...jk->...ik", b, a), disc.A
    )


def linear_rollout(disc: Discretization, x0: jnp.ndarray, U: jnp.ndarray,
                   sigma: jnp.ndarray) -> jnp.ndarray:
    """Single-shooting rollout of the discrete affine dynamics, log depth.

    Composes x_{k+1} = A_k x_k + Bm_k u_k + Bp_k u_{k+1} + S_k sigma + z_k
    over the whole horizon with one ``associative_scan`` over affine maps
    (the "condensing" view of the dynamics: every x_k expressed in terms of
    x_0 and the controls). Returns (K-1, nx): the states at nodes 1..K-1.
    """
    c = (
        jnp.einsum("kij,kj->ki", disc.Bm, U[:-1])
        + jnp.einsum("kij,kj->ki", disc.Bp, U[1:])
        + disc.S * sigma
        + disc.z
    )
    Phi, ccum = jax.lax.associative_scan(_affine_compose, (disc.A, c))
    return jnp.einsum("kij,j->ki", Phi, x0) + ccum


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("substeps", "foh"))
@full_precision
def propagate(model: Model, params, X, U, sigma, substeps: int, foh: bool = True):
    """Nonlinear multiple-shooting propagation only (acceptance test, C11).

    Returns x_prop: (K-1, nx), the nonlinear end state of each interval started at
    X[k] under controls (U[k], U[k+1]).
    """
    K = X.shape[0]
    h = jnp.asarray(1.0 / (K - 1), dtype=X.dtype)
    dt = h / substeps

    def one(xk, uk, ukp1):
        def u_of(tau):
            lam_p = tau / h if foh else jnp.zeros((), X.dtype)
            return (1.0 - lam_p) * uk + lam_p * ukp1

        def xdot(tau, x):
            return sigma * model.f(params, x, u_of(tau))

        def rk4_step(i, x):
            tau = i.astype(X.dtype) * dt
            k1 = xdot(tau, x)
            k2 = xdot(tau + dt / 2, x + dt / 2 * k1)
            k3 = xdot(tau + dt / 2, x + dt / 2 * k2)
            k4 = xdot(tau + dt, x + dt * k3)
            return x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

        x_end = jax.lax.fori_loop(0, substeps, rk4_step, xk)
        if model.project_jac is not None:
            x_end = model.project_state(x_end)
        return x_end

    return jax.vmap(one)(X[:-1], U[:-1], U[1:])
