"""Symmetric-cone algebra: nonnegative orthant + second-order cones.

This is the TPU-native replacement for the cone kernels inside the reference's
external C conic solver (ECOS — SURVEY.md §2.1 C8, §3.3): Nesterov-Todd scalings,
Jordan products, and fraction-to-boundary step lengths.

Representation: a *cone vector* is a dict of arrays; a static ``spec`` dict maps each
key to ``"lin"`` or ``"soc"``. For ``lin`` leaves every element is an independent
one-dimensional cone; for ``soc`` leaves the LAST axis is the cone dimension
(scalar-first: s = (s0, s1)) and all leading axes are independent cone batches.
Because every op only special-cases the last axis, the whole module is trivially
``vmap``-able over scenario batches and fully vectorized over the K-node axis —
no gathers, no per-cone Python loops at trace time beyond the handful of groups.

NT scaling for SOC (CVXOPT/ECOS formulas, verified against dense construction in
tests/test_cones.py): with J = diag(1, -1, ..., -1),
    res_s = s'Js,  res_z = z'Jz,   sbar = s/sqrt(res_s),  zbar = z/sqrt(res_z)
    gamma = sqrt((1 + sbar'J zbar... ) / 2)   [see code]
    wbar = (sbar + J zbar) / (2 gamma),   eta = (res_s / res_z)^(1/4)
    W = eta * [[a, b'], [b, I + b b'/(1+a)]],  (a, b) = (wbar0, wbar1)
satisfying W J W = eta^2 J, W^2 = eta^2 (2 wbar wbar' - J), lambda = W z = W^{-1} s.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

ConeVec = Dict[str, jnp.ndarray]
ConeSpec = Dict[str, str]  # key -> "lin" | "soc"

_BIG = 1e30


def _soc_jdot(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """u'Jv over the last axis."""
    return u[..., 0] * v[..., 0] - jnp.sum(u[..., 1:] * v[..., 1:], axis=-1)


def degree(spec: ConeSpec, x: ConeVec) -> int:
    """Barrier degree: #linear rows + #SOC cones (each SOC counts once)."""
    import math

    deg = 0
    for k, kind in spec.items():
        shape = x[k].shape
        if kind == "lin":
            deg += math.prod(shape)
        else:
            deg += math.prod(shape[:-1]) if len(shape) > 1 else 1
    return deg


def identity(spec: ConeSpec, like: ConeVec) -> ConeVec:
    """The cone identity element e (ones for lin, (1, 0, ...) for soc)."""
    out = {}
    for k, kind in spec.items():
        a = like[k]
        if kind == "lin":
            out[k] = jnp.ones_like(a)
        else:
            out[k] = jnp.zeros_like(a).at[..., 0].set(1.0)
    return out


def inner(x: ConeVec, y: ConeVec) -> jnp.ndarray:
    """<x, y> over the entire cone vector."""
    return sum(jnp.sum(x[k] * y[k]) for k in x)


def jordan_mul(spec: ConeSpec, u: ConeVec, v: ConeVec) -> ConeVec:
    out = {}
    for k, kind in spec.items():
        if kind == "lin":
            out[k] = u[k] * v[k]
        else:
            uu, vv = u[k], v[k]
            head = jnp.sum(uu * vv, axis=-1, keepdims=True)
            tail = uu[..., :1] * vv[..., 1:] + vv[..., :1] * uu[..., 1:]
            out[k] = jnp.concatenate([head, tail], axis=-1)
    return out


def jordan_solve(spec: ConeSpec, lam: ConeVec, d: ConeVec) -> ConeVec:
    """Solve L(lam) x = d (the inverse of jordan_mul by lam)."""
    out = {}
    for k, kind in spec.items():
        if kind == "lin":
            out[k] = d[k] / lam[k]
        else:
            l0 = lam[k][..., :1]
            l1 = lam[k][..., 1:]
            d0 = d[k][..., :1]
            d1 = d[k][..., 1:]
            det = l0 * l0 - jnp.sum(l1 * l1, axis=-1, keepdims=True)
            x0 = (l0 * d0 - jnp.sum(l1 * d1, axis=-1, keepdims=True)) / det
            x1 = (d1 - x0 * l1) / l0
            out[k] = jnp.concatenate([x0, x1], axis=-1)
    return out


# ------------------------------------------------------------------ NT scaling
def nt_scaling(spec: ConeSpec, s: ConeVec, z: ConeVec):
    """Compute the NT scaling representation W for each group.

    Returns a dict: lin groups -> {"w": sqrt(s/z)}; soc groups ->
    {"eta": (...,), "wbar": (..., d)}.
    """
    W = {}
    for k, kind in spec.items():
        if kind == "lin":
            W[k] = {"w": jnp.sqrt(s[k] / z[k])}
        else:
            ss, zz = s[k], z[k]
            res_s = _soc_jdot(ss, ss)
            res_z = _soc_jdot(zz, zz)
            sbar = ss / jnp.sqrt(res_s)[..., None]
            zbar = zz / jnp.sqrt(res_z)[..., None]
            # wbar = (sbar + J zbar)/(2 gamma) must satisfy wbar'J wbar = 1:
            #   (sbar + Jzbar)'J(sbar + Jzbar) = 2 + 2 sbar . zbar (EUCLIDEAN dot),
            # hence gamma = sqrt((1 + sbar . zbar)/2).
            eucl = jnp.sum(sbar * zbar, axis=-1)
            gamma = jnp.sqrt((1.0 + eucl) / 2.0)
            jz = zbar.at[..., 1:].multiply(-1.0)
            wbar = (sbar + jz) / (2.0 * gamma[..., None])
            eta = (res_s / res_z) ** 0.25
            W[k] = {"eta": eta, "wbar": wbar}
    return W


def _soc_w_apply(eta, wbar, v, inverse: bool):
    """W v (or W^-1 v) for the SOC scaling; W symmetric."""
    a = wbar[..., :1]
    b = wbar[..., 1:]
    sgn = -1.0 if inverse else 1.0
    bs = sgn * b
    v0 = v[..., :1]
    v1 = v[..., 1:]
    top = a * v0 + jnp.sum(bs * v1, axis=-1, keepdims=True)
    # bb' term keeps + sign in both W and W^-1 since (-b)(-b)' = bb'
    bot = bs * v0 + v1 + b * (jnp.sum(b * v1, axis=-1, keepdims=True)) / (1.0 + a)
    scale = (1.0 / eta if inverse else eta)[..., None]
    return jnp.concatenate([top, bot], axis=-1) * scale


def w_apply(spec: ConeSpec, W, v: ConeVec, inverse: bool = False) -> ConeVec:
    out = {}
    for k, kind in spec.items():
        if kind == "lin":
            w = W[k]["w"]
            out[k] = v[k] / w if inverse else v[k] * w
        else:
            out[k] = _soc_w_apply(W[k]["eta"], W[k]["wbar"], v[k], inverse)
    return out


def scaling_point(spec: ConeSpec, W, z: ConeVec) -> ConeVec:
    """lambda = W z (== W^{-1} s by the NT property)."""
    return w_apply(spec, W, z, inverse=False)


# ------------------------------------------------------------ step to boundary
def _lin_max_step(s, ds):
    alpha = jnp.where(ds < 0, -s / jnp.where(ds < 0, ds, -1.0), _BIG)
    return jnp.min(alpha) if alpha.size else jnp.asarray(_BIG, s.dtype)


def _soc_max_step(s, ds):
    """Largest alpha with s + alpha ds in SOC (per cone, then global min)."""
    c = _soc_jdot(s, s)                      # > 0 in the interior
    b = _soc_jdot(s, ds)
    a = _soc_jdot(ds, ds)
    # boundary crossing solves a t^2 + 2 b t + c = 0
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    eps = jnp.asarray(1e-14, s.dtype)
    quad = jnp.abs(a) > eps
    a_safe = jnp.where(quad, a, 1.0)
    r1 = (-b - sq) / a_safe
    r2 = (-b + sq) / a_safe
    valid_quad = quad & (disc >= 0)
    r1 = jnp.where(valid_quad & (r1 > 0), r1, _BIG)
    r2 = jnp.where(valid_quad & (r2 > 0), r2, _BIG)
    # a ~ 0: linear crossing 2 b t + c = 0, positive only when b < 0 (c > 0)
    b_safe = jnp.where(b < 0, b, -1.0)
    r_lin = jnp.where(~quad & (b < 0), -c / (2.0 * b_safe), _BIG)
    alpha_quad = jnp.minimum(jnp.minimum(r1, r2), r_lin)
    # also guard the s0 + alpha ds0 >= 0 half-space
    s0, d0 = s[..., 0], ds[..., 0]
    alpha_head = jnp.where(d0 < 0, -s0 / jnp.where(d0 < 0, d0, -1.0), _BIG)
    alpha = jnp.minimum(alpha_quad, alpha_head)
    return jnp.min(alpha) if alpha.size else jnp.asarray(_BIG, s.dtype)


def max_step(spec: ConeSpec, s: ConeVec, ds: ConeVec) -> jnp.ndarray:
    """max alpha >= 0 such that s + alpha * ds stays in the cone (capped at 1e30)."""
    alphas = []
    for k, kind in spec.items():
        alphas.append(_lin_max_step(s[k], ds[k]) if kind == "lin"
                      else _soc_max_step(s[k], ds[k]))
    return jnp.min(jnp.stack(alphas))


# ------------------------------------------------------------------- W^-2 data
def winv2_terms(spec: ConeSpec, W):
    """Per-group data for G'W^-2 G assembly.

    lin: {"d": w^-2}; soc: {"coef": eta^-2, "v": J wbar} with
    W^-2 = coef * (2 v v' - J).
    """
    out = {}
    for k, kind in spec.items():
        if kind == "lin":
            out[k] = {"d": W[k]["w"] ** -2}
        else:
            wbar = W[k]["wbar"]
            v = wbar.at[..., 1:].multiply(-1.0)
            out[k] = {"coef": W[k]["eta"] ** -2, "v": v}
    return out


def winv2_apply(spec: ConeSpec, W, x: ConeVec) -> ConeVec:
    """W^-2 x per group."""
    out = {}
    for k, kind in spec.items():
        if kind == "lin":
            out[k] = x[k] * W[k]["w"] ** -2
        else:
            wbar = W[k]["wbar"]
            v = wbar.at[..., 1:].multiply(-1.0)
            coef = (W[k]["eta"] ** -2)[..., None]
            vx = jnp.sum(v * x[k], axis=-1, keepdims=True)
            jx = x[k].at[..., 1:].multiply(-1.0)
            out[k] = coef * (2.0 * v * vx - jx)
    return out


# ------------------------------------------------------------------- tree sugar
def tree_add(x: ConeVec, y: ConeVec, alpha=1.0) -> ConeVec:
    return jax.tree.map(lambda a, b: a + alpha * b, x, y)


def tree_scale(x: ConeVec, alpha) -> ConeVec:
    return jax.tree.map(lambda a: a * alpha, x)
