"""Test helper: materialize a StageSOCP into dense standard form.

The dense (c, A, b, G, h, cones, P) are produced by differentiating the structured
operator applies (they are linear, so jacfwd is exact): any transcription bug in the
structured operators shows up as a KKT-certificate failure under the independent
dense oracle solver.
"""

import jax
import jax.numpy as jnp
import numpy as np

from successiveconvexification_tpu.ops import socp
from successiveconvexification_tpu.ops.ipm import _spec_of
from successiveconvexification_tpu.ops.socp import Primal, StageSOCP


def primal_size(d: StageSOCP):
    return d.c_w.size + d.c_p.size + d.c_q.size + 1


def flatten_primal(x: Primal) -> np.ndarray:
    return np.concatenate(
        [np.ravel(x.w), np.ravel(x.p), np.ravel(x.q), np.ravel(x.sig)[None].ravel()]
    )


def unflatten_primal(d: StageSOCP, v) -> Primal:
    nw_sz = d.c_w.size
    np_sz = d.c_p.size
    w = jnp.reshape(v[:nw_sz], d.c_w.shape)
    p = jnp.reshape(v[nw_sz : nw_sz + np_sz], d.c_p.shape)
    q = jnp.reshape(v[nw_sz + np_sz : nw_sz + 2 * np_sz], d.c_q.shape)
    sig = v[-1]
    return Primal(w=w, p=p, q=q, sig=sig)


def conevec_order(d: StageSOCP):
    """Fixed flattening order for cone vectors: spec dict order."""
    return list(_spec_of(d).keys())


def flatten_conevec(d: StageSOCP, cv) -> jnp.ndarray:
    return jnp.concatenate([jnp.ravel(cv[k]) for k in conevec_order(d)])


def cone_list(d: StageSOCP):
    """Dense-solver cone list [('lin', n), ('soc', dim) x count ...] matching
    flatten_conevec order."""
    spec = _spec_of(d)
    h = socp.cone_h(d)
    cones = []
    for k in conevec_order(d):
        if spec[k] == "lin":
            cones.append(("lin", int(h[k].size)))
        else:
            arr = h[k]
            count = int(np.prod(arr.shape[:-1]))
            dim = arr.shape[-1]
            cones.extend([("soc", dim)] * count)
    return cones


def materialize(d: StageSOCP):
    """Return dense (c, A, b, G, h, cones, P) as float64 numpy arrays."""
    n = primal_size(d)

    def gfun(v):
        return flatten_conevec(d, socp.apply_G(d, unflatten_primal(d, v)))

    def afun(v):
        return jnp.ravel(socp.apply_A(d, unflatten_primal(d, v)))

    v0 = jnp.zeros((n,), dtype=d.c_w.dtype)
    G = np.asarray(jax.jacfwd(gfun)(v0), dtype=np.float64)
    A = np.asarray(jax.jacfwd(afun)(v0), dtype=np.float64)
    h = np.asarray(flatten_conevec(d, socp.cone_h(d)), dtype=np.float64)
    b = np.asarray(jnp.ravel(d.b), dtype=np.float64)
    c = flatten_primal(socp.objective(d)).astype(np.float64)
    pin_w = np.ravel(1.0 - np.asarray(d.free_w) + np.asarray(d.Q_w))
    P = np.diag(
        np.concatenate(
            [
                pin_w,
                np.zeros(d.c_p.size),
                np.zeros(d.c_q.size),
                np.asarray([1.0 - float(d.free_sig) + float(d.Q_sig)]),
            ]
        )
    )
    # rank-one quadratic rows on the w block
    K, ndirs, nw = np.asarray(d.Q_r1).shape
    Q1 = np.asarray(d.Q_r1)
    for k in range(K):
        for i in range(ndirs):
            v = np.zeros(P.shape[0])
            v[k * nw : (k + 1) * nw] = Q1[k, i]
            P += np.outer(v, v)
    return c, A, b, G, h, cone_list(d), P


def kkt_certificate(c, A, b, G, h, cones, P, x, y, z, s):
    """Return (pres, dres, gap_abs, cone_violation) for a candidate solution."""
    rx = P @ x + c + A.T @ y + G.T @ z
    ry = A @ x - b
    rz = G @ x + s - h
    pres = max(np.linalg.norm(ry), np.linalg.norm(rz)) / max(
        1.0, np.linalg.norm(b), np.linalg.norm(h)
    )
    dres = np.linalg.norm(rx) / max(1.0, np.linalg.norm(c))
    gap = abs(s @ z) / max(1.0, abs(c @ x))  # relative duality gap
    viol = 0.0
    off = 0
    for kind, dd in cones:
        if kind == "lin":
            sl = slice(off, off + dd)
            viol = max(viol, -min(s[sl].min(initial=0.0), z[sl].min(initial=0.0)))
            off += dd
        else:
            sl = slice(off, off + dd)
            viol = max(viol, np.linalg.norm(s[sl][1:]) - s[sl][0])
            viol = max(viol, np.linalg.norm(z[sl][1:]) - z[sl][0])
            off += dd
    return pres, dres, gap, viol
