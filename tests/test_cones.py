"""Property tests for the symmetric-cone algebra (SURVEY.md §4.2 'Unit: cone ops')."""

import jax.numpy as jnp
import numpy as np
import pytest

from successiveconvexification_tpu.ops import cones


SPEC = {"lin": "lin", "soc3": "soc", "soc5": "soc"}


def random_interior(rng, spec=SPEC, ncone=4):
    """Random strictly-interior cone vector."""
    out = {}
    for k, kind in spec.items():
        if kind == "lin":
            out[k] = jnp.asarray(rng.uniform(0.2, 3.0, size=(ncone, 6)))
        else:
            d = int(k[3:])
            tail = rng.normal(size=(ncone, d - 1))
            head = np.linalg.norm(tail, axis=-1) + rng.uniform(0.1, 2.0, size=ncone)
            out[k] = jnp.asarray(np.concatenate([head[:, None], tail], axis=1))
    return out


def dense_W_soc(eta, wbar):
    """Dense NT scaling matrix for one SOC (for verification)."""
    a, b = wbar[0], wbar[1:]
    d = wbar.shape[0]
    M = np.zeros((d, d))
    M[0, 0] = a
    M[0, 1:] = b
    M[1:, 0] = b
    M[1:, 1:] = np.eye(d - 1) + np.outer(b, b) / (1.0 + a)
    return eta * M


def test_nt_scaling_property(rng):
    """W z == W^-1 s == lambda, and W J W = eta^2 J."""
    s = random_interior(rng)
    z = random_interior(rng)
    W = cones.nt_scaling(SPEC, s, z)
    lam1 = cones.w_apply(SPEC, W, z, inverse=False)
    lam2 = cones.w_apply(SPEC, W, s, inverse=True)
    for k in SPEC:
        np.testing.assert_allclose(lam1[k], lam2[k], rtol=1e-10, atol=1e-12)

    # dense check on each soc cone
    for k in ("soc3", "soc5"):
        d = int(k[3:])
        for i in range(s[k].shape[0]):
            eta = float(W[k]["eta"][i])
            wbar = np.asarray(W[k]["wbar"][i])
            Wd = dense_W_soc(eta, wbar)
            J = np.diag([1.0] + [-1.0] * (d - 1))
            np.testing.assert_allclose(Wd @ J @ Wd, eta * eta * J, atol=1e-10)
            np.testing.assert_allclose(Wd @ np.asarray(z[k][i]), lam1[k][i], atol=1e-10)


def test_w_apply_inverse_roundtrip(rng):
    s = random_interior(rng)
    z = random_interior(rng)
    v = {k: jnp.asarray(rng.normal(size=np.shape(a))) for k, a in s.items()}
    W = cones.nt_scaling(SPEC, s, z)
    v2 = cones.w_apply(SPEC, W, cones.w_apply(SPEC, W, v, inverse=False), inverse=True)
    for k in SPEC:
        np.testing.assert_allclose(v2[k], v[k], rtol=1e-9, atol=1e-11)


def test_winv2_apply_matches_dense(rng):
    s = random_interior(rng)
    z = random_interior(rng)
    v = {k: jnp.asarray(rng.normal(size=np.shape(a))) for k, a in s.items()}
    W = cones.nt_scaling(SPEC, s, z)
    got = cones.winv2_apply(SPEC, W, v)
    # reference: W^-1(W^-1 v)
    ref = cones.w_apply(SPEC, W, cones.w_apply(SPEC, W, v, inverse=True), inverse=True)
    for k in SPEC:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-9, atol=1e-11)


def test_jordan_mul_and_solve(rng):
    lam = random_interior(rng)
    d = {k: jnp.asarray(rng.normal(size=np.shape(a))) for k, a in lam.items()}
    x = cones.jordan_solve(SPEC, lam, d)
    d2 = cones.jordan_mul(SPEC, lam, x)
    for k in SPEC:
        np.testing.assert_allclose(d2[k], d[k], rtol=1e-9, atol=1e-11)


def test_jordan_identity(rng):
    lam = random_interior(rng)
    e = cones.identity(SPEC, lam)
    out = cones.jordan_mul(SPEC, lam, e)
    for k in SPEC:
        np.testing.assert_allclose(out[k], lam[k], atol=1e-12)


def test_max_step_exact_on_boundary(rng):
    """After stepping alpha_max, at least one cone must be (numerically) on boundary,
    and stepping 0.999 alpha_max keeps everything strictly inside."""
    s = random_interior(rng)
    ds = {k: jnp.asarray(rng.normal(size=np.shape(a))) for k, a in s.items()}
    alpha = float(cones.max_step(SPEC, s, ds))
    assert alpha > 0

    def min_margin(x):
        m = [np.min(np.asarray(x["lin"]))]
        for k in ("soc3", "soc5"):
            arr = np.asarray(x[k])
            m.append(np.min(arr[:, 0] - np.linalg.norm(arr[:, 1:], axis=1)))
        return min(m)

    if alpha < 1e29:
        inside = {k: s[k] + 0.999 * alpha * ds[k] for k in s}
        assert min_margin(inside) > -1e-9
        at = {k: s[k] + alpha * ds[k] for k in s}
        assert abs(min_margin(at)) < 1e-7


def test_max_step_inf_when_direction_in_cone(rng):
    s = random_interior(rng)
    ds = random_interior(rng)  # direction inside the cone -> never leaves
    alpha = float(cones.max_step(SPEC, s, ds))
    assert alpha > 1e29


def test_degree():
    rng = np.random.default_rng(0)
    x = random_interior(rng)
    # lin: 4*6 rows; soc3: 4 cones; soc5: 4 cones
    assert cones.degree(SPEC, x) == 24 + 4 + 4


def test_inner(rng):
    s = random_interior(rng)
    z = random_interior(rng)
    expected = sum(float(np.sum(np.asarray(s[k]) * np.asarray(z[k]))) for k in SPEC)
    assert float(cones.inner(s, z)) == pytest.approx(expected, rel=1e-12)
