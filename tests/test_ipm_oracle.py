"""Tests for the dense f64 oracle IPM on random SOCPs (SURVEY.md §4.2 'Unit: IPM').

Problems are generated feasible-and-bounded by construction (primal point + dual
point exist), and optimality is certified by KKT residuals — a complete check that
needs no external solver.
"""

import numpy as np
import pytest

from successiveconvexification_tpu.oracle import dense_socp


def random_socp(rng, n=20, p=6, cones=(("lin", 8), ("soc", 3), ("soc", 5))):
    m = sum(d for _, d in cones)
    A = rng.normal(size=(p, n))
    G = rng.normal(size=(m, n))

    def interior(cones):
        v = rng.normal(size=m)
        off = 0
        for kind, d in cones:
            if kind == "lin":
                v[off : off + d] = rng.uniform(0.5, 2.0, size=d)
            else:
                v[off] = np.linalg.norm(v[off + 1 : off + d]) + rng.uniform(0.5, 2.0)
            off += d
        return v

    x0 = rng.normal(size=n)
    s0 = interior(cones)
    h = G @ x0 + s0
    b = A @ x0
    z0 = interior(cones)
    y0 = rng.normal(size=p)
    c = -A.T @ y0 - G.T @ z0  # makes the dual feasible -> bounded primal
    return c, A, b, G, h, list(cones)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_random_socp_kkt_certificate(seed):
    rng = np.random.default_rng(seed)
    c, A, b, G, h, cones = random_socp(rng)
    res = dense_socp.solve(c, A, b, G, h, cones)
    assert res.converged, (res.gap, res.pres, res.dres)
    assert res.gap < 1e-8
    assert res.pres < 1e-8
    assert res.dres < 1e-8


def test_known_solution_lp():
    """min -x1 - x2 s.t. x1 + x2 <= 1, x >= 0 (as cone rows) -> opt -1."""
    c = np.array([-1.0, -1.0])
    A = np.zeros((0, 2))
    b = np.zeros(0)
    G = np.array([[1.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
    h = np.array([1.0, 0.0, 0.0])
    res = dense_socp.solve(c, A, b, G, h, [("lin", 3)])
    assert res.converged
    assert c @ res.x == pytest.approx(-1.0, abs=1e-8)


def test_known_solution_soc_projection():
    """min ||x - a|| via epigraph: min t s.t. (t, x - a) in SOC, x = 0 fixed by A.

    With x pinned to 0, optimum is t = ||a||.
    """
    a = np.array([3.0, 4.0])
    # variables: (t, x1, x2)
    c = np.array([1.0, 0.0, 0.0])
    A = np.array([[0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    b = np.zeros(2)
    # SOC row: s = h - G v = (t, x - a) in SOC
    G = np.array([[-1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]])
    h = np.array([0.0, -3.0, -4.0])
    res = dense_socp.solve(c, A, b, G, h, [("soc", 3)])
    assert res.converged
    assert res.x[0] == pytest.approx(5.0, abs=1e-7)


def test_quadratic_term():
    """min 0.5||x||^2 + c'x with x free -> x = -c (P = I, no cones active)."""
    n = 4
    c = np.array([1.0, -2.0, 0.5, 0.0])
    A = np.zeros((0, n))
    b = np.zeros(0)
    # inactive box -10 <= x_i <= 10
    G = np.vstack([np.eye(n), -np.eye(n)])
    h = 10.0 * np.ones(2 * n)
    res = dense_socp.solve(c, A, b, G, h, [("lin", 2 * n)], P=np.eye(n))
    assert res.converged
    np.testing.assert_allclose(res.x, -c, atol=1e-7)
