"""Native C++ oracle vs the NumPy oracle (SURVEY §2.1: native components)."""

import numpy as np
import pytest

from successiveconvexification_tpu.oracle import dense_socp, native
from test_ipm_oracle import random_socp


pytestmark = pytest.mark.skipif(not native.available(), reason="g++ build failed")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_numpy_oracle(seed):
    rng = np.random.default_rng(seed)
    c, A, b, G, h, cones = random_socp(rng)
    r_np = dense_socp.solve(c, A, b, G, h, cones)
    r_cc = native.solve(c, A, b, G, h, cones)
    assert r_cc.converged, (r_cc.gap, r_cc.pres, r_cc.dres)
    assert r_cc.gap < 1e-8 and r_cc.pres < 1e-8 and r_cc.dres < 1e-8
    np.testing.assert_allclose(r_cc.x, r_np.x, atol=1e-6)
    assert abs(float(c @ r_cc.x) - float(c @ r_np.x)) < 1e-7


def test_native_lp():
    c = np.array([-1.0, -1.0])
    A = np.zeros((0, 2))
    b = np.zeros(0)
    G = np.array([[1.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
    h = np.array([1.0, 0.0, 0.0])
    res = native.solve(c, A, b, G, h, [("lin", 3)])
    assert res.converged
    assert c @ res.x == pytest.approx(-1.0, abs=1e-8)
