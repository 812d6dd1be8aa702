"""Three-way TWED conformance (SURVEY.md §5 layer 3).

The reference repo cross-checks THREE independent implementations
(cuTWED, its C reference, and the pip ``pytwed`` port —
/root/reference/tests/test_Rn.py:28-101).  Here the third, structurally
independent implementation is the textbook zero-padded formulation of
Marteau's TWED (as published in the original paper / the public ``pytwed``
lineage): series are prefixed with a zero point and the full
(n+1) x (m+1) matrix is filled with the classic three-case recurrence —
no shared code or structure with either ``kernel.batch`` (anti-diagonal
pair sweep) or ``kernel.reference`` (hoisted local-cost formulation).
"""

import os

import numpy as np
import pytest
from numpy.random import RandomState

from cutwed_ray import twed, twed_ref


def twed_textbook(A, TA, B, TB, nu, lamb, degree=2):
    """Zero-padded full-matrix TWED (independent third implementation)."""
    deg = abs(int(degree))
    root = degree > 0

    def dist(x, y):
        s = float(np.sum(np.abs(np.atleast_1d(x) - np.atleast_1d(y)) ** deg))
        if not root:
            return s
        return s ** (1.0 / deg)

    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    if A.ndim == 1:
        A = A[:, None]
    if B.ndim == 1:
        B = B[:, None]
    # prefix the virtual zero point (index 0) the recurrence references
    A = np.vstack([np.zeros((1, A.shape[1])), A])
    B = np.vstack([np.zeros((1, B.shape[1])), B])
    TA = np.concatenate([[0.0], np.asarray(TA, dtype=np.float64)])
    TB = np.concatenate([[0.0], np.asarray(TB, dtype=np.float64)])
    n, m = A.shape[0], B.shape[0]

    D = np.full((n, m), np.inf)
    D[0, 0] = 0.0
    for i in range(1, n):
        for j in range(1, m):
            c_match = (D[i - 1, j - 1]
                       + dist(A[i], B[j]) + dist(A[i - 1], B[j - 1])
                       + nu * (abs(TA[i] - TB[j]) + abs(TA[i - 1] - TB[j - 1])))
            c_del_a = (D[i - 1, j] + dist(A[i], A[i - 1])
                       + lamb + nu * (TA[i] - TA[i - 1]))
            c_del_b = (D[i, j - 1] + dist(B[j], B[j - 1])
                       + lamb + nu * (TB[j] - TB[j - 1]))
            D[i, j] = min(c_match, c_del_a, c_del_b)
    return D[n - 1, m - 1]


def _sinusoid_pair(n=10):
    rng = RandomState(42)
    noise1 = rng.randn(n)
    TA = np.arange(n, dtype=np.float64)
    A = np.sin(TA) + np.sin(TA / 10) + noise1
    m = 2 * n
    noise2 = rng.randn(m)
    TB = np.arange(m, dtype=np.float64)
    B = np.sin(TB) + np.sin(TB / 10) + noise2
    return A, TA, B, TB


class TestThreeWay:
    def test_three_way_golden(self):
        A, TA, B, TB = _sinusoid_pair()
        d1 = twed(A, TA, B, TB, 1.0, 1.0, 2)
        d2 = twed_ref(A, TA, B, TB, 1.0, 1.0, 2)
        d3 = twed_textbook(A, TA, B, TB, 1.0, 1.0, 2)
        assert np.allclose([d1, d2, d3], 54.543169)

    @pytest.mark.parametrize("degree", [2, 1, 3, -2])
    @pytest.mark.parametrize("nu,lamb", [(1.0, 1.0), (0.01, 0.5), (0.0, 0.0)])
    def test_three_way_random(self, degree, nu, lamb):
        rng = RandomState(degree + 100)
        for _ in range(3):
            la, lb = rng.randint(2, 25, size=2)
            A, B = rng.randn(la), rng.randn(lb)
            TA = np.cumsum(rng.rand(la) + 0.1)
            TB = np.cumsum(rng.rand(lb) + 0.1)
            d1 = twed(A, TA, B, TB, nu, lamb, degree)
            d2 = twed_ref(A, TA, B, TB, nu, lamb, degree)
            d3 = twed_textbook(A, TA, B, TB, nu, lamb, degree)
            assert np.allclose(d1, d3, atol=1e-9), (d1, d3)
            assert np.allclose(d2, d3, atol=1e-9)

    def test_three_way_mnist(self):
        """The reference's own R^28 mnist fixture through all three."""
        path = "/root/reference/tests/data/mnist_4x4.npz"
        if not os.path.exists(path):
            pytest.skip("reference fixture not available")
        dat = np.load(path)
        A, B, T = dat["A"], dat["B"], dat["T"]
        d1 = twed(A, T, B, T, 1.0, 1.0, 2)
        d2 = twed_ref(A, T, B, T, 1.0, 1.0, 2)
        d3 = twed_textbook(A, T, B, T, 1.0, 1.0, 2)
        assert np.allclose([d1, d2], 7948.0187956562495)
        assert np.allclose(d3, 7948.0187956562495)
