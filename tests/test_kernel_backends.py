"""C fast path vs NumPy anti-diagonal sweep: identical semantics.

Both backends implement twed.c:74-210; the golden suite pins absolute
values, this pins cross-backend agreement on random variable-length pairs
across all degree modes (incl. the negative-degree no-root mode).
"""

import numpy as np
import pytest
from numpy.random import RandomState

import cutwed_ray as cw
from cutwed_ray.kernel import ckernel
from cutwed_ray.kernel.batch import pack_series


@pytest.fixture()
def pools():
    rng = RandomState(99)
    series = [rng.randn(rng.randint(3, 60)) for _ in range(30)]
    ts = [np.arange(len(s), dtype=float) for s in series]
    X, TX, L = pack_series(series, ts)
    ia, ib = np.triu_indices(30, k=1)
    return X, TX, L, ia, ib


@pytest.mark.parametrize("degree", [2, -2, 3, 1])
def test_c_numpy_parity(pools, degree, monkeypatch):
    X, TX, L, ia, ib = pools
    if ckernel.get_lib() is None:
        pytest.skip("no C compiler available")
    rc = cw.twed_pairs(ia, None, ib, None, 0.7, 0.9, degree,
                       pool_a=(X, TX, L), pool_b=(X, TX, L))
    monkeypatch.setenv("CUTWED_RAY_NO_CKERNEL", "1")
    monkeypatch.setattr(ckernel, "_LIB", None)
    rn = cw.twed_pairs(ia, None, ib, None, 0.7, 0.9, degree,
                       pool_a=(X, TX, L), pool_b=(X, TX, L))
    assert np.allclose(rc, rn, atol=1e-9)


def test_degenerate_lengths():
    """Empty-vs-empty is 0; empty-vs-nonempty is +inf (twed.c borders)."""
    X = np.zeros((2, 3, 1)); TX = np.zeros((2, 3))
    L = np.array([0, 3]); TX[1] = np.arange(3); X[1, :, 0] = [1.0, 2.0, 3.0]
    ia = np.array([0, 0, 1]); ib = np.array([0, 1, 1])
    r = cw.twed_pairs(ia, None, ib, None, 1.0, 1.0, 2,
                      pool_a=(X, TX, L), pool_b=(X, TX, L))
    assert r[0] == 0.0
    assert np.isinf(r[1])
    assert r[2] == 0.0
