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


@pytest.mark.parametrize("degree", [2, -2, 3])
def test_c_float32_twin(pools, degree, monkeypatch):
    """float32 pools must run through the genuine float C twins
    (twed_pairs_pool_f — the reference's twedf surface, src/cuTWED.h:42-53),
    agreeing with the float32 NumPy sweep to f32 tolerance."""
    X, TX, L, ia, ib = pools
    if ckernel.get_lib() is None:
        pytest.skip("no C compiler available")
    X32, TX32 = X.astype(np.float32), TX.astype(np.float32)
    # assert the C path actually fires for f32 (not the NumPy fallback)
    called = {}
    orig = ckernel.twed_pairs_c

    def spy(*a, **k):
        called["dtype"] = np.asarray(a[0]).dtype
        return orig(*a, **k)

    import cutwed_ray.kernel.batch as kb
    monkeypatch.setattr(ckernel, "twed_pairs_c", spy)
    rc = cw.twed_pairs(ia, None, ib, None, 0.7, 0.9, degree, dtype=np.float32,
                       pool_a=(X32, TX32, L), pool_b=(X32, TX32, L))
    assert called.get("dtype") == np.float32
    assert rc.dtype == np.float32
    monkeypatch.setenv("CUTWED_RAY_NO_CKERNEL", "1")
    monkeypatch.setattr(ckernel, "_LIB", None)
    rn = cw.twed_pairs(ia, None, ib, None, 0.7, 0.9, degree, dtype=np.float32,
                       pool_a=(X32, TX32, L), pool_b=(X32, TX32, L))
    assert np.allclose(rc, rn, rtol=2e-5, atol=2e-4)


def test_c_float32_golden():
    """The seeded sinusoid golden through the f32 C path (twedf parity)."""
    if ckernel.get_lib() is None:
        pytest.skip("no C compiler available")
    rng = RandomState(42)
    n = 10
    noise1 = rng.randn(n)
    TA = np.arange(n, dtype=np.float32)
    A = (np.sin(TA) + np.sin(TA / 10) + noise1).astype(np.float32)
    m = 2 * n
    noise2 = rng.randn(m)
    TB = np.arange(m, dtype=np.float32)
    B = (np.sin(TB) + np.sin(TB / 10) + noise2).astype(np.float32)
    out = ckernel.twed_pairs_c(
        A[None, :, None], TA[None, :], np.array([n]),
        B[None, :, None], TB[None, :], np.array([m]),
        np.zeros(1, np.int64), np.zeros(1, np.int64), 1.0, 1.0, 2)
    assert out is not None and out.dtype == np.float32
    assert abs(float(out[0]) - 54.543169) < 1e-3


def test_sweep_scratch_guardrail(monkeypatch):
    """Pathological P x M combinations raise an actionable error instead of
    an OOM (the analogue of the reference's BATCH_LIMIT/DIMENSION_LIMIT
    guards, src/cuTWED.cu:38-39)."""
    import cutwed_ray.kernel.batch as kb

    monkeypatch.setattr(kb, "MAX_SWEEP_BYTES", 1 << 20)
    X = np.zeros((4, 3000, 1)); TX = np.zeros((4, 3000))
    L = np.full(4, 3000, dtype=np.int64)
    ia = np.repeat(np.arange(4, dtype=np.int64), 50)
    ib = np.tile(np.arange(4, dtype=np.int64), 50)
    with pytest.raises(ValueError, match="MAX_SWEEP_BYTES"):
        cw.twed_pairs(ia, None, ib, None, 1.0, 1.0, 2,
                      pool_a=(X, TX, L), pool_b=(X, TX, L))
