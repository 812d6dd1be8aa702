"""Golden-value conformance tests.

Regenerates the reference's exact seeded fixtures (FIXTURES.md F3/F4) and
asserts our kernels reproduce cuTWED's published distances:
  54.543169   — /root/reference/tests/test_basic.py:32
  44.739147   — /root/reference/tests/test_batch.py:36
  55074.428733— /root/reference/tests/test_large.py:32
  58.981692   — /root/reference/tests/test_reference.py:33 (no-root mode)
"""

import numpy as np
import pytest
from numpy.random import RandomState

from cutwed_ray import twed, twed_batch, twed_ref, twed_pairs


def sinusoid_pair(n=10):
    """FIXTURES.md F3: RandomState(42), noise drawn sequentially (A then B)."""
    rng = RandomState(42)
    noise1 = rng.randn(n)
    TA = np.arange(n, dtype=np.float64)
    A = np.sin(TA) + np.sin(TA / 10) + noise1
    m = 2 * n
    noise2 = rng.randn(m)
    TB = np.arange(m, dtype=np.float64)
    B = np.sin(TB) + np.sin(TB / 10) + noise2
    return A, TA, B, TB


class TestGoldenBasic:
    def test_twed_basic(self):
        A, TA, B, TB = sinusoid_pair(10)
        assert np.allclose(twed(A, TA, B, TB, 1.0, 1.0, 2), 54.543169)

    def test_twed_basic_float32(self):
        A, TA, B, TB = sinusoid_pair(10)
        d = twed(A.astype(np.float32), TA.astype(np.float32),
                 B.astype(np.float32), TB.astype(np.float32), 1.0, 1.0, 2)
        assert np.allclose(d, 54.543169)

    def test_oracle_basic(self):
        A, TA, B, TB = sinusoid_pair(10)
        assert np.allclose(twed_ref(A, TA, B, TB, 1.0, 1.0, 2), 54.543169)

    def test_vs_zero_series(self):
        A, TA, B, TB = sinusoid_pair(10)
        Z = np.zeros_like(B)
        assert np.allclose(twed(A, TA, Z, TB, 1.0, 1.0, 2), 44.739147)
        assert np.allclose(twed_ref(A, TA, Z, TB, 1.0, 1.0, 2), 44.739147)

    def test_noroot_repro_mode(self):
        """Negative degree = the reference's hidden 'no nth root' mode
        (twed.c:113-119), golden 58.981692 (tests/test_reference.py:33)."""
        A, TA, B, TB = sinusoid_pair(10)
        assert np.allclose(twed_ref(A, TA, B, TB, 1.0, 1.0, -2), 58.981692)
        assert np.allclose(twed(A, TA, B, TB, 1.0, 1.0, -2), 58.981692)

    def test_large(self):
        """n=10,000 vs m=20,000 golden (tests/test_large.py:32)."""
        A, TA, B, TB = sinusoid_pair(10_000)
        assert np.allclose(twed(A, TA, B, TB, 1.0, 1.0, 2), 55074.428733)


class TestGoldenBatch:
    def test_batch_tile(self):
        """FIXTURES.md F4 / tests/test_batch.py:38-84."""
        A, TA, B, TB = sinusoid_pair(10)
        bs = 16
        AA = np.tile(A, (bs, 1)); TAA = np.tile(TA, (bs, 1))
        BB = np.tile(B, (bs, 1)); TBB = np.tile(TB, (bs, 1))
        BB[bs // 2:] = 0
        Ref = np.zeros((bs, bs))
        Ref[:, : bs // 2] = 54.54317
        Ref[:, bs // 2:] = 44.739147
        res = twed_batch(AA, TAA, BB, TBB, 1.0, 1.0, 2)
        assert np.allclose(Ref, res)

        resf = twed_batch(AA.astype(np.float32), TAA.astype(np.float32),
                          BB.astype(np.float32), TBB.astype(np.float32), 1.0, 1.0, 2)
        assert resf.dtype == np.float32
        assert np.allclose(Ref, resf)

    def test_batch_tril_triu(self):
        """Strictly-lower / strictly-upper semantics (tests/test_batch.py:86-113)."""
        A, TA, B, TB = sinusoid_pair(10)
        bs = 12
        AA = np.tile(A, (bs, 1)); TAA = np.tile(TA, (bs, 1))
        BB = np.tile(B, (bs, 1)); TBB = np.tile(TB, (bs, 1))
        BB[bs // 2:] = 0
        full = twed_batch(AA, TAA, BB, TBB, 1.0, 1.0, 2)
        tril = twed_batch(AA, TAA, BB, TBB, 1.0, 1.0, 2, tri="tril")
        assert np.allclose(np.tril(full, -1), tril)
        triu = twed_batch(BB, TBB, AA, TAA, 1.0, 1.0, 2, tri="triu")
        full_ba = twed_batch(BB, TBB, AA, TAA, 1.0, 1.0, 2)
        assert np.allclose(np.triu(full_ba, 1), triu)

    def test_tri_requires_square(self):
        A, TA, B, TB = sinusoid_pair(10)
        with pytest.raises(ValueError):
            twed_batch(np.tile(A, (3, 1)), np.tile(TA, (3, 1)),
                       np.tile(A, (4, 1)), np.tile(TA, (4, 1)),
                       1.0, 1.0, 2, tri="tril")


class TestGoldenRn:
    """R^N multi-dim parity, cross-checked against the reference's own
    mnist_4x4.npz golden fixture when available (tests/test_Rn.py:104-126)."""

    def test_mnist_golden_if_available(self):
        import os
        path = "/root/reference/tests/data/mnist_4x4.npz"
        if not os.path.exists(path):
            pytest.skip("reference fixture not available")
        dat = np.load(path)
        A, B, T = dat["A"], dat["B"], dat["T"]
        d = twed(A, T, B, T, 1.0, 1.0, 2)
        assert np.allclose(d, 7948.0187956562495)
        assert np.allclose(twed_ref(A, T, B, T, 1.0, 1.0, 2), d)
        if "AA" in dat and "DIST" in dat:
            AA, BB, DIST = dat["AA"], dat["BB"], dat["DIST"]
            TT = np.tile(T, (AA.shape[0], 1))
            # the stored golden DIST is upper-triangular (zeros below diag)
            res = twed_batch(AA, TT, BB, TT, 1.0, 1.0, 2)
            assert np.allclose(np.triu(res), DIST)

    def test_rn_seeded(self):
        """FIXTURES.md F6: seeded random R^8 series, batch kernel vs oracle."""
        rng = RandomState(7)
        n, dim = 20, 8
        A = rng.randn(n, dim); B = rng.randn(n + 5, dim)
        TA = np.arange(n, dtype=float); TB = np.arange(n + 5, dtype=float)
        got = twed(A, TA, B, TB, 0.5, 0.75, 2)
        want = twed_ref(A, TA, B, TB, 0.5, 0.75, 2)
        assert np.allclose(got, want, atol=1e-9)


class TestPairsKernel:
    def test_variable_length_pairs_vs_oracle(self):
        rng = RandomState(123)
        series_a, ts_a, series_b, ts_b, want = [], [], [], [], []
        for _ in range(20):
            na, nb = rng.randint(3, 40), rng.randint(3, 40)
            a, b = rng.randn(na), rng.randn(nb)
            ta, tb = np.arange(na, dtype=float), np.arange(nb, dtype=float)
            series_a.append(a); ts_a.append(ta); series_b.append(b); ts_b.append(tb)
            want.append(twed_ref(a, ta, b, tb, 1.0, 1.0, 2))
        got = twed_pairs(series_a, ts_a, series_b, ts_b, 1.0, 1.0, 2)
        assert np.allclose(got, np.array(want), atol=1e-9)

    def test_pool_indirection(self):
        """Pool calling convention scores (i, j) index pairs over shared pools."""
        from cutwed_ray.kernel.batch import pack_series
        rng = RandomState(5)
        series = [rng.randn(rng.randint(5, 30)) for _ in range(8)]
        ts = [np.arange(len(s), dtype=float) for s in series]
        X, TX, lens = pack_series(series, ts)
        ia, ib = np.triu_indices(8, k=1)
        got = twed_pairs(ia, None, ib, None, 1.0, 1.0, 2,
                         pool_a=(X, TX, lens), pool_b=(X, TX, lens))
        for k in range(ia.size):
            i, j = int(ia[k]), int(ib[k])
            want = twed_ref(series[i], ts[i], series[j], ts[j], 1.0, 1.0, 2)
            assert np.allclose(got[k], want, atol=1e-9)


class TestMetricProperties:
    def test_identity_symmetry(self):
        rng = RandomState(11)
        for _ in range(5):
            n = rng.randint(4, 25)
            a = rng.randn(n); ta = np.arange(n, dtype=float)
            m = rng.randint(4, 25)
            b = rng.randn(m); tb = np.arange(m, dtype=float)
            assert twed(a, ta, a, ta, 1.0, 1.0, 2) == pytest.approx(0.0, abs=1e-12)
            assert twed(a, ta, b, tb, 1.0, 1.0, 2) == pytest.approx(
                twed(b, tb, a, ta, 1.0, 1.0, 2), rel=1e-12)

    def test_triangle_inequality_spot(self):
        rng = RandomState(13)
        for _ in range(10):
            n = int(rng.randint(4, 16))
            t = np.arange(n, dtype=float)
            a, b, c = rng.randn(n), rng.randn(n), rng.randn(n)
            dab = twed(a, t, b, t, 1.0, 1.0, 2)
            dbc = twed(b, t, c, t, 1.0, 1.0, 2)
            dac = twed(a, t, c, t, 1.0, 1.0, 2)
            assert dac <= dab + dbc + 1e-9
