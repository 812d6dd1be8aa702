"""CuPy drop-in backend: the generic xp-sweep must equal the production
kernel under NumPy (the CuPy instantiation runs the IDENTICAL code path;
this sandbox has no GPU, so numpy-mode parity is the CI gate)."""

import numpy as np
import pytest
from numpy.random import RandomState

import cutwed_ray as cw
from cutwed_ray.kernel.batch import pack_series
from cutwed_ray.kernel.gpu import gpu_available, twed_pairs_gpu


@pytest.mark.parametrize("degree", [2, -2, 3])
def test_xp_sweep_matches_kernel(degree):
    rng = RandomState(11)
    series = [rng.randn(rng.randint(2, 40)) for _ in range(20)]
    ts = [np.arange(len(s), dtype=float) for s in series]
    X, TX, L = pack_series(series, ts)
    ia, ib = np.triu_indices(20, k=1)
    want = cw.twed_pairs(ia, None, ib, None, 0.7, 0.9, degree,
                         pool_a=(X, TX, L), pool_b=(X, TX, L))
    got = twed_pairs_gpu(ia, ib, (X, TX, L), (X, TX, L), 0.7, 0.9, degree,
                         xp=np)
    assert np.allclose(got, want, atol=1e-9)


def test_xp_sweep_rn():
    rng = RandomState(12)
    n, dim = 12, 5
    X = rng.randn(6, n, dim)
    TX = np.tile(np.arange(n, dtype=float), (6, 1))
    L = np.full(6, n, dtype=np.int64)
    ia, ib = np.triu_indices(6, k=1)
    want = cw.twed_pairs(ia, None, ib, None, 1.0, 1.0, 2,
                         pool_a=(X, TX, L), pool_b=(X, TX, L))
    got = twed_pairs_gpu(ia, ib, (X, TX, L), (X, TX, L), 1.0, 1.0, 2, xp=np)
    assert np.allclose(got, want, atol=1e-9)


def test_gpu_available_is_false_here():
    assert gpu_available() is False


def test_linear_memory_20k_pair():
    """The reference's defining feature (README.rst:26-37, 3 rotating
    diagonal buffers, src/cuTWED_core.h:210-226) on a 2 x 20,000-point
    pair: the full DP cube would be ~3.2 GB; the linear sweep's persistent
    scratch must stay under 6*(nA+nB)*P ELEMENTS and its measured
    allocation peak a few MB.  Result pinned to the production kernel."""
    import tracemalloc

    from cutwed_ray.kernel.gpu import sweep_scratch_elements

    n = 20_000
    rng = RandomState(7)
    T = np.arange(n, dtype=float)
    X = np.stack([np.sin(T / 50) + 0.1 * rng.randn(n),
                  np.cos(T / 70) + 0.1 * rng.randn(n)])
    TX = np.tile(T, (2, 1))
    L = np.full(2, n, dtype=np.int64)
    ia, ib = np.array([0]), np.array([1])

    est = sweep_scratch_elements(P=1, Ma=n, Mb=n, SA=2, SB=2)
    assert est < 6 * (n + n) * 1          # impossible with the O(n^2) cube

    want = cw.twed_pairs(ia, None, ib, None, 1.0, 1.0, 2,
                         pool_a=(X, TX, L), pool_b=(X, TX, L))
    tracemalloc.start()
    got = twed_pairs_gpu(ia, ib, (X, TX, L), (X, TX, L), 1.0, 1.0, 2, xp=np)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # cube + cost slabs would be >3 GB; linear sweep stays in the tens of MB
    assert peak < 64 << 20, f"peak {peak >> 20} MiB — not linear memory"
    assert np.allclose(got, want, atol=1e-6)


def test_pair_axis_chunking_matches_unchunked():
    """The byte-budget guard chunks the pair axis; results must be
    bit-identical to the unchunked sweep."""
    rng = RandomState(13)
    series = [rng.randn(rng.randint(5, 60)) for _ in range(12)]
    ts = [np.arange(len(s), dtype=float) for s in series]
    X, TX, L = pack_series(series, ts)
    ia, ib = np.triu_indices(12, k=1)
    full = twed_pairs_gpu(ia, ib, (X, TX, L), (X, TX, L), 0.5, 1.2, 2, xp=np)
    # budget forcing ~1-pair chunks
    tiny = twed_pairs_gpu(ia, ib, (X, TX, L), (X, TX, L), 0.5, 1.2, 2, xp=np,
                          max_scratch_bytes=1)
    assert np.array_equal(full, tiny)
