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
