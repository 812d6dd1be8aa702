"""Dataset-level conformance (FIXTURES.md F5 + property tests).

Mirrors the reference's UCI synthetic_control all-pairs validation
(/root/reference/tests/test_synthetic_validation.py) with a regenerated
class-shaped corpus, and adds hypothesis property tests against the O(n²)
oracle — the role the three-way cross-implementation protocol plays in the
reference (SURVEY.md §5).
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st
from numpy.random import RandomState

from cutwed_ray import twed, twed_batch, twed_ref


def control_chart(n_series=60, n_samples=60, seed=7):
    """Six class shapes (constant/trend-up/trend-down/cyclic/shift-up/
    shift-down) + noise — the F5 analogue of UCI synthetic_control."""
    rng = RandomState(seed)
    per = n_series // 6
    t = np.arange(n_samples, dtype=float)
    out, klass = [], []
    for c in range(6):
        for _ in range(per):
            base = 30 + rng.randn(n_samples) * 2
            if c == 1:
                base += 0.4 * t
            elif c == 2:
                base -= 0.4 * t
            elif c == 3:
                base += 10 * np.sin(2 * np.pi * t / 15)
            elif c == 4:
                base[n_samples // 2:] += 15
            elif c == 5:
                base[n_samples // 2:] -= 15
            out.append(base)
            klass.append(c)
    return np.stack(out), np.array(klass), t


class TestControlChart:
    def test_allpairs_batch_vs_oracle(self):
        """Batch kernel all-pairs matrix agrees with the per-pair oracle on
        a sampled subset, and intra-class distances < inter-class."""
        X, klass, t = control_chart(n_series=36)
        T = np.tile(t, (X.shape[0], 1))
        D = twed_batch(X, T, X, T, 1.0, 1.0, 2)
        assert np.allclose(np.diag(D), 0.0, atol=1e-9)
        assert np.allclose(D, D.T, atol=1e-9)

        rng = RandomState(3)
        for _ in range(10):
            i, j = rng.randint(0, X.shape[0], 2)
            want = twed_ref(X[i], t, X[j], t, 1.0, 1.0, 2)
            assert np.allclose(D[i, j], want, atol=1e-8)

        # class structure: mean intra-class < mean inter-class distance
        same = klass[:, None] == klass[None, :]
        off = ~np.eye(len(klass), dtype=bool)
        assert D[same & off].mean() < D[~same].mean()

    def test_tril_halves_work_same_values(self):
        X, klass, t = control_chart(n_series=18)
        T = np.tile(t, (X.shape[0], 1))
        full = twed_batch(X, T, X, T, 1.0, 1.0, 2)
        tril = twed_batch(X, T, X, T, 1.0, 1.0, 2, tri="tril")
        assert np.allclose(np.tril(full, -1), tril)


@st.composite
def series_pair(draw):
    n = draw(st.integers(1, 24))
    m = draw(st.integers(1, 24))
    a = draw(st.lists(st.floats(-50, 50, allow_nan=False, width=32),
                      min_size=n, max_size=n))
    b = draw(st.lists(st.floats(-50, 50, allow_nan=False, width=32),
                      min_size=m, max_size=m))
    nu = draw(st.floats(0, 5, allow_nan=False))
    lamb = draw(st.floats(0, 5, allow_nan=False))
    return np.array(a), np.array(b), nu, lamb


class TestProperties:
    @settings(max_examples=40, deadline=None)
    @given(series_pair())
    def test_kernel_matches_oracle(self, data):
        a, b, nu, lamb = data
        ta = np.arange(a.shape[0], dtype=float)
        tb = np.arange(b.shape[0], dtype=float)
        got = twed(a, ta, b, tb, nu, lamb, 2)
        want = twed_ref(a, ta, b, tb, nu, lamb, 2)
        assert np.isclose(got, want, rtol=1e-9, atol=1e-9)

    @settings(max_examples=25, deadline=None)
    @given(series_pair())
    def test_symmetry(self, data):
        a, b, nu, lamb = data
        ta = np.arange(a.shape[0], dtype=float)
        tb = np.arange(b.shape[0], dtype=float)
        assert np.isclose(twed(a, ta, b, tb, nu, lamb, 2),
                          twed(b, tb, a, ta, nu, lamb, 2), rtol=1e-9)

    @settings(max_examples=25, deadline=None)
    @given(series_pair())
    def test_identity_and_nonneg(self, data):
        a, b, nu, lamb = data
        ta = np.arange(a.shape[0], dtype=float)
        assert twed(a, ta, a, ta, nu, lamb, 2) == pytest.approx(0.0, abs=1e-9)
        tb = np.arange(b.shape[0], dtype=float)
        assert twed(a, ta, b, tb, nu, lamb, 2) >= -1e-12
