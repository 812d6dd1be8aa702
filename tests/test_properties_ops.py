"""Hypothesis property tests for the pure vectorized helpers the dedup /
pairing operators are built on (no Ray session needed — these run on the
driver against straightforward Python reference implementations)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from cutwed_ray.stages.hashing import _ranges, hash_string_array, splitmix64
from cutwed_ray.stages.pairgen import _pairs_within_segments


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=7), min_size=0, max_size=12))
def test_pairs_within_segments_matches_reference(sizes):
    sizes = np.asarray(sizes, dtype=np.int64)
    ia, ib = _pairs_within_segments(sizes)
    want = []
    base = 0
    for m in sizes:
        for i in range(m):
            for j in range(i + 1, m):
                want.append((base + i, base + j))
        base += m
    got = sorted(zip(ia.tolist(), ib.tolist()))
    assert got == sorted(want)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=100),
                          st.integers(min_value=0, max_value=9)),
                min_size=0, max_size=10))
def test_ranges_matches_reference(spans):
    starts = np.asarray([s for s, _ in spans], dtype=np.int64)
    counts = np.asarray([c for _, c in spans], dtype=np.int64)
    nz = counts > 0
    got = _ranges(starts[nz], counts[nz]).tolist()
    want = [x for s, c in spans for x in range(s, s + c) if c > 0]
    assert got == want


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet="abc xyz0.", max_size=20), min_size=0, max_size=20))
def test_string_hash_equality_iff_equal_strings(texts):
    """Equal strings hash equal (both variants); the 128-bit combination
    separates every distinct pair in practice."""
    arr = pa.array(texts, pa.string())
    h1 = hash_string_array(arr)
    h2 = hash_string_array(arr, variant=1)
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if texts[i] == texts[j]:
                assert h1[i] == h1[j] and h2[i] == h2[j]
            else:
                assert (h1[i], h2[i]) != (h1[j], h2[j])


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                min_size=1, max_size=50))
def test_splitmix64_bijective_on_samples(xs):
    """splitmix64 is a bijection: distinct inputs -> distinct outputs."""
    x = np.asarray(xs, dtype=np.uint64)
    y = splitmix64(x)
    assert len(set(y.tolist())) == len(set(x.tolist()))


@settings(max_examples=25, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
                         min_size=0, max_size=10),
                min_size=1, max_size=8))
def test_doc_shingle_sets_match_python_reference(docs):
    """_doc_shingle_sets(k=2): per-doc unique shingle COUNT equals the
    Python set of 2-gram strings (short docs collapse to one fallback)."""
    from cutwed_ray.ops.dedup import _doc_shingle_sets

    texts = [" ".join(d) for d in docs]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ids, vu, off = _doc_shingle_sets(t, "text", "doc_id", 2)
    for i, d in enumerate(docs):
        if len(d) >= 2:
            want = len({(d[j], d[j + 1]) for j in range(len(d) - 1)})
        else:
            want = 1                    # fallback whole-doc shingle
        assert off[i + 1] - off[i] == want, (d, vu[off[i]:off[i + 1]])
