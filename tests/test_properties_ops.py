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


# --------------------------------------------------- temporal join cores
_join_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=4),      # key
              st.integers(min_value=0, max_value=12),     # time
              st.booleans()),                             # is_left
    min_size=0, max_size=40)


@settings(max_examples=200, deadline=None)
@given(_join_rows)
def test_asof_merge_matches_bruteforce(rows):
    from cutwed_ray.ops.joins import asof_merge_indices

    k = np.array([r[0] for r in rows], dtype=np.int64)
    t = np.array([r[1] for r in rows], dtype=np.int64)
    isl = np.array([1 if r[2] else 0 for r in rows], dtype=np.int8)
    tie = np.arange(len(rows), dtype=np.int64)        # unique per row
    if len(rows) == 0:
        return
    li, ri = asof_merge_indices(k, t, isl, tie)
    got = dict(zip(li.tolist(), ri.tolist()))
    for i in range(len(rows)):
        if isl[i] != 1:
            continue
        cand = [j for j in range(len(rows))
                if isl[j] == 0 and k[j] == k[i] and t[j] <= t[i]]
        if not cand:
            assert i not in got
        else:
            best = max(cand, key=lambda j: (t[j], tie[j]))
            assert got[i] == best, (i, got.get(i), best)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=4),
                          st.integers(min_value=0, max_value=12)),
                min_size=0, max_size=25),
       st.lists(st.tuples(st.integers(min_value=0, max_value=4),
                          st.integers(min_value=0, max_value=12),
                          st.integers(min_value=-5, max_value=9)),
                min_size=0, max_size=30),
       st.integers(min_value=-4, max_value=2))
def test_range_merge_matches_bruteforce(lefts, rights, lo_off):
    from cutwed_ray.ops.joins import range_merge_aggregates

    hi_off = lo_off + 3
    nl, nr = len(lefts), len(rights)
    # rows: per left a lo and a hi boundary, then the right rows
    k = np.array([l[0] for l in lefts] * 2 + [r[0] for r in rights],
                 dtype=np.int64)
    t = np.array([l[1] + lo_off for l in lefts]
                 + [l[1] + hi_off for l in lefts]
                 + [r[1] for r in rights], dtype=np.int64)
    isev = np.array([0] * (2 * nl) + [1] * nr, dtype=np.int8)
    bkind = np.array([0] * nl + [1] * nl + [-1] * nr, dtype=np.int8)
    val = np.array([0] * (2 * nl) + [r[2] for r in rights], dtype=np.int64)
    li, cnt, sm = range_merge_aggregates(k, t, isev, bkind, val)
    assert len(li) == nl and len(cnt) == nl and len(sm) == nl
    # lo rows occupy positions 0..nl-1; map back to the left row
    for pos, c, s in zip(li.tolist(), cnt.tolist(), sm.tolist()):
        lk, lt = lefts[pos]
        m = [r for r in rights
             if r[0] == lk and lt + lo_off <= r[1] < lt + hi_off]
        assert c == len(m), (pos, c, m)
        assert s == sum(r[2] for r in m)
