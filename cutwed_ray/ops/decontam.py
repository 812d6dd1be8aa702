"""Benchmark decontamination: flag corpus documents that share a k-token
shingle with a held-out / benchmark set.

The standard LLM-training-data hygiene step: before training, every
corpus document is checked for n-gram overlap against the evaluation
benchmarks so test data cannot leak into the training set.

Scale shape (the reason this is broadcast, not a join): the BENCHMARK
side is small by construction — eval sets are 1e3-1e6 documents against
a 100-TB corpus.  Its distinct shingle-hash set is reduced per batch
(unique inside ``map_batches``), collected once (8 bytes per distinct
gram — a 1M-gram benchmark is 8 MB on the driver), ``ray.put`` once as
one sorted array, and every corpus batch resolves membership with a
single ``searchsorted`` against the broadcast — no shuffle, no join, the
corpus side streams with backpressure.  Matching is on 64-bit shingle
hashes (collision probability ~ m*n / 2**64 — negligible at any
realistic benchmark size; a DuckDB oracle comparing gram STRINGS
hash-matches the output at test scale).

Tokenization/shingle semantics are shared with ``ops.dedup`` (whitespace
runs; docs with fewer than k tokens contribute ONE order-insensitive
whole-doc shingle), so the same DuckDB shingle SQL fragment oracles both.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def collect_benchmark_shingles(benchmark_ds, *, k: int = 3,
                               text_col: str = "text") -> np.ndarray:
    """Distinct k-token shingle hashes of the (small) benchmark set.

    Per-batch tokenize + shingle + unique inside ``map_batches`` (the
    heavy work is distributed); the driver only merges the per-batch
    distinct hash arrays.  Returns a SORTED int64 view (the uint64
    hashes reinterpreted — both sides of the membership test use the
    same view, so the order is consistent).
    """
    from cutwed_ray.stages.hashing import shingle_hashes
    from cutwed_ray.stages.tokenize import tokenize_content

    def grams(t: pa.Table) -> pa.Table:
        th, off = tokenize_content(t.column(text_col), max_tokens=1 << 20)
        sh, _ = shingle_hashes(th, off, k)
        return pa.table({"g": pa.array(np.unique(sh).view(np.int64),
                                       pa.int64())})

    parts = [b.column("g").to_numpy() for b in
             benchmark_ds.map_batches(grams, batch_format="pyarrow")
                         .iter_batches(batch_format="pyarrow",
                                       batch_size=None)]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts))


def decontaminate(corpus_ds, benchmark_ds, *, k: int = 3,
                  text_col: str = "text", id_col: str = "doc_id",
                  min_hits: int = 1):
    """Flag corpus docs sharing >= ``min_hits`` distinct k-token shingles
    with ``benchmark_ds``.

    Returns a Dataset with ``(id_col, n_contaminated_grams, n_grams,
    contaminated)`` — one row per corpus doc; ``n_grams`` is the doc's
    DISTINCT shingle count, ``n_contaminated_grams`` how many of those
    appear anywhere in the benchmark, ``contaminated`` an int64 0/1 flag.

    In real use corpus and benchmark are different tables; when a query
    synthesizes both from one table it pays two (column-pruned) scans —
    acceptable because the benchmark side reads only ``text_col`` of a
    small filtered subset.
    """
    import ray

    from cutwed_ray.ops.dedup import _doc_shingle_sets

    store_ref = ray.put(collect_benchmark_shingles(
        benchmark_ds, k=k, text_col=text_col))

    def flag(t: pa.Table) -> pa.Table:
        store = ray.get(store_ref)          # zero-copy plasma view
        ids, vu, off = _doc_shingle_sets(t, text_col, id_col, k)
        v = vu.view(np.int64)
        pos = np.searchsorted(store, v)
        hit = np.zeros(v.shape[0], dtype=np.int64)
        if store.shape[0]:
            ok = pos < store.shape[0]
            hit[ok] = (store[pos[ok]] == v[ok]).astype(np.int64)
        S = np.zeros(v.shape[0] + 1, dtype=np.int64)
        np.cumsum(hit, out=S[1:])
        n_hits = S[off[1:]] - S[off[:-1]]
        n_grams = off[1:] - off[:-1]
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_contaminated_grams": pa.array(n_hits, pa.int64()),
            "n_grams": pa.array(n_grams, pa.int64()),
            "contaminated": pa.array((n_hits >= min_hits).astype(np.int64),
                                     pa.int64()),
        })

    return corpus_ds.map_batches(flag, batch_format="pyarrow")
