"""Distributed global ordered prefix-scan and sequence packing.

LLM pretraining pipelines concatenate documents in a fixed global order
and cut the token stream into fixed-budget training sequences ("packing").
Assigning each document to the sequence its first token lands in requires
the EXCLUSIVE global prefix sum of token counts in document order — a
classic distributed scan the reference engine (a pairwise-kernel library,
`src/cuTWED.h`) has no surface for, but which any replacement data
platform needs (SURVEY.md §2.6 engine-natives).

Ray-Data-first shape (three bounded executions, each streaming):

1. ``Min``/``Max`` of the order key (tiny aggregate — two scalars to the
   driver).
2. Per-RANGE-bucket value sums: each batch scatters into ``nb`` int64
   slots (``np.add.at``), a distributed groupby folds them, and the
   driver pulls ONE row per bucket (``nb`` tracks cluster CPUs via
   stages.cluster.coarse_buckets) and takes the exclusive prefix over
   buckets — O(nb) driver bytes, never the corpus.
3. The scan itself: shuffle by range bucket, one vectorized
   sort + cumsum per bucket, plus that bucket's broadcast offset.

Partitioning assumption (documented, same class as ops/joins.py): range
buckets are derived from the key's [min, max] span, so pathologically
skewed key DISTRIBUTIONS (dense cluster + far outlier) make uneven
buckets; dense surrogate ids — the common case for doc ids — bucket
evenly.  For skewed domains, substitute quantile bounds from
ops.agg.global_quantile_disc.

Feed this op a LIGHT projection (id + count), and ``materialize()`` it
first when it is derived by nontrivial compute (tokenization): the scan
executes its input three times.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _nn_i64(t: pa.Table, col: str) -> np.ndarray:
    c = t.column(col)
    if c.null_count:
        raise ValueError(f"prefix-scan column {col!r} has {c.null_count} "
                         "nulls; drop or route null rows explicitly")
    return c.to_numpy().astype(np.int64, copy=False)


def ordered_prefix_sum(ds, *, order_col: str, value_col: str,
                       cols: list[str], out_col: str = "cum_excl",
                       tiebreak: str | None = None):
    """Append the EXCLUSIVE prefix sum of ``value_col`` in global ascending
    ``(order_col[, tiebreak])`` order (``SUM(v) OVER (ORDER BY k ROWS
    BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)``, first row 0).

    The order must be unique — ``order_col`` alone, or the
    ``(order_col, tiebreak)`` pair when a tiebreak is given (duplicates
    would make the scan order-dependent; each bucket verifies and
    raises).  Range buckets are derived from ``order_col`` only, so equal
    primary keys always land in the SAME bucket and the tiebreak never
    crosses a bucket boundary.  ``value_col`` must be an exact integer
    unit per the repo's FP convention.
    """
    from ray.data.aggregate import Max, Min, Sum

    from cutwed_ray.stages.cluster import coarse_buckets

    stats = ds.aggregate(Min(order_col), Max(order_col))
    lo, hi = stats[f"min({order_col})"], stats[f"max({order_col})"]
    if lo is None:
        # Min()==None means EITHER an empty dataset OR rows whose
        # order_col is entirely null — the latter must surface the
        # null-rejection error, not an opaque length-mismatch append.
        def empty_or_raise(t: pa.Table) -> pa.Table:
            if t.num_rows:
                _nn_i64(t, order_col)    # raises the null-rejection error
            return t.select(cols).append_column(
                out_col, pa.array([], pa.int64()))

        return ds.map_batches(empty_or_raise, batch_format="pyarrow")
    nb = int(coarse_buckets())
    width = -((-(int(hi) - int(lo) + 1)) // nb)   # ceil(span/nb), no overflow

    def bucket_of(keys: np.ndarray) -> np.ndarray:
        return ((keys - lo) // width).astype(np.int32)

    def partial(t: pa.Table) -> pa.Table:
        k = _nn_i64(t, order_col)
        v = _nn_i64(t, value_col)
        s = np.zeros(nb, dtype=np.int64)
        np.add.at(s, bucket_of(k), v)
        nz = np.flatnonzero(s)
        return pa.table({"_b": pa.array(nz.astype(np.int32), pa.int32()),
                         "_s": pa.array(s[nz], pa.int64())})

    hist = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("_b").aggregate(Sum("_s", alias_name="_s"))
              .to_pandas())
    offs = np.zeros(nb, dtype=np.int64)
    offs[hist["_b"].to_numpy()] = hist["_s"].to_numpy().astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(offs)[:-1]))   # exclusive, per bucket

    def add_bkt(t: pa.Table) -> pa.Table:
        if tiebreak and t.column(tiebreak).null_count:
            raise ValueError(f"prefix-scan tiebreak column {tiebreak!r} "
                             "has nulls")
        return t.append_column(
            "_b", pa.array(bucket_of(_nn_i64(t, order_col)), pa.int32()))

    sort_cols = [order_col] + ([tiebreak] if tiebreak else [])

    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, kind="stable")
        dup = np.ones(0, dtype=bool)
        if len(g) > 1:
            dup = np.ones(len(g) - 1, dtype=bool)
            for c in sort_cols:
                k = g[c].to_numpy()
                dup &= k[1:] == k[:-1]
        if dup.any():
            raise ValueError(f"duplicate {sort_cols} keys; the global "
                             "scan order would be ambiguous")
        v = g[value_col].to_numpy().astype(np.int64)
        out = g[cols].reset_index(drop=True)
        out[out_col] = (np.cumsum(v) - v) + offs[int(g["_b"].iat[0])]
        return out

    return (ds.map_batches(add_bkt, batch_format="pyarrow")
              .groupby("_b").map_groups(scan_bucket, batch_format="pandas"))


def chunk_stats(ds, *, id_col: str, tokens_col: str, chunk_len: int,
                stride: int | None = None):
    """Sliding-window document chunking — the flat-map DUAL of
    :func:`pack_stats`: long documents split into ``chunk_len``-token
    windows starting every ``stride`` tokens (default = ``chunk_len``,
    i.e. disjoint), the standard long-context preprocessing step.

    Emits one row per (doc, chunk): ``(id_col, chunk_id, chunk_tokens)``
    where ``chunk_tokens = min(chunk_len, n_tokens - chunk_id*stride)``.
    Docs with 0 tokens emit nothing; otherwise a doc emits
    ``1 + max(0, ceil((n_tokens - chunk_len) / stride))`` chunks.

    Scale shape: a pure stateless ``map_batches`` expansion (np.repeat +
    arange arithmetic, no Python loop) — no shuffle, no state; output
    row count is corpus tokens / stride, which streams.
    """
    stride = int(stride or chunk_len)

    def expand(t: pa.Table) -> pa.Table:
        ids = _nn_i64(t, id_col)
        n = _nn_i64(t, tokens_col)
        extra = np.maximum(n - chunk_len, 0)
        n_chunks = np.where(n > 0, 1 + -(-extra // stride), 0)
        rep_ids = np.repeat(ids, n_chunks)
        total = int(n_chunks.sum())
        base = np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
        cid = np.arange(total, dtype=np.int64) - base
        toks = np.minimum(np.int64(chunk_len),
                          np.repeat(n, n_chunks) - cid * stride)
        return pa.table({
            id_col: pa.array(rep_ids, pa.int64()),
            "chunk_id": pa.array(cid, pa.int64()),
            "chunk_tokens": pa.array(toks, pa.int64()),
        })

    return ds.map_batches(expand, batch_format="pyarrow")


def global_rank(ds, *, order_col: str, tiebreak: str, cols: list[str],
                out_col: str = "rank"):
    """Append each row's 0-based GLOBAL rank in ascending
    ``(order_col, tiebreak)`` order — ``ROW_NUMBER() OVER (ORDER BY k, t)
    - 1`` without a global sort: ranking is the prefix scan of ones, so
    it inherits :func:`ordered_prefix_sum`'s shape (O(buckets) driver
    bytes, one vectorized pass per range bucket) instead of an
    all-to-all sort of the corpus.  The (order, tiebreak) pair must be
    unique.  Feed a LIGHT projection and materialize nontrivial upstream
    compute — the scan executes its input three times.
    """
    def ones(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_one", pa.array(np.ones(len(t), dtype=np.int64), pa.int64()))

    return ordered_prefix_sum(
        ds.map_batches(ones, batch_format="pyarrow"),
        order_col=order_col, value_col="_one", cols=cols,
        out_col=out_col, tiebreak=tiebreak)


def pack_stats(ds, *, order_col: str, tokens_col: str, budget: int,
               pack_col: str = "pack_id"):
    """Token-budget sequence packing over a (id, token-count) table:
    documents are concatenated in ascending ``order_col`` order and the
    stream is cut every ``budget`` tokens; each document's pack is the
    sequence its FIRST token lands in (``exclusive_cumsum // budget`` —
    the streaming concat-and-chunk semantics of LLM pretraining loaders).

    Returns one row per pack: ``(pack_id, n_docs, pack_tokens)`` — the
    shape a capacity planner / loader manifest consumes.  The per-doc
    assignment is the intermediate; callers wanting it can use
    :func:`ordered_prefix_sum` directly.
    """
    from ray.data.aggregate import Count, Sum

    scanned = ordered_prefix_sum(ds, order_col=order_col,
                                 value_col=tokens_col,
                                 cols=[order_col, tokens_col],
                                 out_col="_excl")

    def assign(t: pa.Table) -> pa.Table:
        excl = t.column("_excl").to_numpy().astype(np.int64)
        return pa.table({
            pack_col: pa.array(excl // np.int64(budget), pa.int64()),
            tokens_col: t.column(tokens_col),
        })

    agg = (scanned.map_batches(assign, batch_format="pyarrow")
                  .groupby(pack_col)
                  .aggregate(Count(alias_name="n_docs"),
                             Sum(tokens_col, alias_name="pack_tokens")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            pack_col: pa.array(t.column(pack_col).to_numpy()
                               .astype(np.int64), pa.int64()),
            "n_docs": pa.array(t.column("n_docs").to_numpy()
                               .astype(np.int64), pa.int64()),
            "pack_tokens": pa.array(t.column("pack_tokens").to_numpy()
                                    .astype(np.int64), pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")
