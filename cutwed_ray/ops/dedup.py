"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Design for scale (SURVEY.md §2.6): hashes are computed vectorized inside
``map_batches``; the only shuffles are groupbys on *small* derived keys
(hash64 / band / simhash chunk), never on raw text; candidate pairs are
verified vectorized before any transitive step.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cutwed_ray.stages.hashing import (
    hash_string_array,
    minhash_bands,
    shingle_hashes,
    splitmix64,
)
from cutwed_ray.stages.tokenize import tokenize_content


# --------------------------------------------------------------- exact dedup
def add_text_hash(batch: pa.Table, text_col: str = "text",
                  out_col: str = "text_hash") -> pa.Table:
    h = hash_string_array(batch.column(text_col))
    return batch.append_column(out_col, pa.array(h.view(np.int64), pa.int64()))


def _add_text_hash128(batch: pa.Table, text_col: str) -> pa.Table:
    """Append two independent 64-bit text hashes (h1, h2): a combined
    128-bit key whose collision probability (~2^-128) is negligible at any
    corpus size — 'exact' dedup stays exact without shuffling raw text."""
    col = batch.column(text_col)
    h1 = hash_string_array(col)
    h2 = hash_string_array(col, variant=1)
    out = batch.append_column("h1", pa.array(h1.view(np.int64), pa.int64()))
    return out.append_column("h2", pa.array(h2.view(np.int64), pa.int64()))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """One representative row (min id) per distinct text + duplicate count.

    Fully vectorized (no per-group callables): per-batch pandas combiner
    collapses duplicates early, then a global groupby on (h1, h2, text)
    with builtin Min/Sum aggregates.  The 128-bit hash leads the sort key
    so key comparisons are integer-first; text is in the key only to keep
    the semantics exact under (vanishingly unlikely) double-hash collisions
    — the shuffle volume equals the output size (distinct texts) either
    way, since text is an output column.
    Returns columns: text_col, id_col (min), n_dups.
    """
    from ray.data.aggregate import Min, Sum

    hashed = ds.map_batches(
        lambda t: _add_text_hash128(t, text_col), batch_format="pyarrow"
    )

    def combiner(t: pa.Table) -> pa.Table:
        # dropna=False: pandas' default silently drops a null-text group,
        # but SQL GROUP BY (and the old groupby('text_hash') path) keep it
        df = t.to_pandas().groupby(["h1", "h2", text_col], as_index=False,
                                   dropna=False).agg(
            _min_id=(id_col, "min"), _n=(id_col, "size"))
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    agg = (hashed.map_batches(combiner, batch_format="pyarrow")
                 .groupby(["h1", "h2", text_col])
                 .aggregate(Min("_min_id", alias_name=id_col),
                            Sum("_n", alias_name="n_dups")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            text_col: t.column(text_col),
            id_col: pa.array(t.column(id_col).to_numpy().astype(np.int64), pa.int64()),
            "n_dups": pa.array(t.column("n_dups").to_numpy().astype(np.int64), pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def exact_cluster(ds, text_col: str = "text", id_col: str = "doc_id",
                  num_partitions: int | None = None):
    """Label every row with cluster_id = min id over rows with identical text.

    Vectorized at scale: representatives (min id per distinct 128-bit text
    key) come from builtin aggregates over a per-batch combiner, then a
    distributed hash join labels every row — no per-distinct-text Python
    callables and no driver materialization.
    """
    from ray.data.aggregate import Min

    from cutwed_ray.stages.cluster import join_partitions

    num_partitions = num_partitions or join_partitions()

    keyed = ds.map_batches(
        lambda t: _add_text_hash128(t, text_col), batch_format="pyarrow"
    ).select_columns([id_col, "h1", "h2"])

    def combiner(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby(["h1", "h2"], as_index=False).agg(
            _m=(id_col, "min"))
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    reps = (keyed.map_batches(combiner, batch_format="pyarrow")
                 .groupby(["h1", "h2"])
                 .aggregate(Min("_m", alias_name="cluster_id")))

    labeled = keyed.join(reps, join_type="inner", num_partitions=num_partitions,
                         on=("h1", "h2"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t.column(id_col),
            "cluster_id": pa.array(
                t.column("cluster_id").to_numpy().astype(np.int64), pa.int64()),
        })

    return labeled.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------------------- MinHash + LSH
class MinHashStage:
    """Append MinHash band signatures over token shingles of ``text_col``."""

    def __init__(self, text_col: str = "text", k: int = 3,
                 n_perms: int = 16, n_bands: int = 8, seed: int = 0x5EED):
        self.text_col, self.k = text_col, k
        self.n_perms, self.n_bands, self.seed = n_perms, n_bands, seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        th, offsets = tokenize_content(batch.column(self.text_col), max_tokens=1 << 20)
        sh, sh_off = shingle_hashes(th, offsets, self.k)
        bands = minhash_bands(sh, sh_off, self.n_perms, self.n_bands, self.seed)
        out = batch
        for bi in range(self.n_bands):
            out = out.append_column(
                f"band_{bi}", pa.array(bands[:, bi].view(np.int64), pa.int64()))
        return out


def minhash_lsh_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                      k: int = 3, n_perms: int = 16, n_bands: int = 8,
                      verify_jaccard: float | None = None,
                      n_buckets: int | None = None):
    """Candidate near-duplicate pairs via MinHash-LSH banding.

    shingle -> minhash -> band -> COARSE-bucket groupby -> per-band-hash
    segment i<j pairs, deduplicated across bands by the first-collision
    rule (no second shuffle).  The shuffle key is ``band_hash %
    n_buckets``, not the band hash itself: one vectorized call handles all
    the band buckets of a coarse group (a per-band-bucket ``map_groups``
    fires one Python call per distinct band hash — millions of
    micro-groups at corpus scale).  With ``verify_jaccard`` set,
    candidates are verified with exact shingle-set Jaccard and filtered.
    Returns (id_a, id_b[, jaccard]).
    """
    import pandas as pd

    from cutwed_ray.stages.cluster import coarse_buckets
    from cutwed_ray.stages.pairgen import _pairs_within_segments

    n_buckets = n_buckets or coarse_buckets()
    sigs = ds.map_batches(MinHashStage(text_col, k, n_perms, n_bands),
                          batch_format="pyarrow")
    band_cols = [f"band_{i}" for i in range(n_bands)]

    def explode(t: pa.Table) -> pa.Table:
        n = len(t)
        idx = np.repeat(np.arange(n, dtype=np.int64), n_bands)
        bands_m = np.stack([t.column(c).to_numpy() for c in band_cols], axis=1)
        keys = splitmix64(
            bands_m.view(np.uint64)
            ^ (np.arange(n_bands, dtype=np.uint64)[None, :] + np.uint64(0xB00))
        ).reshape(-1)
        cols = {
            "cbkt": pa.array((keys % np.uint64(n_buckets)).astype(np.int32),
                             pa.int32()),
            "bkey": pa.array(keys.view(np.int64), pa.int64()),
            "band_id": pa.array(np.tile(np.arange(n_bands, dtype=np.int8), n), pa.int8()),
            id_col: t.column(id_col).take(pa.array(idx)),
        }
        if verify_jaccard is not None:
            cols[text_col] = t.column(text_col).take(pa.array(idx))
        for c in band_cols:
            cols[c] = t.column(c).take(pa.array(idx))
        return pa.table(cols)

    exploded = sigs.map_batches(explode, batch_format="pyarrow")

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                              "id_b": pd.Series(dtype=np.int64)})
        if verify_jaccard is not None:
            empty["jaccard"] = pd.Series(dtype=np.float64)
        if len(g) < 2:
            return empty
        bkeys = g["bkey"].to_numpy()
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, bkeys))
        bk_s = bkeys[order]
        seg_new = np.r_[True, bk_s[1:] != bk_s[:-1]]
        sizes = np.diff(np.r_[np.nonzero(seg_new)[0], bk_s.shape[0]])
        ia, ib = _pairs_within_segments(sizes)
        if ia.size == 0:
            return empty
        ids_s = ids[order]
        band_id_s = g["band_id"].to_numpy()[order]
        bands_m = np.stack([g[c].to_numpy() for c in band_cols], axis=1)[order]
        eq = bands_m[ia] == bands_m[ib]
        keep = eq.argmax(axis=1) == band_id_s[ia]
        ia, ib = ia[keep], ib[keep]
        if ia.size == 0:
            return empty
        a, b = ids_s[ia], ids_s[ib]
        swap = a > b
        out = pd.DataFrame({"id_a": np.where(swap, b, a),
                            "id_b": np.where(swap, a, b)})
        if verify_jaccard is not None:
            texts_s = g[text_col].to_numpy()[order]
            uniq = np.unique(np.r_[ia, ib])
            th, off = tokenize_content(
                pa.array(texts_s[uniq].tolist(), pa.string()), 1 << 20)
            sh, sh_off = shingle_hashes(th, off, k)
            # per-doc sorted unique sets + one vectorized sort-merge
            # intersection pass over all candidate pairs (no per-pair loop)
            uvals, uoff = _unique_per_doc(sh, sh_off)
            ulens = uoff[1:] - uoff[:-1]
            la = np.searchsorted(uniq, ia)
            lb = np.searchsorted(uniq, ib)
            inter, _ = _pair_intersections(la, lb, uoff[:-1], ulens, uvals)
            union = ulens[la] + ulens[lb] - inter
            out["jaccard"] = inter / np.maximum(union, 1)
            out = out[out.jaccard >= verify_jaccard]
        return out

    return exploded.groupby("cbkt").map_groups(pairs_of_bucket,
                                               batch_format="pandas")


# ------------------------------------------------- vectorized set intersect
def _pair_intersections(pa_i: np.ndarray, pb_i: np.ndarray,
                        starts: np.ndarray, lens: np.ndarray,
                        vals: np.ndarray,
                        max_rows: int = 1 << 22):
    """Per-pair sorted-set intersection sizes + min common element,
    vectorized (no per-pair Python loop).

    Sets are slices ``vals[starts[d]: starts[d]+lens[d]]`` of a flat array
    of per-doc SORTED UNIQUE values; pairs are (pa_i[x], pb_i[x]) doc
    indices.  One global lexsort over all (pair, value) rows finds
    duplicates (a value common to both sides of a pair appears exactly
    twice adjacently), so intersection counts fall out of one bincount and
    the min common value out of the first duplicate per pair.  Work is
    sliced to <= ``max_rows`` expanded rows per lexsort — giant sort
    temporaries in a cold worker cost more than the extra passes
    (measured: page-fault bound beyond ~100 MB).

    Returns (inter (P,) int64, min_common (P,) uint64 — 2^64-1 when the
    intersection is empty).
    """
    from cutwed_ray.stages.hashing import _ranges

    P = pa_i.shape[0]
    inter = np.zeros(P, dtype=np.int64)
    min_common = np.full(P, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    if P == 0:
        return inter, min_common
    la = lens[pa_i]
    lb = lens[pb_i]
    rows = la + lb
    # slice boundaries on cumulative expanded rows
    cum = np.cumsum(rows)
    lo = 0
    while lo < P:
        base = cum[lo - 1] if lo else 0
        hi = int(np.searchsorted(cum, base + max_rows, side="left")) + 1
        hi = max(hi, lo + 1)
        hi = min(hi, P)
        s = slice(lo, hi)
        pidx = np.arange(hi - lo, dtype=np.int64)
        # _ranges assumes all counts >= 1 — drop empty sets first
        nza, nzb = la[s] > 0, lb[s] > 0
        va = vals[_ranges(starts[pa_i[s]][nza], la[s][nza])]
        vb = vals[_ranges(starts[pb_i[s]][nzb], lb[s][nzb])]
        p = np.r_[np.repeat(pidx[nza], la[s][nza]),
                  np.repeat(pidx[nzb], lb[s][nzb])]
        v = np.r_[va, vb]
        order = np.lexsort((v, p))
        p_s, v_s = p[order], v[order]
        dup = (p_s[1:] == p_s[:-1]) & (v_s[1:] == v_s[:-1])
        if dup.any():
            p_c = p_s[:-1][dup]
            inter[s] += np.bincount(p_c, minlength=hi - lo)
            # rows are sorted by (pair, value): the first duplicate per
            # pair carries the pair's minimum common value
            u, first = np.unique(p_c, return_index=True)
            min_common[lo + u] = v_s[:-1][dup][first]
        lo = hi
    return inter, min_common


def _unique_per_doc(vals: np.ndarray, offsets: np.ndarray):
    """Flat per-doc value lists -> per-doc SORTED UNIQUE flat lists.
    Returns (uvals, uoff) with uoff of len n_docs+1.  Fully vectorized
    (one global lexsort + adjacent-dedup)."""
    n = offsets.shape[0] - 1
    doc_of = np.repeat(np.arange(n, dtype=np.int64), offsets[1:] - offsets[:-1])
    order = np.lexsort((vals, doc_of))
    d_s, v_s = doc_of[order], vals[order]
    keep = np.ones(d_s.size, dtype=bool)
    keep[1:] = (d_s[1:] != d_s[:-1]) | (v_s[1:] != v_s[:-1])
    du, vu = d_s[keep], v_s[keep]
    counts = np.bincount(du, minlength=n)
    uoff = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=uoff[1:])
    return vu, uoff


# ----------------------------------------------------------- n-gram Jaccard
#: strategy actually used by the last ``ngram_jaccard_pairs`` call on this
#: driver ("exact" | "minhash_lsh_fallback") — budget-fallback observability
LAST_NGRAM_STRATEGY: str | None = None


def _doc_shingle_sets(batch: pa.Table, text_col: str, id_col: str, k: int):
    """Per-doc UNIQUE k-token shingle hashes: (ids, flat uniq hashes, offsets)."""
    th, offsets = tokenize_content(batch.column(text_col), max_tokens=1 << 20)
    sh, sh_off = shingle_hashes(th, offsets, k)
    n = len(batch)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), sh_off[1:] - sh_off[:-1])
    order = np.lexsort((sh, doc_of))
    d_s, v_s = doc_of[order], sh[order]
    keep = np.ones(d_s.size, dtype=bool)
    keep[1:] = (d_s[1:] != d_s[:-1]) | (v_s[1:] != v_s[:-1])
    du, vu = d_s[keep], v_s[keep]
    counts = np.bincount(du, minlength=n)
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=off[1:])
    ids = batch.column(id_col).to_numpy().astype(np.int64)
    return ids, vu, off


def ngram_jaccard_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                        k: int = 3, threshold: float = 0.5,
                        n_buckets: int | None = None,
                        max_doc_freq: int | None = None,
                        store_max_bytes: int | None = None):
    """EXACT n-gram (k-token shingle) Jaccard near-dup pairs >= threshold.

    Complete (no LSH recall loss): any pair with Jaccard > 0 shares a
    shingle, so an inverted-index self-join over shingle hashes generates
    every qualifying candidate.  Scale shape:

    * candidates: (shingle, doc) rows grouped by a COARSE shingle bucket
      (vectorized segment pairing inside ~n_buckets groups — no
      per-shingle micro-groups), pre-deduplicated per bucket to unique
      (id_a, id_b) rows carrying their common-shingle COUNT;
    * the inverted index emits exactly one candidate row per common
      shingle, so ``sum(n_common)`` over buckets IS the exact intersection
      size — a light two-key ``groupby.aggregate`` replaces per-pair set
      intersections entirely (the round-2 design re-intersected the full
      sets once per COMMON SHINGLE: quadratic in similarity, measured 490
      core-s on the sf0.1 bench vs ~2 s for this counting scheme);
    * finish: union = |A| + |B| - inter needs only per-doc SET SIZES — a
      16-byte/doc broadcast (ids + lens), ~500x smaller than the full
      shingle store the round-2 path shipped.

    Returns (id_a, id_b, jaccard float64 rounded to 8).  Semantics mirror
    the DuckDB oracle in pipelines/queries.py: tokens = whitespace runs,
    shingles = distinct k-grams, docs with < k tokens contribute ONE
    order-insensitive whole-doc shingle.

    The broadcast store is BYTE-BUDGETED (``store_max_bytes``, default 25%
    of the object store; the guarded object is the lens store in exact
    mode, the full shingle store in ``max_doc_freq`` mode): beyond the
    budget this call falls back to
    ``minhash_lsh_pairs(verify_jaccard=threshold)`` — banded LSH whose
    verify runs inside bucket groups with no global store, the any-scale
    path (approximate: banding can miss pairs, so the fallback is
    observable via ``LAST_NGRAM_STRATEGY``).

    ``max_doc_freq`` is the hot-shingle guard for corpus scale: shingle
    segments with more than this many documents generate no candidates
    (a df-D stop-shingle contributes O(D^2) pairs).  Capping trades
    recall — a pair is lost only if EVERY shared shingle is hot — and is
    NEVER silent: capped candidates are counted in the ``n_dropped_hot``
    column riding on the output (sum it for the pipeline-wide bound).
    Default None = exact (the oracle-comparable mode).
    """
    import pandas as pd
    import ray

    from cutwed_ray.stages.cluster import coarse_buckets
    from cutwed_ray.stages.hashing import _ranges

    n_buckets = n_buckets or coarse_buckets()

    # ---- broadcast store of per-doc sorted unique shingle sets ----
    def shingle_tbl(t: pa.Table) -> pa.Table:
        ids, vu, off = _doc_shingle_sets(t, text_col, id_col, k)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "sh": pa.ListArray.from_arrays(
                pa.array(off, pa.int32()), pa.array(vu.view(np.int64), pa.int64())),
        })

    shingled = ds.map_batches(shingle_tbl, batch_format="pyarrow").materialize()

    # byte-budget guard (mirrors entity_resolution._store_budget_bytes):
    # what gets broadcast is the 16-byte/doc lens store in exact mode, the
    # full per-doc shingle-set store in max_doc_freq mode — beyond the
    # budget, fall back to banded LSH with in-bucket verification
    global LAST_NGRAM_STRATEGY
    if store_max_bytes is None:
        mem = ray.cluster_resources().get("object_store_memory", 4 << 30) \
            if ray.is_initialized() else 4 << 30
        store_max_bytes = int(mem * 0.25)
    need_full_store = max_doc_freq is not None
    broadcast_bytes = (shingled.size_bytes() if need_full_store
                       else 16 * shingled.count())
    if broadcast_bytes > store_max_bytes:
        LAST_NGRAM_STRATEGY = "minhash_lsh_fallback"
        return minhash_lsh_pairs(ds, text_col=text_col, id_col=id_col, k=k,
                                 n_perms=16, n_bands=8,
                                 verify_jaccard=threshold,
                                 n_buckets=n_buckets)
    LAST_NGRAM_STRATEGY = "exact"

    def _build(with_vals, *tables):
        ids_l, vals_l, lens_l = [], [], []
        for t in tables:
            if t.num_rows == 0:
                continue
            col = t.column("sh")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            ids_l.append(t.column(id_col).to_numpy())
            off = np.asarray(col.offsets, dtype=np.int64)
            lens_l.append(off[1:] - off[:-1])
            if with_vals:
                vals_l.append(np.asarray(col.values, dtype=np.int64))
        if not ids_l:
            return {"ids": np.zeros(0, np.int64), "starts": np.zeros(0, np.int64),
                    "lens": np.zeros(0, np.int64), "vals": np.zeros(0, np.uint64)}
        ids = np.concatenate(ids_l)
        lens = np.concatenate(lens_l)
        starts = np.zeros(ids.shape[0], dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        order = np.argsort(ids, kind="stable")
        out = {"ids": ids[order], "starts": starts[order], "lens": lens[order]}
        if with_vals:
            out["vals"] = np.concatenate(vals_l).view(np.uint64)
        return out

    builder = ray.remote(num_cpus=1)(_build)
    store_ref = builder.remote(need_full_store, *shingled.to_arrow_refs())

    # ---- inverted-index candidates, coarse-bucketed ----
    def explode(t: pa.Table) -> pa.Table:
        col = t.column("sh")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        off = np.asarray(col.offsets, dtype=np.int64)
        vals = np.asarray(col.values, dtype=np.int64).view(np.uint64)
        lens = off[1:] - off[:-1]
        doc_ids = np.repeat(t.column(id_col).to_numpy(), lens)
        return pa.table({
            "bkt": pa.array((vals % np.uint64(n_buckets)).astype(np.int32), pa.int32()),
            "shingle": pa.array(vals.view(np.int64), pa.int64()),
            id_col: pa.array(doc_ids, pa.int64()),
        })

    exploded = shingled.map_batches(explode, batch_format="pyarrow")

    def gen_pairs(g: pd.DataFrame) -> pd.DataFrame:
        from cutwed_ray.stages.pairgen import _pairs_within_segments

        sh = g["shingle"].to_numpy()
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, sh))
        sh_s, ids_s = sh[order], ids[order]
        seg_new = np.r_[True, sh_s[1:] != sh_s[:-1]]
        sizes = np.diff(np.r_[np.nonzero(seg_new)[0], sh_s.shape[0]])
        n_dropped = 0
        if max_doc_freq is not None:
            hot = sizes > max_doc_freq
            if hot.any():
                n_dropped = int((sizes[hot].astype(np.int64)
                                 * (sizes[hot] - 1) // 2).sum())
                keep_rows = ~np.repeat(hot, sizes)
                sh_s, ids_s = sh_s[keep_rows], ids_s[keep_rows]
                sizes = sizes[~hot]
        ia, ib = _pairs_within_segments(sizes)
        if ia.size == 0:
            out = pd.DataFrame({"pbkt": pd.Series(dtype=np.int32),
                                "id_a": pd.Series(dtype=np.int64),
                                "id_b": pd.Series(dtype=np.int64),
                                "n_common": pd.Series(dtype=np.int64)})
        else:
            a, b = ids_s[ia], ids_s[ib]
            swap = a > b
            a, b = np.where(swap, b, a), np.where(swap, a, b)
            # within-bucket pair dedup: one row per unique (a, b) with its
            # common-shingle count — the shuffle moves unique pairs, not
            # one row per shared shingle
            order2 = np.lexsort((b, a))
            a_s2, b_s2 = a[order2], b[order2]
            new = np.r_[True, (a_s2[1:] != a_s2[:-1]) | (b_s2[1:] != b_s2[:-1])]
            idx = np.flatnonzero(new)
            counts = np.diff(np.r_[idx, a_s2.shape[0]])
            ua, ub = a_s2[idx], b_s2[idx]
            pbkt = (splitmix64(ua.view(np.uint64)
                               ^ splitmix64(ub.view(np.uint64)))
                    % np.uint64(n_buckets)).astype(np.int32)
            out = pd.DataFrame({"pbkt": pbkt, "id_a": ua, "id_b": ub,
                                "n_common": counts.astype(np.int64)})
        if max_doc_freq is not None:
            drop_col = np.zeros(max(len(out), 1), dtype=np.int64)
            drop_col[0] = n_dropped
            if len(out) == 0 and n_dropped:
                # counter-carrier row so the drop count is never lost
                out = pd.DataFrame({"pbkt": [np.int32(0)],
                                    "id_a": [np.int64(-1)],
                                    "id_b": [np.int64(-1)],
                                    "n_common": [np.int64(0)]})
            if len(out):
                out["n_dropped_hot"] = drop_col[: len(out)]
            else:
                out["n_dropped_hot"] = pd.Series(dtype=np.int64)
        return out

    cand = exploded.groupby("bkt").map_groups(gen_pairs, batch_format="pandas")

    # ---- cross-bucket merge + finish, COARSE-bucketed on a pair hash:
    # unique pairs are ~corpus-scale micro-groups, so a builtin two-key
    # aggregate would fire one reduce per pair (measured 275 s on the
    # sf0.1 bench vs ~1 s for this segment-sum); instead each of
    # ~n_buckets groups merges all its pairs in one vectorized pass ----
    def merge_finish(g: "pd.DataFrame") -> "pd.DataFrame":
        empty_cols = {"id_a": pd.Series(dtype=np.int64),
                      "id_b": pd.Series(dtype=np.int64),
                      "jaccard": pd.Series(dtype=np.float64)}
        if max_doc_freq is not None:
            empty_cols["n_dropped_hot"] = pd.Series(dtype=np.int64)
        a = g["id_a"].to_numpy()
        b = g["id_b"].to_numpy()
        nc = g["n_common"].to_numpy()
        real = a >= 0                          # -1 rows are counter carriers
        ra, rb, rn = a[real], b[real], nc[real]
        # segment-sum per unique pair: counts from different shingle
        # buckets add up to the EXACT intersection size
        order = np.lexsort((rb, ra))
        a_s, b_s, n_s = ra[order], rb[order], rn[order]
        new = np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])]
        idx = np.flatnonzero(new)
        if idx.size:
            inter = np.add.reduceat(n_s, idx)
            ua, ub = a_s[idx], b_s[idx]
            store = ray.get(store_ref)
            ids, lens = store["ids"], store["lens"]
            pa_i = np.searchsorted(ids, ua)
            pb_i = np.searchsorted(ids, ub)
            if max_doc_freq is not None:
                # under the hot cap the summed counts miss hot shingles —
                # surviving pairs' jaccard must still be EXACT, so
                # re-intersect once per unique pair against the full store
                inter, _ = _pair_intersections(pa_i, pb_i, store["starts"],
                                               lens, store["vals"])
            union = lens[pa_i] + lens[pb_i] - inter
            jac = inter / np.maximum(union, 1)
            keep = jac >= threshold
            out = pd.DataFrame({"id_a": ua[keep], "id_b": ub[keep],
                                "jaccard": np.round(jac[keep], 8)})
        else:
            out = pd.DataFrame({k: v for k, v in empty_cols.items()
                                if k != "n_dropped_hot"})
        if max_doc_freq is not None:
            # carry this bucket's hot-drop count; a -1/-1 carrier row keeps
            # it even when no pair survives (Sum('n_dropped_hot') is exact)
            total = int(g["n_dropped_hot"].to_numpy().sum())
            if len(out) == 0 and total:
                out = pd.DataFrame({"id_a": [np.int64(-1)],
                                    "id_b": [np.int64(-1)],
                                    "jaccard": [0.0]})
            dc = np.zeros(max(len(out), 1), dtype=np.int64)
            dc[0] = total
            out["n_dropped_hot"] = dc[: len(out)] if len(out) else \
                pd.Series(dtype=np.int64)
        return out

    return cand.groupby("pbkt").map_groups(merge_finish, batch_format="pandas")


# ------------------------------------------------------------------- SimHash
def add_simhash(batch: pa.Table, text_col: str = "text",
                out_col: str = "simhash") -> pa.Table:
    """64-bit SimHash over token hashes (vectorized bit-count accumulation)."""
    th, offsets = tokenize_content(batch.column(text_col), max_tokens=1 << 20)
    n_docs = len(batch)
    # bits matrix (T, 64) in {0,1} -> per-doc sums via reduceat
    out = np.zeros(n_docs, dtype=np.uint64)
    if th.shape[0]:
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int32)
        lens = offsets[1:] - offsets[:-1]
        nonempty = lens > 0
        starts = offsets[:-1][nonempty]
        sums = np.add.reduceat(bits, starts, axis=0) if starts.size else np.zeros((0, 64), np.int32)
        majority = (2 * sums) >= lens[nonempty][:, None]
        vals = (majority.astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64)
        out[nonempty] = vals
    return batch.append_column(out_col, pa.array(out.view(np.int64), pa.int64()))


def simhash_near_dup_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                           max_hamming: int = 3, n_buckets: int | None = None):
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.

    Banding: 4 x 16-bit chunks — any pair within Hamming 3 shares at least
    one exact chunk (pigeonhole).  Like minhash, the shuffle key is a
    COARSE bucket of the chunk hash (``ckey % n_buckets``): one vectorized
    call per coarse group covers all its chunk buckets as segments instead
    of one Python call per distinct chunk value.
    Returns (id_a, id_b, hamming).
    """
    import pandas as pd

    from cutwed_ray.stages.cluster import coarse_buckets
    from cutwed_ray.stages.pairgen import _pairs_within_segments

    n_buckets = n_buckets or coarse_buckets()
    hashed = ds.map_batches(lambda t: add_simhash(t, text_col), batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        n = len(t)
        sh = t.column("simhash").to_numpy().view(np.uint64)
        idx = np.repeat(np.arange(n, dtype=np.int64), 4)
        chunk_id = np.tile(np.arange(4, dtype=np.uint64), n)
        chunks = (sh[:, None] >> (np.arange(4, dtype=np.uint64) * np.uint64(16))[None, :]) & np.uint64(0xFFFF)
        key = splitmix64(chunks.reshape(-1) ^ ((chunk_id + np.uint64(1)) << np.uint64(32)))
        return pa.table({
            "cbkt": pa.array((key % np.uint64(n_buckets)).astype(np.int32), pa.int32()),
            "ckey": pa.array(key.view(np.int64), pa.int64()),
            "chunk_id": pa.array(np.tile(np.arange(4, dtype=np.int8), n), pa.int8()),
            id_col: t.column(id_col).take(pa.array(idx)),
            "simhash": t.column("simhash").take(pa.array(idx)),
        })

    exploded = hashed.map_batches(explode, batch_format="pyarrow")

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                              "id_b": pd.Series(dtype=np.int64),
                              "hamming": pd.Series(dtype=np.int64)})
        if len(g) < 2:
            return empty
        ckeys = g["ckey"].to_numpy()
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, ckeys))
        ck_s = ckeys[order]
        seg_new = np.r_[True, ck_s[1:] != ck_s[:-1]]
        sizes = np.diff(np.r_[np.nonzero(seg_new)[0], ck_s.shape[0]])
        ia, ib = _pairs_within_segments(sizes)
        if ia.size == 0:
            return empty
        ids_s = ids[order]
        sh_s = g["simhash"].to_numpy()[order].view(np.uint64)
        chunk_id_s = g["chunk_id"].to_numpy()[order]
        x = sh_s[ia] ^ sh_s[ib]
        ham = np.zeros(ia.shape[0], dtype=np.int64)
        v = x.copy()
        for _ in range(64):
            ham += (v & np.uint64(1)).astype(np.int64)
            v >>= np.uint64(1)
        keep = ham <= max_hamming
        if not keep.any():
            return empty
        # first-collision dedup: the pair survives only in its first
        # shared chunk's bucket
        chunks = (sh_s[:, None] >> (np.arange(4, dtype=np.uint64) * np.uint64(16))[None, :]) & np.uint64(0xFFFF)
        eq = chunks[ia[keep]] == chunks[ib[keep]]
        keep2 = eq.argmax(axis=1) == chunk_id_s[ia[keep]]
        ia, ib, ham = ia[keep][keep2], ib[keep][keep2], ham[keep][keep2]
        a, b = ids_s[ia], ids_s[ib]
        swap = a > b
        return pd.DataFrame({"id_a": np.where(swap, b, a),
                             "id_b": np.where(swap, a, b), "hamming": ham})

    return exploded.groupby("cbkt").map_groups(pairs_of_bucket,
                                               batch_format="pandas")


# --------------------------------------------------- embedding-cosine dedup
def embedding_near_dup_pairs(ds, id_col: str = "vec_id",
                             emb_col: str = "embedding",
                             threshold: float = 0.95,
                             n_planes: int = 12, seed: int = 7,
                             exhaustive: bool = False,
                             n_buckets: int | None = None):
    """Near-duplicate pairs by embedding cosine similarity >= threshold.

    Scale path (default): random-hyperplane LSH — rows sharing a sign
    bucket are candidates; cosine verified exactly per bucket (numpy
    matmul).  ``exhaustive=True`` skips bucketing (single bucket; only for
    small/test data or the DuckDB oracle comparison).
    Returns (id_a, id_b, cosine float64).
    """
    import pandas as pd

    from cutwed_ray.stages.cluster import coarse_buckets

    n_buckets = n_buckets or coarse_buckets()

    def bucketize(t: pa.Table) -> pa.Table:
        emb = np.asarray(t.column(emb_col).combine_chunks().values.to_numpy(
            zero_copy_only=False)).reshape(len(t), -1).astype(np.float64)
        if exhaustive:
            key = np.zeros(len(t), dtype=np.int64)
        else:
            rng = np.random.RandomState(seed)
            planes = rng.randn(emb.shape[1], n_planes)
            signs = (emb @ planes) > 0
            key = np.zeros(len(t), dtype=np.uint64)
            for i in range(n_planes):
                key = (key << np.uint64(1)) | signs[:, i].astype(np.uint64)
            key = key.view(np.int64)
        norm = np.linalg.norm(emb, axis=1)
        unit = emb / np.maximum(norm, 1e-30)[:, None]
        return pa.table({
            "coarse_key": pa.array(
                (key.view(np.uint64) % np.uint64(n_buckets)).astype(np.int32),
                pa.int32()),
            "bucket_key": pa.array(key, pa.int64()),
            id_col: t.column(id_col),
            # flat-buffer ListArray construction (a per-row
            # pa.array(list(unit)) pays one Python object per row)
            "unit": pa.ListArray.from_arrays(
                pa.array(np.arange(0, unit.size + 1, unit.shape[1] or 1,
                                   dtype=np.int32)[: len(t) + 1], pa.int32()),
                pa.array(unit.reshape(-1), pa.float64())),
        })

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")

    def pairs_of_coarse(g: pd.DataFrame) -> pd.DataFrame:
        """All sign-buckets of one coarse group in a single call: sort by
        bucket_key, then one matmul per >=2-row segment (no per-sign-bucket
        micro-groups — a 12-plane LSH has up to 4096 buckets and a larger
        corpus wants more planes)."""
        empty = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                              "id_b": pd.Series(dtype=np.int64),
                              "cosine": pd.Series(dtype=np.float64)})
        if len(g) < 2:
            return empty
        keys = g["bucket_key"].to_numpy()
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, keys))
        k_s = keys[order]
        ids_s = ids[order]
        U = np.stack(g["unit"].to_numpy())[order]
        seg_start = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]])
        seg_end = np.r_[seg_start[1:], k_s.shape[0]]
        out_a, out_b, out_c = [], [], []
        for s, e in zip(seg_start, seg_end):
            m = e - s
            if m < 2:
                continue
            sim = U[s:e] @ U[s:e].T
            ia, ib = np.triu_indices(m, k=1)
            keep = sim[ia, ib] >= threshold
            if not keep.any():
                continue
            ia, ib = ia[keep], ib[keep]
            a, b = ids_s[s + ia], ids_s[s + ib]
            swap = a > b
            out_a.append(np.where(swap, b, a))
            out_b.append(np.where(swap, a, b))
            out_c.append(sim[ia, ib])
        if not out_a:
            return empty
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "cosine": np.concatenate(out_c)})

    return bucketed.groupby("coarse_key").map_groups(pairs_of_coarse,
                                                     batch_format="pandas")


def dup_clusters(ds, pairs, *, id_col: str = "doc_id",
                 max_driver_edges: int = 5_000_000):
    """Transitive near-dup CLUSTERS from a pair table — the step that
    turns any of this module's pair generators into the actual dedup
    ACTION: every doc labeled with its component's min id, and
    ``is_canonical`` marking the one representative to KEEP per cluster
    (singletons keep themselves).

    Scale shape (the ER pipeline's edge-collection argument,
    pipelines/entity_resolution.py): near-dup pair sets are sparse —
    orders of magnitude smaller than the corpus — so the edge list is
    pulled to the driver (guarded by ``max_driver_edges``; past that,
    route through the ER pipeline's distributed label propagation),
    components resolve with the vectorized hash-to-min pointer-jumping
    kernel (stages/cluster.py), and the LABELING of the corpus is a
    streaming broadcast map — the corpus itself never materializes.

    Returns ``(id_col, dup_cluster_id, is_canonical)``, all int64.

    Past ``max_driver_edges`` the routing is AUTOMATIC: the edge Dataset
    goes through the distributed hash-to-min label propagation
    (``stages/cluster.py::label_propagation`` — the ER pipeline's scale
    path) and labeling becomes a distributed left-outer join; both paths
    produce identical min-id component labels
    (``tests/test_ops.py::test_dup_clusters_distributed_path_bit_equal``).
    """
    import ray

    from cutwed_ray.stages.cluster import connected_components_arrays

    edges = pairs.select_columns(["id_a", "id_b"]).materialize()
    if edges.count() > max_driver_edges:
        # distributed path: no edge materialization on the driver
        from cutwed_ray.stages.cluster import (assign_clusters_ds,
                                               label_propagation)

        labels_ds = label_propagation(edges)
        labeled = assign_clusters_ds(ds.select_columns([id_col]), labels_ds,
                                     id_col=id_col)

        def finish(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy().astype(np.int64)
            lab = t.column("cluster_id").to_numpy().astype(np.int64)
            return pa.table({
                id_col: pa.array(ids, pa.int64()),
                "dup_cluster_id": pa.array(lab, pa.int64()),
                "is_canonical": pa.array((lab == ids).astype(np.int64),
                                         pa.int64()),
            })

        return labeled.map_batches(finish, batch_format="pyarrow")

    # driver path: sparse edges pulled once, vectorized hash-to-min
    # pointer jumping; the label map ships as ONE plasma object of two
    # sorted int64 arrays probed with searchsorted (not a closure dict —
    # cloudpickle would copy a dict into every task's closure).
    eb = [b for b in edges.iter_batches(batch_format="pyarrow",
                                        batch_size=None)]
    a = (np.concatenate([b.column("id_a").to_numpy() for b in eb])
         .astype(np.int64) if eb else np.empty(0, np.int64))
    b_ = (np.concatenate([b.column("id_b").to_numpy() for b in eb])
          .astype(np.int64) if eb else np.empty(0, np.int64))
    labels = connected_components_arrays(a, b_)
    keys = np.fromiter(labels.keys(), dtype=np.int64, count=len(labels))
    vals = np.fromiter(labels.values(), dtype=np.int64, count=len(labels))
    order = np.argsort(keys, kind="stable")
    map_ref = ray.put((keys[order], vals[order]))

    def label(t: pa.Table) -> pa.Table:
        k, v = ray.get(map_ref)
        ids = t.column(id_col).to_numpy().astype(np.int64)
        lab = ids.copy()
        if k.shape[0]:
            pos = np.minimum(np.searchsorted(k, ids), k.shape[0] - 1)
            hit = k[pos] == ids
            lab[hit] = v[pos[hit]]
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "dup_cluster_id": pa.array(lab, pa.int64()),
            "is_canonical": pa.array((lab == ids).astype(np.int64),
                                     pa.int64()),
        })

    return ds.map_batches(label, batch_format="pyarrow")
