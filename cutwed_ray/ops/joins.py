"""Distributed as-of (point-in-time) join — engine-native operator.

For each left row ``(key, t)``, find the single right row with the same
key and the greatest ``t_r <= t`` (ties on ``t_r`` broken by the highest
tie column, e.g. the right id).  This is the point-in-time-correctness
primitive of feature/training pipelines ("the most recent order /
feature value / model score at event time") that a plain equi-join
cannot express; the reference has no analogue (its operators are dense
pairwise kernels), so this follows the repo's engine-native pattern
(SURVEY.md §2.6).

Scale shape (the partitioning assumption, per the custom-operator
contract):

* both sides are reduced to LIGHT rows (key, time, tie, payload) at the
  read — no full-width rows ride the shuffle;
* the shuffle key is a COARSE hash bucket of the join key
  (``stages.cluster.coarse_buckets`` — tracks cluster CPUs, not corpus
  rows), so each ``map_groups`` call handles ~1/NB of all keys in ONE
  vectorized numpy pass (lexsort + forward-fill) — no per-key
  micro-groups, no driver materialization, no sort barrier on the whole
  table;
* a key's rows must fit one group: worst-case group cost is
  O(rows/NB · log) — hot keys cost one bucket, the documented limit
  shared with every coarse-bucket op in this repo.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _as_int64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Key/time column -> int64 numpy (timestamps become epoch micros).

    Nulls are REJECTED, not coerced: ``to_numpy(zero_copy_only=False)`` on
    an int column with nulls yields float NaN, and ``astype(int64)`` on NaN
    is undefined garbage — a silent wrong-join, the worst failure mode for
    a public engine primitive.  Callers must drop / route null-key rows
    explicitly before the join."""
    if col.null_count:
        raise ValueError(
            f"asof/range join key/time/value column has {col.null_count} "
            "nulls; drop or route null rows explicitly before joining")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype.kind == "M":          # datetime64[us] from timestamp[us]
        return arr.astype("datetime64[us]").view(np.int64)
    return arr.astype(np.int64)


def asof_merge_indices(k: np.ndarray, tt: np.ndarray, isl: np.ndarray,
                       tie: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pure core of the as-of merge: given parallel arrays (key, time,
    is_left 0/1, tie — tie is only read for right rows), return
    ``(left_idx, right_idx)`` pairs of ORIGINAL row positions matching
    each left row to its latest same-key right row with
    ``t_r <= t_l`` (equal-time ties to the highest tie value).  Lefts
    with no prior right are absent.  Property-tested against brute force
    in tests/test_properties_ops.py."""
    n = k.shape[0]
    # sort: key, then time, then rights-before-lefts at equal time
    # (<= semantics), then tie ascending so the LAST right row of a
    # run is the max-tie winner
    order = np.lexsort((tie, isl, tt, k))
    ks, isls = k[order], isl[order]
    pos = np.arange(n, dtype=np.int64)
    right_at = np.where(isls == 0, pos, -1)
    np.maximum.accumulate(right_at, out=right_at)
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    np.not_equal(ks[1:], ks[:-1], out=new_key[1:])
    seg_start = np.maximum.accumulate(np.where(new_key, pos, 0))
    valid = (isls == 1) & (right_at >= seg_start)
    return order[valid], order[right_at[valid]]


def range_merge_aggregates(k: np.ndarray, tt: np.ndarray, isev: np.ndarray,
                           bkind: np.ndarray, val: np.ndarray
                           ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pure core of the range-aggregate merge: rows are right rows
    (``isev==1``) or per-left lo/hi boundary rows (``isev==0``, ``bkind``
    0/1) already offset to the window edges.  Returns ``(lo_idx, count,
    sum)`` where ``lo_idx`` are ORIGINAL positions of the lo boundary
    rows (payload carriers) and count/sum aggregate the same-key right
    rows in ``[t_lo, t_hi)``.  Relies on hi = lo + const so both
    boundary sets share one (key, time) sort order.  Property-tested
    against brute force in tests/test_properties_ops.py."""
    # boundaries (is_ev 0) before right rows (1) at equal (k, t):
    # ">= t+lo" includes and "< t+hi" excludes equal-time right rows
    order = np.lexsort((isev, tt, k))
    isev_s = isev[order]
    cnt_excl = np.cumsum(isev_s, dtype=np.int64) - isev_s
    val_s = val[order]
    sum_excl = np.cumsum(val_s, dtype=np.int64) - val_s
    bk_s = bkind[order]
    lo = bk_s == 0
    hi = bk_s == 1
    return (order[lo], cnt_excl[hi] - cnt_excl[lo],
            sum_excl[hi] - sum_excl[lo])


def asof_join(left, right, *, left_key: str, left_time: str,
              right_key: str, right_time: str,
              left_cols: list[str], right_cols: list[str],
              right_tie: str | None = None, n_buckets: int | None = None):
    """As-of join two Datasets: latest right row at-or-before each left row.

    Returns a Dataset with ``left_cols + right_cols`` (inner semantics:
    left rows with no prior right row are dropped).  ``right_tie`` names
    the column that breaks equal-time ties (defaults to ``right_cols[0]``,
    which must then be numeric); the winner is the HIGHEST tie value,
    matching ``ROW_NUMBER() OVER (... ORDER BY t DESC, tie DESC) = 1``.
    Key / time / tie columns must be null-free (``_as_int64`` raises
    otherwise — nulls cannot be ordered in an as-of merge).
    """
    from cutwed_ray.stages.cluster import coarse_buckets

    nb = n_buckets or coarse_buckets()
    tie_col = right_tie or right_cols[0]
    lcols, rcols = list(left_cols), list(right_cols)

    # one unioned light schema; the other side's payload is null-filled
    def _bucket(keys: np.ndarray) -> pa.Array:
        b = (keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             ) % np.uint64(nb)
        return pa.array(b.astype(np.int32), pa.int32())

    l_schema = left.schema()          # ray.data Schema: .names / .types
    r_schema = right.schema()
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))

    def prep_left(t: pa.Table) -> pa.Table:
        k = _as_int64(t.column(left_key))
        cols = {
            "jbkt": _bucket(k),
            "k": pa.array(k, pa.int64()),
            "t": pa.array(_as_int64(t.column(left_time)), pa.int64()),
            # tie is only consulted among rows with equal (k, t, is_left),
            # i.e. within one side — a constant 0 for left rows is inert
            # (and avoids a null->NaN->int round-trip in the merge)
            "tie": pa.array(np.zeros(len(t), np.int64), pa.int64()),
            "is_left": pa.array(np.ones(len(t), np.int8), pa.int8()),
        }
        for c in lcols:
            cols[f"L_{c}"] = t.column(c)
        for c in rcols:
            cols[f"R_{c}"] = pa.nulls(len(t), r_types[c])
        return pa.table(cols)

    def prep_right(t: pa.Table) -> pa.Table:
        k = _as_int64(t.column(right_key))
        cols = {
            "jbkt": _bucket(k),
            "k": pa.array(k, pa.int64()),
            "t": pa.array(_as_int64(t.column(right_time)), pa.int64()),
            "tie": pa.array(_as_int64(t.column(tie_col)), pa.int64()),
            "is_left": pa.array(np.zeros(len(t), np.int8), pa.int8()),
        }
        for c in lcols:
            cols[f"L_{c}"] = pa.nulls(len(t), l_types[c])
        for c in rcols:
            cols[f"R_{c}"] = t.column(c)
        return pa.table(cols)

    def merge(t: pa.Table) -> pa.Table:
        n = len(t)
        out_names = [f"L_{c}" for c in lcols] + [f"R_{c}" for c in rcols]
        if n == 0:
            return t.select(out_names).rename_columns(lcols + rcols)
        k = t.column("k").to_numpy()
        tt = t.column("t").to_numpy()
        isl = t.column("is_left").to_numpy()
        tie = t.column("tie").to_numpy(zero_copy_only=False)
        if tie.dtype.kind == "f":      # nulls (left rows) surface as NaN
            tie = np.nan_to_num(tie).astype(np.int64)
        else:
            tie = tie.astype(np.int64)
        li, ri = asof_merge_indices(k, tt, isl, tie)
        out = {}
        for c in lcols:
            out[c] = t.column(f"L_{c}").take(pa.array(li, pa.int64()))
        for c in rcols:
            out[c] = t.column(f"R_{c}").take(pa.array(ri, pa.int64()))
        return pa.table(out)

    light = (left.map_batches(prep_left, batch_format="pyarrow")
             .union(right.map_batches(prep_right, batch_format="pyarrow")))
    return light.groupby("jbkt").map_groups(merge, batch_format="pyarrow")


def range_agg_join(left, right, *, left_key: str, left_time: str,
                   right_key: str, right_time: str, left_cols: list[str],
                   window_lo: int, window_hi: int, value_col: str | None = None,
                   n_buckets: int | None = None):
    """Windowed range-aggregate join: per left row, COUNT (and optionally
    SUM ``value_col``) of right rows with the same key whose time falls in
    ``[t + window_lo, t + window_hi)`` (offsets in the time column's int64
    units, micros for timestamps).  LEFT semantics: every left row is
    emitted, count 0 when nothing matches.  Equivalent SQL: ``LEFT JOIN ..
    ON key = key AND t_r >= t + lo AND t_r < t + hi GROUP BY left row``.

    Same scale shape as :func:`asof_join` (light rows, coarse key-bucket
    shuffle, one vectorized pass per group).  The merge exploits that the
    window offsets are FIXED: each left row emits a lo and a hi boundary
    row, boundaries sort before right rows at equal (key, time) — making
    ``[lo, hi)`` semantics exact — and the exclusive prefix count/sum of
    right rows at the hi boundary minus the lo boundary is the window
    aggregate.  Because hi = lo + const, the (key, time)-sorted order of
    lo boundaries equals that of hi boundaries, so the two difference
    arrays align with no id matching.  ``value_col`` must be integer
    (convert currency/doubles to exact integer units first, the repo-wide
    oracle rule).  Key / time / value columns must be null-free
    (``_as_int64`` raises otherwise).  Self-joins (``left is right``) are
    detected and prepped in ONE pass — each input batch emits its lo
    boundary, hi boundary AND right rows together (3 rows out per row in),
    so the input is scanned once, not once per side.
    """
    from cutwed_ray.stages.cluster import coarse_buckets

    nb = n_buckets or coarse_buckets()
    lcols = list(left_cols)
    assert window_hi > window_lo

    l_schema = left.schema()
    l_types = dict(zip(l_schema.names, l_schema.types))

    def _bucket(keys: np.ndarray) -> pa.Array:
        b = (keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             ) % np.uint64(nb)
        return pa.array(b.astype(np.int32), pa.int32())

    def prep_left(t: pa.Table) -> pa.Table:
        n = len(t)
        k = _as_int64(t.column(left_key))
        tt = _as_int64(t.column(left_time))
        k2 = np.concatenate([k, k])
        cols = {
            "jbkt": _bucket(k2),
            "k": pa.array(k2, pa.int64()),
            "t": pa.array(np.concatenate([tt + window_lo, tt + window_hi]),
                          pa.int64()),
            "is_ev": pa.array(np.zeros(2 * n, np.int8), pa.int8()),
            "bkind": pa.array(np.repeat(np.array([0, 1], np.int8), n), pa.int8()),
            "val": pa.array(np.zeros(2 * n, np.int64), pa.int64()),
        }
        for c in lcols:
            col = t.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            # payload rides the lo row; the hi row's copy is never read
            cols[f"L_{c}"] = pa.concat_arrays([col, col])
        return pa.table(cols)

    def prep_right(t: pa.Table) -> pa.Table:
        n = len(t)
        k = _as_int64(t.column(right_key))
        val = (_as_int64(t.column(value_col)) if value_col
               else np.zeros(n, np.int64))
        cols = {
            "jbkt": _bucket(k),
            "k": pa.array(k, pa.int64()),
            "t": pa.array(_as_int64(t.column(right_time)), pa.int64()),
            "is_ev": pa.array(np.ones(n, np.int8), pa.int8()),
            "bkind": pa.array(np.full(n, -1, np.int8), pa.int8()),
            "val": pa.array(val, pa.int64()),
        }
        for c in lcols:
            cols[f"L_{c}"] = pa.nulls(n, l_types[c])
        return pa.table(cols)

    def merge(t: pa.Table) -> pa.Table:
        out_names = [f"L_{c}" for c in lcols]
        out_cols = lcols + ["n_matched"] + (["matched_sum"] if value_col else [])
        n = len(t)
        if n == 0:
            empty = {c: t.column(f"L_{c}") for c in lcols}
            empty["n_matched"] = pa.array([], pa.int64())
            if value_col:
                empty["matched_sum"] = pa.array([], pa.int64())
            return pa.table(empty)
        k = t.column("k").to_numpy()
        tt = t.column("t").to_numpy()
        isev = t.column("is_ev").to_numpy()
        bkind = t.column("bkind").to_numpy()
        val = t.column("val").to_numpy()
        li, cnt, sm = range_merge_aggregates(k, tt, isev, bkind, val)
        out = {}
        for c in lcols:
            out[c] = t.column(f"L_{c}").take(pa.array(li, pa.int64()))
        out["n_matched"] = pa.array(cnt, pa.int64())
        if value_col:
            out["matched_sum"] = pa.array(sm, pa.int64())
        return pa.table(out)

    if left is right:
        # self-join: ONE scan emits both sides' light rows per batch
        # (row order within the union differs from the two-scan path, but
        # the merge lexsorts per bucket, so the output is identical)
        def prep_self(t: pa.Table) -> pa.Table:
            return pa.concat_tables([prep_left(t), prep_right(t)])

        light = left.map_batches(prep_self, batch_format="pyarrow")
    else:
        light = (left.map_batches(prep_left, batch_format="pyarrow")
                 .union(right.map_batches(prep_right, batch_format="pyarrow")))
    return light.groupby("jbkt").map_groups(merge, batch_format="pyarrow")


# ------------------------------------------------------------- Bloom ----
_BLOOM_SALT = 0xA0761D6478BD642F


def _bloom_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) int64 bit positions for each key — splitmix64 with k salts,
    deterministic (no RNG), so filters built on different workers /
    cluster sizes are bit-identical."""
    from cutwed_ray.stages.hashing import splitmix64

    idx = np.empty((k, len(keys)), np.int64)
    u = keys.astype(np.uint64)
    for i in range(k):
        h = splitmix64(u ^ np.uint64((_BLOOM_SALT * (i + 1)) & (2**64 - 1)))
        idx[i] = (h % np.uint64(m_bits)).astype(np.int64)
    return idx


def bloom_from_keys(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Packed uint64 Bloom bit array (m_bits/64 words) of one key batch."""
    pos = _bloom_positions(keys, m_bits, k).ravel()
    bits = np.zeros(m_bits // 64, np.uint64)
    np.bitwise_or.at(bits, pos >> 6,
                     np.uint64(1) << (pos & 63).astype(np.uint64))
    return bits


def bloom_test(keys: np.ndarray, bits: np.ndarray, k: int) -> np.ndarray:
    """Bool mask: True where the key MAY be in the set (all k bits set);
    False is definite absence — the one-sided guarantee the prefilter
    relies on."""
    m_bits = bits.shape[0] * 64
    pos = _bloom_positions(keys, m_bits, k)
    word = bits[pos >> 6]
    hit = (word >> (pos & 63).astype(np.uint64)) & np.uint64(1)
    return hit.all(axis=0)


def build_bloom(ds, key_col: str, m_bits: int = 1 << 21, k: int = 4
                ) -> np.ndarray:
    """Distributed Bloom-filter build over a key column: each batch emits
    ONE fixed-size blob (m_bits/8 bytes) of its distinct keys' bits, a
    single-group reduce ORs the blobs in a REMOTE task, and the driver
    pulls only the final filter — shuffle volume O(batches x m_bits/8),
    independent of row count (the same mergeable-sketch shape as
    ops/agg.hll_distinct)."""
    words = m_bits // 64

    def partial(t: pa.Table) -> pa.Table:
        keys = np.unique(_as_int64(t.column(key_col)))
        return pa.table({
            "g": pa.array([0], pa.int32()),
            "blob": pa.array([bloom_from_keys(keys, m_bits, k).tobytes()],
                             pa.binary()),
        })

    def merge(grp: pa.Table) -> pa.Table:
        agg = np.zeros(words, np.uint64)
        for blob in grp.column("blob").to_pylist():
            agg |= np.frombuffer(blob, np.uint64)
        return pa.table({"g": grp.column("g")[:1],
                         "blob": pa.array([agg.tobytes()], pa.binary())})

    rows = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("g").map_groups(merge, batch_format="pyarrow")
              .take(1))
    if not rows:                      # empty right side: nothing can match
        return np.zeros(words, np.uint64)
    return np.frombuffer(rows[0]["blob"], np.uint64)


def key_filter_join(left, right, *, left_key: str, right_key: str,
                    left_cols: list[str], anti: bool = False,
                    n_buckets: int | None = None,
                    bloom_bits: int | None = None, bloom_k: int = 4):
    """Distributed SEMI (``anti=False``) / ANTI (``anti=True``) join:
    emit the ``left_cols`` of left rows whose key does (not) appear in
    the right side.  Equivalent SQL: ``WHERE [NOT] EXISTS (SELECT 1 FROM
    right r WHERE r.key = l.key)``.

    Scale shape (shared with :func:`asof_join`): the right side is
    reduced to per-batch DISTINCT keys at the read — one int64 per
    distinct key rides the shuffle, never the right payload — both sides
    co-partition on a coarse hash bucket of the key, and each group
    resolves all its keys with ONE sorted ``np.isin`` pass.  Key columns
    must be null-free (``_as_int64`` raises otherwise).  Hot keys cost
    one bucket, the documented coarse-bucket limit.

    ``bloom_bits`` enables an EXACT-result Bloom prefilter (build via
    :func:`build_bloom` on the right keys, broadcast once with
    ``ray.put``): left rows whose key definitely isn't on the right are
    resolved at the scan — DROPPED before the shuffle for SEMI (the big
    win: only candidate rows ride the exchange), or marked definite-keep
    and skipped by the probe for ANTI (they must reach the output anyway,
    so the saving is probe cost, not shuffle volume).  False positives
    only send extra candidates to the exact probe — results are
    bit-identical to the non-bloom path (pinned in tests).
    """
    import ray

    from cutwed_ray.stages.cluster import coarse_buckets

    nb = n_buckets or coarse_buckets()
    bits_ref = (ray.put(build_bloom(right, right_key, bloom_bits, bloom_k))
                if bloom_bits else None)
    lcols = list(left_cols)
    l_schema = left.schema()
    l_types = dict(zip(l_schema.names, l_schema.types))

    def _bucket(keys: np.ndarray) -> pa.Array:
        b = (keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             ) % np.uint64(nb)
        return pa.array(b.astype(np.int32), pa.int32())

    def prep_left(t: pa.Table) -> pa.Table:
        k = _as_int64(t.column(left_key))
        definite = np.zeros(len(t), np.int8)
        if bits_ref is not None:
            maybe = bloom_test(k, ray.get(bits_ref), bloom_k)
            if anti:
                definite = (~maybe).astype(np.int8)   # definite non-match
            else:
                t = t.filter(pa.array(maybe))         # can't match: drop now
                k = k[maybe]
                definite = definite[: len(t)]
        cols = {
            "jbkt": _bucket(k),
            "k": pa.array(k, pa.int64()),
            "is_left": pa.array(np.ones(len(t), np.int8), pa.int8()),
            "df": pa.array(definite, pa.int8()),
        }
        for c in lcols:
            cols[f"L_{c}"] = t.column(c)
        return pa.table(cols)

    def prep_right(t: pa.Table) -> pa.Table:
        k = np.unique(_as_int64(t.column(right_key)))   # per-batch distinct
        cols = {
            "jbkt": _bucket(k),
            "k": pa.array(k, pa.int64()),
            "is_left": pa.array(np.zeros(len(k), np.int8), pa.int8()),
            "df": pa.array(np.zeros(len(k), np.int8), pa.int8()),
        }
        for c in lcols:
            cols[f"L_{c}"] = pa.nulls(len(k), l_types[c])
        return pa.table(cols)

    def merge(t: pa.Table) -> pa.Table:
        out_names = [f"L_{c}" for c in lcols]
        if len(t) == 0:
            return t.select(out_names).rename_columns(lcols)
        k = t.column("k").to_numpy()
        isl = t.column("is_left").to_numpy().astype(bool)
        rk = np.unique(k[~isl])
        kl = k[isl]
        hit = np.zeros(len(kl), bool)
        if anti and bits_ref is not None:   # definite-keeps skip the probe
            cand = ~t.column("df").to_numpy()[isl].astype(bool)
            hit[cand] = np.isin(kl[cand], rk, assume_unique=False)
        else:
            hit[:] = np.isin(kl, rk, assume_unique=False)
        keep = np.flatnonzero(isl)[~hit if anti else hit]
        sel = pa.array(keep, pa.int64())
        out = {c: t.column(f"L_{c}").take(sel) for c in lcols}
        return pa.table(out)

    light = (left.map_batches(prep_left, batch_format="pyarrow")
             .union(right.map_batches(prep_right, batch_format="pyarrow")))
    return light.groupby("jbkt").map_groups(merge, batch_format="pyarrow")


def full_outer_sum_join(left, right, *, left_key: str, right_key: str,
                        out_key: str, left_vals: list[str],
                        right_vals: list[str],
                        left_count: str = "n_left",
                        right_count: str = "n_right"):
    """FULL OUTER aggregate join: per key, row counts and int64 value sums
    from BOTH inputs, with a key present in either side emitting one row
    and the absent side's columns as 0 (COALESCE semantics — counts read
    naturally as "none").

    A full outer join of two AGGREGATES never needs a pairwise join at
    all: each side pre-combines per batch into fixed-width partial rows
    (key, its sums, zeros for the other side's columns), the two partial
    streams ``union``, and ONE distributed groupby sums everything —
    single shuffle, no join operator, no null handling.  Value columns
    must already be exact integer units (repo FP convention).
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    all_cols = [left_count] + list(left_vals) + [right_count] + list(right_vals)

    def make_partial(key_col: str, vals: list[str], cnt: str):
        def partial(t: pa.Table) -> pa.Table:
            df = pd.DataFrame({out_key: _as_int64(t.column(key_col))})
            for v in vals:
                df[v] = _as_int64(t.column(v))
            g = df.groupby(out_key, as_index=False).agg(
                **{cnt: (out_key, "size")},
                **{v: (v, "sum") for v in vals})
            out = {out_key: pa.array(g[out_key].to_numpy().astype(np.int64),
                                     pa.int64())}
            for c in all_cols:
                src = (g[c].to_numpy().astype(np.int64) if c in g.columns
                       else np.zeros(len(g), dtype=np.int64))
                out[c] = pa.array(src, pa.int64())
            return pa.table(out)
        return partial

    u = (left.map_batches(make_partial(left_key, list(left_vals), left_count),
                          batch_format="pyarrow")
         .union(right.map_batches(
             make_partial(right_key, list(right_vals), right_count),
             batch_format="pyarrow")))
    agg = u.groupby(out_key).aggregate(
        *[Sum(c, alias_name=c) for c in all_cols])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            out_key: pa.array(t.column(out_key).to_numpy().astype(np.int64),
                              pa.int64()),
            **{c: pa.array(t.column(c).to_numpy().astype(np.int64),
                           pa.int64()) for c in all_cols},
        })

    return agg.map_batches(finish, batch_format="pyarrow")
