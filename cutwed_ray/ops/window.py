"""Distributed per-key ordered window primitives: lag-delta and running sum.

The reference engine (cuTWED) exposes no relational window surface; these
are engine-natives a replacement data platform needs alongside the temporal
joins (SURVEY.md §2.6).  Shape: LAG(col) OVER (PARTITION BY key ORDER BY t)
and SUM(v) OVER (PARTITION BY key ORDER BY t ROWS UNBOUNDED PRECEDING) —
the two window classes a feature-engineering pipeline hits first
(inter-arrival gaps, running totals).

Ray-Data-first design (same partitioning contract as ops/joins.py):

- shuffle key is a COARSE key-hash bucket (stages.cluster.coarse_buckets →
  bucket count tracks cluster CPUs), so each ``map_groups`` call windows
  ~1/nb of all keys in ONE vectorized pass — no per-key micro-groups;
- inside a bucket: one stable lexsort by (key, t, tiebreak), then numpy
  shift masked at key changes (lag) or a C-level pandas grouped cumsum
  (running sum) — no Python row loops;
- only the projected output columns ride the shuffle (light rows);
- a key hotter than one bucket's budget lands in a single group — the
  documented limit shared with asof_join/range_agg_join; salt upstream if
  a key exceeds a worker's heap.

Null keys / times are rejected (ValueError), not silently mangled: NaN
round-trips through int64 are undefined garbage (see ops/joins._as_int64).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _time_i64(s: pd.Series, what: str) -> np.ndarray:
    """Order/delta column -> int64 (timestamps become epoch MICROseconds)."""
    if s.isna().any():
        raise ValueError(f"window {what} column has nulls; drop or route "
                         "null rows explicitly before windowing")
    a = s.to_numpy()
    if np.issubdtype(a.dtype, np.datetime64):
        return a.astype("datetime64[us]").astype(np.int64)
    return a.astype(np.int64, copy=False)


def _bucketize(ds, key: str):
    from cutwed_ray.pipelines.queries import _key_bucket

    def add_bkt(t: pa.Table) -> pa.Table:
        k = t.column(key)
        if k.null_count:
            raise ValueError(f"window key column {key!r} has nulls")
        return t.append_column(
            "_wbkt", pa.array(_key_bucket(k.to_numpy()), pa.int32()))

    return ds.map_batches(add_bkt, batch_format="pyarrow")


def lag_delta(ds, *, key: str, time: str, tiebreak: str,
              cols: list[str], out_col: str = "gap"):
    """Per row: int64 delta of ``time`` to the SAME key's previous row in
    (time, tiebreak) order.  INNER semantics: each key's first row (no
    predecessor) is dropped, so the output is all-int64 non-null.
    Timestamps are differenced in exact epoch-microseconds.
    """
    def lag_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, time, tiebreak], kind="stable")
        t = _time_i64(g[time], "time")
        same = g[key].to_numpy()
        has_prev = np.zeros(len(g), dtype=bool)
        has_prev[1:] = same[1:] == same[:-1]
        delta = np.zeros(len(g), dtype=np.int64)
        delta[1:] = t[1:] - t[:-1]
        out = g.loc[has_prev, cols].reset_index(drop=True)
        out[out_col] = delta[has_prev]
        return out

    return (_bucketize(ds, key).groupby("_wbkt")
            .map_groups(lag_bucket, batch_format="pandas"))


def running_sum(ds, *, key: str, time: str, tiebreak: str, value: str,
                cols: list[str], out_col: str = "running"):
    """Per row: cumulative int64 sum of ``value`` over the SAME key's rows
    up to and including this one, in (time, tiebreak) order — the
    ``ROWS UNBOUNDED PRECEDING`` running total.  ``value`` must already be
    an exact integer unit (cents / micros) per the repo's FP convention.
    """
    def run_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, time, tiebreak], kind="stable")
        _time_i64(g[time], "time")          # null check only
        v = g[value]
        if v.isna().any():
            raise ValueError(f"window value column {value!r} has nulls")
        out = g[cols].reset_index(drop=True)
        out[out_col] = (g.groupby(key, sort=False)[value]
                         .cumsum().to_numpy().astype(np.int64))
        return out

    return (_bucketize(ds, key).groupby("_wbkt")
            .map_groups(run_bucket, batch_format="pandas"))


def debounce(ds, *, key: str, time: str, tiebreak: str, min_gap: int,
             cols: list[str]):
    """Inter-arrival debounce: keep each key's FIRST row and every row
    whose exact gap to the SAME key's PREVIOUS row (in (time, tiebreak)
    order) is >= ``min_gap`` (time units: int64, micros for timestamps) —
    the burst-suppression / retry-collapse hygiene filter of event
    pipelines.

    Semantics note: the gap is to the previous EVENT, not the previous
    KEPT event (the LAG formulation — fully vectorizable and exactly
    SQL-replicable; the kept-event-chain variant is an inherently
    sequential per-key recursion).  Same scale shape as
    :func:`lag_delta`: coarse key-bucket shuffle, one stable lexsort +
    shifted compare per bucket, light projected rows only.
    """
    def keep_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, time, tiebreak], kind="stable")
        t = _time_i64(g[time], "time")
        same = g[key].to_numpy()
        keep = np.ones(len(g), dtype=bool)
        prev_same = np.zeros(len(g), dtype=bool)
        prev_same[1:] = same[1:] == same[:-1]
        gap = np.zeros(len(g), dtype=np.int64)
        gap[1:] = t[1:] - t[:-1]
        keep[prev_same] = gap[prev_same] >= np.int64(min_gap)
        return g.loc[keep, cols].reset_index(drop=True)

    return (_bucketize(ds, key).groupby("_wbkt")
            .map_groups(keep_bucket, batch_format="pandas"))


def latest_per_key(ds, *, key: str, order_cols: list[str],
                   cols: list[str]):
    """Keep each key's LAST row by lexicographic ``order_cols`` —
    streaming compaction / SCD-1 upsert resolution (``ROW_NUMBER() OVER
    (PARTITION BY key ORDER BY ... DESC) = 1``), the "current state per
    entity" materialization every CDC/event-log pipeline runs.

    Scale shape: a MAP-SIDE COMBINE first — each batch reduces to at most
    one candidate row per key present in it (one vectorized stable sort +
    ``drop_duplicates(keep='last')``), so the shuffle carries
    O(keys x batches) combined candidates, never the event rows; the
    coarse key-bucket reduce then replays the same pick per bucket.
    Ties across the full ``order_cols`` list resolve to an arbitrary
    tied row — pass a unique final tiebreak (e.g. the event id) for
    determinism, as the oracle's ROW_NUMBER does.
    """
    # the reduce side re-sorts the combined frame AFTER the projection to
    # ``cols`` — key and every order column must survive that projection
    missing = set([key] + order_cols) - set(cols)
    if missing:
        raise ValueError(
            f"latest_per_key: cols must include key and all order_cols; "
            f"missing {sorted(missing)}")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        for c in [key] + order_cols:
            if g[c].isna().any():
                raise ValueError(f"latest_per_key column {c!r} has nulls")
        g = g.sort_values([key] + order_cols, kind="stable")
        return g.drop_duplicates(subset=[key], keep="last")[cols] \
                .reset_index(drop=True)

    def combine_batch(t: pa.Table) -> pa.Table:
        out = combine(t.select(sorted(set([key] + order_cols + cols))
                               ).to_pandas())
        k = out[key].to_numpy()
        out["_wbkt"] = _bucket_ids(k)
        from cutwed_ray.pipelines.queries import _pt
        return _pt(out)

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return combine(g)

    return (ds.map_batches(combine_batch, batch_format="pyarrow")
              .groupby("_wbkt")
              .map_groups(reduce_bucket, batch_format="pandas"))


def funnel_counts(ds, *, key: str, type_col: str, time: str,
                  stages: list[str]):
    """Ordered-funnel user counts: how many keys (users) reach stage k,
    where reaching stage k means an event of type ``stages[k]`` STRICTLY
    after that key's earliest stage-(k-1) completion time (stage 0 is the
    key's earliest ``stages[0]`` event).

    Scale shape: rows are filtered to the funnel's event types at the
    read, shuffled once by coarse key-hash bucket, and each bucket
    resolves ALL its keys with len(stages) vectorized merge steps
    (groupby-min + join + strict-after filter — no per-key loop); the
    output is len(stages) count rows per bucket, summed by one tiny
    groupby.  Same hot-key bound as the other window ops: one key's rows
    live in one bucket.

    Returns ``(funnel_stage string '1_<name>'.., n_keys int64)`` — one row
    per stage, monotonically non-increasing counts.
    """
    from ray.data.aggregate import Sum

    stage_of = {s: i for i, s in enumerate(stages)}

    def prep(t: pa.Table) -> pa.Table:
        ty = t.column(type_col).to_pandas()
        m = pd.to_numeric(ty.map(stage_of), errors="coerce") \
            .to_numpy(dtype=np.float64)
        keep = ~np.isnan(m)
        k = t.column(key)
        if k.null_count:
            raise ValueError(f"funnel key column {key!r} has nulls")
        kv = k.to_numpy()[keep]
        ts = _time_i64(t.column(time).to_pandas(), "time")[keep]
        return pa.table({
            key: pa.array(kv, pa.int64()),
            "_stage": pa.array(m[keep].astype(np.int8), pa.int8()),
            "_t": pa.array(ts, pa.int64()),
            "_wbkt": pa.array(_bucket_ids(kv), pa.int32()),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cur = (g[g._stage == 0].groupby(key, as_index=False)
               .agg(_done=("_t", "min")))
        counts = [len(cur)]
        for k_i in range(1, len(stages)):
            ev = g[g._stage == k_i].merge(cur, on=key, how="inner")
            ev = ev[ev._t > ev._done]
            cur = ev.groupby(key, as_index=False).agg(_done=("_t", "min"))
            counts.append(len(cur))
        return pd.DataFrame({"_stage": np.arange(len(stages), dtype=np.int64),
                             "n_keys": np.asarray(counts, dtype=np.int64)})

    agg = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("_wbkt")
             .map_groups(per_bucket, batch_format="pandas")
             .groupby("_stage")
             .aggregate(Sum("n_keys", alias_name="n_keys")))

    def finish(t: pa.Table) -> pa.Table:
        si = t.column("_stage").to_numpy().astype(np.int64)
        return pa.table({
            "funnel_stage": pa.array(
                [f"{i + 1}_{stages[i]}" for i in si], pa.string()),
            "n_keys": pa.array(t.column("n_keys").to_numpy().astype(np.int64),
                               pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def _bucket_ids(keys: np.ndarray) -> np.ndarray:
    from cutwed_ray.pipelines.queries import _key_bucket

    return _key_bucket(keys)


def grouped_rank_ntile(ds, *, group_col: str, order_col: str,
                       tiebreak: str, k: int, cols: list[str],
                       rank_col: str = "rk", tile_col: str = "tile",
                       n_buckets: int | None = None):
    """Per-group ``ROW_NUMBER()`` + ``NTILE(k)`` (1-based, SQL semantics)
    over ``(order_col, tiebreak)`` ascending — quartile/decile feature
    binning and per-partition ranking WITHOUT a per-group all-to-all
    sort.

    Scale shape (the grouped twin of ``ops.packing.ordered_prefix_sum``):

    1. one tiny groupby gets each group's (min, max, n) of ``order_col``;
    2. one streaming pass histograms per-(group, range-bucket) counts —
       O(groups x buckets) fixed-width rows, prefix-summed on the driver
       into per-bucket START RANKS (equal order values always land in the
       same bucket, so ties never cross buckets);
    3. one coarse (group, bucket) shuffle; each bucket task sorts ITS
       rows by (order, tiebreak) and assigns rank = start + position.

    ``NTILE``: with n rows and q = n // k, r = n % k, SQL gives the first
    r tiles q+1 rows — tile(rank0) = rank0 // (q+1) while rank0 <
    r*(q+1), else r + (rank0 - r*(q+1)) // q; both engines evaluate the
    same integer formula, so the output is exactly replayable.

    Partitioning assumptions (documented limits): the GROUP domain is
    small (event types / langs / shards — coarse-bucket upstream for
    unbounded domains); range buckets assume non-pathological order-value
    spread (a single hot (group, value) lands in one task).  The
    (order, tiebreak) pair must be unique per group — duplicate pairs
    raise (rank would be scheduling-dependent).  ``order_col`` and
    ``tiebreak`` must be int64-exact (ints or timestamps).  The scan
    executes its input three times — feed a LIGHT materialized
    projection.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Min, Sum

    from cutwed_ray.stages.cluster import coarse_buckets

    nb = int(n_buckets or coarse_buckets())
    if k < 1:
        raise ValueError("ntile k must be >= 1")

    mm = (ds.groupby(group_col)
            .aggregate(Min(order_col), Max(order_col), Count())
            .to_pandas())
    if len(mm) == 0:
        def empty(t: pa.Table) -> pa.Table:
            out = t.select(cols)
            out = out.append_column(rank_col, pa.array([], pa.int64()))
            return out.append_column(tile_col, pa.array([], pa.int64()))

        return ds.map_batches(empty, batch_format="pyarrow")
    mm = mm.sort_values(group_col, kind="stable").reset_index(drop=True)
    gkeys = pa.array(mm[group_col])
    lo = mm[f"min({order_col})"].to_numpy()
    hi = mm[f"max({order_col})"].to_numpy()
    if pd.isna(lo).any():
        raise ValueError(f"grouped_rank_ntile: {order_col} has nulls")
    lo = lo.astype(np.int64)
    width = np.maximum(1, -(-(hi.astype(np.int64) - lo + 1) // nb))
    n_g = mm["count()"].to_numpy().astype(np.int64)

    def _gb(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        gi = pc.index_in(t.column(group_col), value_set=gkeys) \
               .to_numpy(zero_copy_only=False)
        if pd.isna(gi).any():
            raise ValueError("group value absent from min/max pass "
                             "(mutated input between executions?)")
        gi = gi.astype(np.int64)
        v = _time_i64(t.column(order_col).to_pandas(), "order")
        b = np.clip((v - lo[gi]) // width[gi], 0, nb - 1)
        return gi, gi * np.int64(nb) + b

    def partial(t: pa.Table) -> pa.Table:
        _, gb = _gb(t)
        cnt = np.bincount(gb, minlength=len(n_g) * nb).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table({"_gb": pa.array(nz, pa.int64()),
                         "_c": pa.array(cnt[nz], pa.int64())})

    hist = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("_gb").aggregate(Sum("_c", alias_name="_c"))
              .to_pandas())
    counts = np.zeros(len(n_g) * nb, dtype=np.int64)
    counts[hist["_gb"].to_numpy()] = hist["_c"].to_numpy().astype(np.int64)
    # exclusive prefix WITHIN each group (bucket-major per group)
    offs = counts.reshape(len(n_g), nb)
    offs = np.concatenate([np.zeros((len(n_g), 1), np.int64),
                           np.cumsum(offs, axis=1)[:, :-1]], axis=1).reshape(-1)

    def tag(t: pa.Table) -> pa.Table:
        _, gb = _gb(t)
        return t.select(sorted(set(cols + [group_col, order_col, tiebreak]))) \
                .append_column("_gb", pa.array(gb, pa.int64()))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        gb = int(g["_gb"].iloc[0])
        gi = gb // nb
        v = _time_i64(g[order_col], "order")
        tb = _time_i64(g[tiebreak], "tiebreak")
        order = np.lexsort((tb, v))
        if order.shape[0] > 1:
            vs, ts_ = v[order], tb[order]
            if ((vs[1:] == vs[:-1]) & (ts_[1:] == ts_[:-1])).any():
                raise ValueError("grouped_rank_ntile: duplicate "
                                 f"({order_col}, {tiebreak}) pair in group")
        rank0 = np.empty(order.shape[0], dtype=np.int64)
        rank0[order] = np.int64(offs[gb]) + np.arange(order.shape[0],
                                                      dtype=np.int64)
        n = n_g[gi]
        q, r = n // k, n % k
        cut = r * (q + 1)
        small = rank0 < cut
        tile = np.where(small, rank0 // max(q + 1, 1),
                        r + (rank0 - cut) // max(q, 1))
        out = g[cols].copy()
        out[rank_col] = rank0 + 1
        out[tile_col] = tile + 1
        return out.reset_index(drop=True)

    return (ds.map_batches(tag, batch_format="pyarrow")
              .groupby("_gb")
              .map_groups(finish, batch_format="pandas"))


def hourly_retention(ds, *, user_col: str, ts_col: str,
                     bucket_us: int = 3_600_000_000):
    """Cohort retention curve: per time bucket (hour by default), how many
    distinct users were active, and how many of those were ALSO active in
    the NEXT bucket — the consecutive-period retention metric every
    engagement pipeline reports.

    Scale shape: each batch reduces to its distinct light (user, bucket)
    pairs (map-side dedup — the shuffle carries O(active-pairs), never
    events); one coarse USER-bucket shuffle co-locates each user's
    periods, so global dedup + the (h, h+1) consecutive check are one
    vectorized lexsort + shifted compare per group (users partition
    cleanly across buckets — per-bucket distinct IS globally distinct);
    per-group per-hour partial counts then sum in one tiny groupby.
    No self-join of the activity table (the SQL formulation's
    uh JOIN uh is replayed as the shifted compare).
    """
    from ray.data.aggregate import Sum

    def pairs(t: pa.Table) -> pa.Table:
        u = t.column(user_col)
        if u.null_count:
            raise ValueError(f"retention user column {user_col!r} has nulls")
        u = u.to_numpy().astype(np.int64, copy=False)
        h = _time_i64(t.column(ts_col).to_pandas(), "time") // np.int64(bucket_us)
        order = np.lexsort((h, u))
        us_, hs_ = u[order], h[order]
        keep = np.ones(us_.shape[0], dtype=bool)
        keep[1:] = (us_[1:] != us_[:-1]) | (hs_[1:] != hs_[:-1])
        from cutwed_ray.pipelines.queries import _key_bucket

        return pa.table({
            "_u": pa.array(us_[keep], pa.int64()),
            "_h": pa.array(hs_[keep], pa.int64()),
            "_wbkt": pa.array(_key_bucket(us_[keep]), pa.int32()),
        })

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = g["_u"].to_numpy()
        h = g["_h"].to_numpy()
        order = np.lexsort((h, u))
        u, h = u[order], h[order]
        keep = np.ones(u.shape[0], dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (h[1:] != h[:-1])
        u, h = u[keep], h[keep]
        retained = np.zeros(u.shape[0], dtype=np.int64)
        retained[:-1] = (u[1:] == u[:-1]) & (h[1:] == h[:-1] + 1)
        out = pd.DataFrame({"hour_id": h, "_act": np.ones(h.shape[0],
                                                          dtype=np.int64),
                            "_ret": retained})
        return out.groupby("hour_id", as_index=False).sum()

    agg = (ds.map_batches(pairs, batch_format="pyarrow")
             .groupby("_wbkt")
             .map_groups(reduce_bucket, batch_format="pandas")
             .groupby("hour_id")
             .aggregate(Sum("_act", alias_name="n_active"),
                        Sum("_ret", alias_name="n_retained")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "hour_id": pa.array(t.column("hour_id").to_numpy()
                                .astype(np.int64), pa.int64()),
            "n_active": pa.array(t.column("n_active").to_numpy()
                                 .astype(np.int64), pa.int64()),
            "n_retained": pa.array(t.column("n_retained").to_numpy()
                                   .astype(np.int64), pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def rolling_mean(ds, *, key: str, time: str, tiebreak: str, value: str,
                 window_rows: int, cols: list[str],
                 out_col: str = "rolling_mean"):
    """Per row: float64 mean of ``value`` over the SAME key's last
    ``window_rows`` rows up to and including this one, in (time,
    tiebreak) order — ``AVG(v) OVER (PARTITION BY key ORDER BY ...
    ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW)``, the bounded-frame
    window class (smoothing / rate features) the unbounded
    :func:`running_sum` doesn't cover.

    Exactness: ``value`` must be an exact integer unit; the rolling SUM
    is an int64 cumsum difference, and the mean is ONE float64 division
    ``sum / count`` on both engines — bit-identical to the SQL oracle,
    no tolerance.  Scale shape: identical to :func:`lag_delta` (coarse
    key-bucket shuffle, one lexsort + vectorized cumsum-diff per
    bucket, light projected rows).
    """
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")

    def roll_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, time, tiebreak], kind="stable")
        _time_i64(g[time], "time")          # null check only
        if g[value].isna().any():
            raise ValueError(f"window value column {value!r} has nulls")
        v = g[value].to_numpy().astype(np.int64)
        k = g[key].to_numpy()
        n = v.shape[0]
        cum = np.concatenate(([0], np.cumsum(v)))        # len n+1
        # per-row start of its key run
        run_start = np.zeros(n, dtype=np.int64)
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = k[1:] != k[:-1]
        run_start = np.maximum.accumulate(
            np.where(new_key, np.arange(n, dtype=np.int64), 0))
        lo = np.maximum(np.arange(n, dtype=np.int64) - (window_rows - 1),
                        run_start)
        s = cum[np.arange(1, n + 1)] - cum[lo]
        cnt = np.arange(n, dtype=np.int64) - lo + 1
        out = g[cols].reset_index(drop=True)
        out[out_col] = s.astype(np.float64) / cnt.astype(np.float64)
        return out

    return (_bucketize(ds, key).groupby("_wbkt")
            .map_groups(roll_bucket, batch_format="pandas"))


def grouped_string_agg(ds, *, key: str, value: str, order_cols: list[str],
                       sep: str = ",", out_col: str = "agg"):
    """Per key: the ordered ``sep``-joined concatenation of ``value`` —
    ``string_agg(value, sep ORDER BY ...)``, the behavior-sequence /
    user-journey extraction step (event-type paths for sequence models,
    breadcrumb assembly, grouped debug traces).

    Scale shape: the output is proportional to the input by definition
    (every value lands in some key's string), so the op shuffles the
    projected (key, value, order) rows ONCE on coarse key-hash buckets
    and each bucket emits one row per key after a single stable lexsort
    — the same hot-key contract as the other window ops (one key's rows
    fit one bucket task; at 100 TB cap per-key cardinality upstream or
    emit chunked sequences).  Join order is fully determined by
    ``order_cols`` (pass a unique final tiebreak), so the output is
    deterministic and SQL-replayable.
    """
    def agg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        for c in [key, value] + order_cols:
            if g[c].isna().any():
                raise ValueError(f"string_agg column {c!r} has nulls")
        g = g.sort_values([key] + order_cols, kind="stable")
        out = (g.groupby(key, sort=False)[value]
                .agg(lambda s: sep.join(s.astype(str)))
                .reset_index())
        out.columns = [key, out_col]
        return out

    return (_bucketize(ds.select_columns(
                sorted(set([key, value] + order_cols))), key)
            .groupby("_wbkt")
            .map_groups(agg_bucket, batch_format="pandas"))
