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
