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
    """Key/time column -> int64 numpy (timestamps become epoch micros)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype.kind == "M":          # datetime64[us] from timestamp[us]
        return arr.astype("datetime64[us]").view(np.int64)
    return arr.astype(np.int64)


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
            "tie": pa.nulls(len(t), pa.int64()),
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
        is_l = isls == 1
        valid = is_l & (right_at >= seg_start)
        li = order[valid]                    # original left row indices
        ri = order[right_at[valid]]          # matched right row indices
        out = {}
        for c in lcols:
            out[c] = t.column(f"L_{c}").take(pa.array(li, pa.int64()))
        for c in rcols:
            out[c] = t.column(f"R_{c}").take(pa.array(ri, pa.int64()))
        return pa.table(out)

    light = (left.map_batches(prep_left, batch_format="pyarrow")
             .union(right.map_batches(prep_right, batch_format="pyarrow")))
    return light.groupby("jbkt").map_groups(merge, batch_format="pyarrow")
