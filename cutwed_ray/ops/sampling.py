"""Deterministic hash-based sampling / split assignment.

The training-data primitives that must be REPRODUCIBLE across runs,
cluster sizes and block layouts: every decision is a pure function of
the row's id (splitmix64), never of RNG state, row order, or partition
boundaries — the property that makes a 100-TB re-run (or a resumed
partial run) assign every row identically.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _id_hash_pct(ids: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64(id XOR salt) -> uniform int in [0, 100)."""
    from cutwed_ray.stages.hashing import splitmix64

    h = splitmix64(ids.astype(np.uint64) ^ np.uint64(salt))
    return (h % np.uint64(100)).astype(np.int64)


def hash_split(ds, id_col: str,
               splits: tuple[tuple[str, int], ...] = (
                   ("train", 80), ("val", 10), ("test", 10)),
               salt: int = 7):
    """Assign every row to a named split by hashing its id — deterministic
    80/10/10 (or caller-specified) partitioning with no RNG, no shuffle,
    and no coordination: one stateless ``map_batches`` stage, so it
    composes with any upstream/downstream at any scale.  Percentages must
    sum to 100.  Returns the input columns plus a ``split`` string column.
    """
    names = [n for n, _ in splits]
    pcts = np.cumsum([p for _, p in splits])
    assert pcts[-1] == 100, "split percentages must sum to 100"
    bounds = pcts[:-1]

    def assign(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        pct = _id_hash_pct(ids, salt)
        idx = np.searchsorted(bounds, pct, side="right")
        split = np.asarray(names, dtype=object)[idx]
        return t.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def stratified_sample(ds, group_col: str, id_col: str, k: int):
    """Deterministic fixed-k-per-group sample: each group's k rows with the
    smallest ``(knuth_hash(id), id)`` — a pseudo-random but reproducible
    pick (same rows at every parallelism / block layout / run).  The hash
    is the Knuth multiplicative ``(id * 2654435761) % 2**32`` so an ANSI-SQL
    oracle can replicate it exactly (``row_number() OVER (PARTITION BY g
    ORDER BY (id * 2654435761) % 4294967296, id)``).

    Scale shape: a per-BLOCK partial keeps at most k rows per group present
    in the block (one vectorized lexsort + grouped head — no per-group
    loops), so the shuffle sees <= k x groups x blocks light rows, never
    the corpus; the final per-group head-k merges those.  Partitioning
    assumption: one group's k x blocks partial rows fit one task (group
    domain assumed small — langs / splits / shards; coarse-bucket the
    partials upstream for unbounded domains).

    Returns ``(group_col, id_col, rank int64)`` with rank 1..k in hash
    order.
    """
    KNUTH = np.int64(2654435761)
    MOD = np.int64(1 << 32)

    def topk(g: pa.Table, with_rank: bool) -> pa.Table:
        if g.num_rows == 0:
            cols = {group_col: pa.array([], g.schema.field(group_col).type),
                    id_col: pa.array([], pa.int64())}
            if with_rank:
                cols["rank"] = pa.array([], pa.int64())
            return pa.table(cols)
        ids = g.column(id_col).to_numpy().astype(np.int64)
        grp = g.column(group_col).to_pandas().to_numpy()
        h = (ids * KNUTH) % MOD
        # lexsort: primary group, then hash, then id (least-significant last)
        order = np.lexsort((ids, h, grp))
        grp_s, ids_s, h_s = grp[order], ids[order], h[order]
        new = np.ones(len(grp_s), dtype=bool)
        new[1:] = grp_s[1:] != grp_s[:-1]
        # rank within group = position since last group start
        seg_start = np.maximum.accumulate(np.where(new, np.arange(len(grp_s)), 0))
        rank = np.arange(len(grp_s)) - seg_start + 1
        keep = rank <= k
        cols = {group_col: pa.array(grp_s[keep]),
                id_col: pa.array(ids_s[keep], pa.int64())}
        if with_rank:
            cols["rank"] = pa.array(rank[keep].astype(np.int64), pa.int64())
        return pa.table(cols)

    def partial(t: pa.Table) -> pa.Table:
        return topk(t, with_rank=False)

    def finish(t: pa.Table) -> pa.Table:
        return topk(t, with_rank=True)

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(group_col)
              .map_groups(finish, batch_format="pyarrow"))


def sample_fraction(ds, id_col: str, fraction: float, salt: int = 11):
    """Deterministic Bernoulli sample: keep a row iff
    ``splitmix64(id) % 100 < fraction * 100``.  Same id set at every
    parallelism / block layout / run (unlike ``Dataset.random_sample``);
    one stateless filter stage."""
    thresh = int(round(fraction * 100))

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        return t.filter(pa.array(_id_hash_pct(ids, salt) < thresh))

    return ds.map_batches(keep, batch_format="pyarrow")
