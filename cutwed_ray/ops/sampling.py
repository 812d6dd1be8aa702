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
