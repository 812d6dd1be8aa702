"""Distributed Lloyd k-means over an embedding column (semantic
clustering — the curation primitive behind semantic dedup / domain
mixing of training corpora).

Each iteration is ONE streaming pass: ``map_batches`` emits a k-row
partial (per-cluster count + coordinate sums), the driver folds the
tiny partials and broadcasts the next centroids inside the following
pass's closure (k x dim floats — small).  Nothing corpus-sized ever
reaches the driver.

Bit-determinism across parallelism AND block layout (required for the
pinned-fixture oracle, and the property float accumulation cannot give):
per-batch coordinate sums are FIXED-POINT int64 — each embedding value
is scaled by 2**FP_SHIFT and rounded exactly once — so the cross-batch
reduction is integer addition, which is order-independent.  Centroids
(and therefore every argmin assignment) are a pure function of the
input, not of the block schedule.  With float64 partials the last-bit
sum would depend on batch boundaries and cluster boundaries could flip.

Scale notes: the projected (id, embedding) table is materialized once
and re-scanned per iteration from the object store (iters x cheap local
reads instead of iters x parquet scans); for an over-plasma-budget
corpus drop ``materialize=False`` to re-read from storage instead.
int64 fixed-point sums overflow only past ~2**43 rows per cluster at
|value| ~ 1 (2**63 / 2**20) — not reachable at 100 TB of float32
embeddings.

Analogue of the reference's batched device-resident processing
(cuTWED src/cuTWED.cu grid batching): state that every task needs
(centroids) is broadcast, per-batch work is one matmul-shaped kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cutwed_ray.ops.ann import _emb_matrix

FP_SHIFT = 20          # fixed-point scale: 2**20 ~ 1e6 (see module doc)
_FP = float(1 << FP_SHIFT)


def _assign(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Squared-L2 argmin assignment, ties -> lowest cluster id."""
    d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
    return d2.argmin(axis=1)


def _partial_sums(X: np.ndarray, a: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-cluster (count, fixed-point coordinate sum) — exact int64."""
    Xq = np.rint(X * _FP).astype(np.int64)
    order = np.argsort(a, kind="stable")
    S = np.zeros((X.shape[0] + 1, X.shape[1]), dtype=np.int64)
    np.cumsum(Xq[order], axis=0, out=S[1:])
    bounds = np.searchsorted(a[order], np.arange(k + 1))
    sums = S[bounds[1:]] - S[bounds[:-1]]
    counts = np.bincount(a, minlength=k).astype(np.int64)
    return counts, sums


def init_centroids(ds, emb_col: str, id_col: str, k: int, seed: int,
                   sample_size: int = 2048) -> np.ndarray:
    """Seeded init from a BOUNDED prefix sample (driver pull capped at
    sample_size rows regardless of corpus size, same pattern as
    ops/ann.py train_ivf_centroids).  The pulled sample is canonicalized
    by sorting on ``id_col`` before the seeded choice: the streaming
    executor does not guarantee block ORDER, so without the sort the
    init (and every downstream assignment) would depend on the block
    schedule."""
    import ray

    parts = [t for t in ray.get(ds.limit(sample_size).to_arrow_refs())
             if t.num_rows]
    samp = pa.concat_tables(parts)
    samp = samp.sort_by(id_col)
    X = _emb_matrix(samp, emb_col)
    rng = np.random.default_rng(seed)
    idx = np.sort(rng.choice(X.shape[0], size=min(k, X.shape[0]),
                             replace=False))
    return X[idx].copy()


def kmeans_assign(ds, emb_col: str = "embedding", id_col: str = "vec_id",
                  k: int = 8, iters: int = 4, seed: int = 17,
                  sample_size: int = 2048, materialize: bool = True):
    """Lloyd k-means; returns a Dataset of (id_col, cluster int64).

    Deterministic in (input, k, iters, seed) — independent of CPU count
    and block boundaries (fixed-point partials, see module docstring).
    Empty clusters keep their previous centroid.
    """
    lite = ds.select_columns([id_col, emb_col])
    if materialize:
        lite = lite.materialize()
    C = init_centroids(lite, emb_col, id_col, k, seed, sample_size)
    k_eff, dim = C.shape

    for _ in range(iters):
        C_cur = C  # rebind: the closure must capture THIS iteration's value

        def partial(t: pa.Table, C_cur=C_cur) -> pa.Table:
            X = _emb_matrix(t, emb_col)
            counts, sums = _partial_sums(X, _assign(X, C_cur), k_eff)
            return pa.table({
                "cluster": pa.array(np.arange(k_eff, dtype=np.int64)),
                "count": pa.array(counts),
                "sums": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.ravel(), pa.int64()), sums.shape[1]),
            })

        rows = lite.map_batches(partial, batch_format="pyarrow").take_all()
        counts = np.zeros(k_eff, dtype=np.int64)
        sums = np.zeros((k_eff, dim), dtype=np.int64)
        for r in rows:                       # k x n_blocks tiny rows
            counts[r["cluster"]] += r["count"]
            sums[r["cluster"]] += np.asarray(r["sums"], dtype=np.int64)
        nz = counts > 0
        C = C.copy()
        C[nz] = sums[nz] / (counts[nz, None] * _FP)

    C_fin = C

    def assign_batch(t: pa.Table) -> pa.Table:
        X = _emb_matrix(t, emb_col)
        return pa.table({
            id_col: t.column(id_col),
            "cluster": pa.array(_assign(X, C_fin).astype(np.int64)),
        })

    return lite.map_batches(assign_batch, batch_format="pyarrow")
