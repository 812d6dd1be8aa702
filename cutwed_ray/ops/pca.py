"""Distributed PCA over an embedding column — exact-integer moment
accumulation, driver-side eigendecomposition, broadcast projection.

The 100-TB shape of PCA is the same two-phase pattern as the repo's other
"small model over big data" ops (kmeans centroids, TF-IDF DF table):

* **fit**: one streaming pass accumulates the sufficient statistics
  ``(n, sum, sum-of-outer-products)``.  Embeddings are quantized to EXACT
  integer micros first, so the int64 partial sums are associative and
  layout-invariant — the resulting covariance (and therefore the fitted
  components) is bit-identical at any CPU count / block layout, which is
  what lets a pinned fixture oracle the output (cf. ops/kmeans.py's
  fixed-point Lloyd).  Each batch emits ONE fixed-width moment row
  (8 + 8*dim + 8*dim^2 bytes); a two-level tree merge folds them, so no
  task — and not the driver — ever receives O(n_batches) rows.
* **project**: eigendecomposition of the dim x dim covariance runs on the
  driver (16x16 here — microseconds), the component matrix ships by
  closure (a few hundred bytes), and the projection is a stateless
  vectorized ``map_batches`` over the stream.

Domain bound: int64 outer-product sums require
``n_rows * (max|e| * scale)^2 < 2^63`` — unit-norm embeddings at
scale=1e6 allow ~9e6 rows per fit; pass a smaller ``scale`` (1e4 allows
~9e10 rows) or shard-and-merge the moment rows for more.  Sign of each
component is canonicalized (largest-|loading| entry positive) so the
output is stable across LAPACK builds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _quantize(t: pa.Table, emb_col: str, scale: float) -> np.ndarray:
    from cutwed_ray.ops.ann import _emb_matrix

    e = _emb_matrix(t, emb_col)
    return np.floor(e * scale + 0.5).astype(np.int64)


def fit_moments(ds, emb_col: str, scale: float = 1e6):
    """One streaming pass -> exact int64 ``(n, s[dim], ss[dim, dim])``."""
    def partial(t: pa.Table) -> pa.Table:
        from cutwed_ray.ops.agg import _merge_bucket

        q = _quantize(t, emb_col, scale)
        ss = q.T @ q  # int64 matmul, exact
        blob = ss.tobytes()
        return pa.table({
            "_mrg": pa.array([_merge_bucket(blob)], pa.int32()),
            "n": pa.array([len(q)], pa.int64()),
            "dim": pa.array([q.shape[1]], pa.int64()),
            "s": pa.array([q.sum(axis=0).tobytes()], pa.binary()),
            "ss": pa.array([blob], pa.binary()),
        })

    def merge(g: pa.Table) -> pa.Table:
        dim = int(g.column("dim")[0].as_py())
        n = int(np.sum(g.column("n").to_numpy()))
        s_rows = np.frombuffer(b"".join(g.column("s").to_pylist()),
                               dtype=np.int64).reshape(-1, dim)
        ss_rows = np.frombuffer(b"".join(g.column("ss").to_pylist()),
                                dtype=np.int64).reshape(-1, dim * dim)
        return pa.table({
            "_mrg": pa.array([0], pa.int32()),
            "n": pa.array([n], pa.int64()),
            "dim": pa.array([dim], pa.int64()),
            "s": pa.array([s_rows.sum(axis=0).tobytes()], pa.binary()),
            "ss": pa.array([ss_rows.sum(axis=0).tobytes()], pa.binary()),
        })

    # two-level tree merge (see ops/agg.py::_merge_bucket): level 1 folds
    # moment rows in parallel, level 2 folds the survivors — the single
    # final task never receives O(n_batches) rows.
    row = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("_mrg").map_groups(merge, batch_format="pyarrow")
             .groupby("_mrg").map_groups(merge, batch_format="pyarrow")
             .take(1))[0]
    dim = int(row["dim"])
    n = int(row["n"])
    s = np.frombuffer(row["s"], dtype=np.int64).astype(np.float64)
    ss = np.frombuffer(row["ss"], dtype=np.int64).astype(np.float64) \
        .reshape(dim, dim)
    return n, s, ss


def fit_components(n: int, s: np.ndarray, ss: np.ndarray, scale: float,
                   n_components: int):
    """Covariance from exact moments -> top-k components, sign-canonical."""
    mean_q = s / n                       # in quantized units
    cov = (ss - np.outer(s, s) / n) / n  # population covariance, quantized
    w, v = np.linalg.eigh(cov)           # ascending
    comp = v[:, ::-1][:, :n_components]  # (dim, k), descending eigenvalue
    for j in range(comp.shape[1]):
        i = int(np.argmax(np.abs(comp[:, j])))
        if comp[i, j] < 0:
            comp[:, j] = -comp[:, j]
    evr = w[::-1][:n_components] / max(np.sum(w), 1e-300)
    return mean_q / scale, comp, evr


def pca_project(ds, id_cols: list[str], emb_col: str,
                n_components: int = 2, scale: float = 1e6,
                decimals: int = 6):
    """Fit PCA on ``emb_col`` and project every row to ``n_components``.

    Returns a Dataset ``(id_cols..., pc1..pcK float64)`` — projections are
    computed from the same quantized values the fit saw, so the whole
    output is a pure function of the quantized input (layout- and
    parallelism-invariant), rounded to ``decimals``.
    """
    n, s, ss = fit_moments(ds, emb_col, scale)
    mean, comp, _ = fit_components(n, s, ss, scale, n_components)

    def project(t: pa.Table) -> pa.Table:
        q = _quantize(t, emb_col, scale).astype(np.float64) / scale
        p = (q - mean) @ comp
        p = np.round(p, decimals)
        cols = {c: t.column(c) for c in id_cols}
        for j in range(n_components):
            cols[f"pc{j + 1}"] = pa.array(p[:, j], pa.float64())
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")
