"""Series sources: readers that produce the engine's series-table schema.

The reference parses ad-hoc text / gzip / .npz inputs into dense arrays
(whitespace parser /root/reference/tests/test_synthetic_validation.py:33-41,
gzip column parser synthetic_index_validation/synthetic_index.py:58-92,
.npz loader tests/test_Rn.py:104-118).  Here every source lands in ONE
canonical Arrow schema so the kernel stages compose:

    series_id: int64, series: list<float64>, ts: list<float64>

All readers are streaming Ray Data pipelines; `from_numpy` is the small
in-memory helper used by tests/fixtures.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SERIES_SCHEMA = pa.schema([
    ("series_id", pa.int64()),
    ("series", pa.list_(pa.float64())),
    ("ts", pa.list_(pa.float64())),
])


def from_numpy(X: np.ndarray, T: np.ndarray | None = None,
               ids: np.ndarray | None = None) -> pa.Table:
    """(S, n) value matrix (+ optional (n,) or (S, n) time axis) -> series table.

    The .npz-loader analogue: fabricates ts = arange(n) when absent, exactly
    like the reference's synthetic_index.py time-axis fabrication.
    """
    X = np.asarray(X, dtype=np.float64)
    if X.ndim == 1:
        X = X[None, :]
    S, n = X.shape
    if T is None:
        T = np.tile(np.arange(n, dtype=np.float64), (S, 1))
    else:
        T = np.asarray(T, dtype=np.float64)
        if T.ndim == 1:
            T = np.tile(T, (S, 1))
    if ids is None:
        ids = np.arange(S, dtype=np.int64)
    off = pa.array(np.arange(0, (S + 1) * n, n, dtype=np.int32), pa.int32())
    return pa.table({
        "series_id": pa.array(ids, pa.int64()),
        "series": pa.ListArray.from_arrays(off, pa.array(X.reshape(-1), pa.float64())),
        "ts": pa.ListArray.from_arrays(off, pa.array(T.reshape(-1), pa.float64())),
    })


def read_series_text(paths, sample_len: int | None = None):
    """Whitespace-separated-numbers text reader (one series per line) — the
    UCI synthetic_control parser as a streaming Ray pipeline.

    ``sample_len`` truncates every series to a fixed length (the reference's
    ``subset`` truncation, synthetic_index.py:86-92).
    """
    import ray.data as rd

    ds = rd.read_text(paths)

    def parse(batch: pa.Table) -> pa.Table:
        lines = batch.column("text").to_pylist()
        out_vals, offsets = [], [0]
        for ln in lines:
            v = (np.array(ln.split(), dtype=np.float64)
                 if ln.strip() else np.zeros(0))
            if sample_len is not None:
                v = v[:sample_len]
            out_vals.append(v)
            offsets.append(offsets[-1] + v.shape[0])
        flat = np.concatenate(out_vals) if out_vals else np.zeros(0)
        ts = np.concatenate([np.arange(o1 - o0, dtype=np.float64)
                             for o0, o1 in zip(offsets[:-1], offsets[1:])]) \
            if len(offsets) > 1 else np.zeros(0)
        off = pa.array(np.asarray(offsets, dtype=np.int32), pa.int32())
        return pa.table({
            "series": pa.ListArray.from_arrays(off, pa.array(flat, pa.float64())),
            "ts": pa.ListArray.from_arrays(off, pa.array(ts, pa.float64())),
        })

    return ds.map_batches(parse, batch_format="pyarrow")


def read_series_gz_columns(paths, sample_len: int | None = None):
    """Gzip'd columnar text reader — the reference's synthetic-index shape
    (synthetic_index_validation/synthetic_index.py:58-92): one LINE per
    time step, one COLUMN per series; series are the transposed columns in
    C order, the time axis is a fabricated ``linspace(0, 1, n)``, and
    ``sample_len`` truncates every series to its first ``sample_len``
    samples with the time axis regenerated over the truncated length
    (the reference's ``subset`` mode).

    A gzip stream is not splittable, so each FILE is one parse task
    (``read_binary_files``); the source scales across many files.  Output
    schema: series_id int64 (column index within its file), source string
    (file path), series list<float64>, ts list<float64>.
    """
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        import gzip
        import io

        tables = []
        raws = batch.column("bytes").to_pylist()
        srcs = batch.column("path").to_pylist()
        for raw, src in zip(raws, srcs):
            # Arrow's filesystem layer may already have auto-decompressed
            # by extension — sniff the gzip magic instead of trusting it
            txt = (gzip.decompress(raw) if raw[:2] == b"\x1f\x8b" else raw).decode()
            M = np.loadtxt(io.StringIO(txt), dtype=np.float64, ndmin=2)
            TS = np.ascontiguousarray(M.T)          # (nseries, nsamples)
            if sample_len is not None:
                TS = TS[:, :sample_len].copy()
            n = TS.shape[1]
            T = np.linspace(0, 1, n, dtype=np.float64)
            t = from_numpy(TS, T)
            t = t.append_column("source", pa.array([src] * len(t), pa.string()))
            tables.append(t)
        if not tables:
            sch = SERIES_SCHEMA.append(pa.field("source", pa.string()))
            return sch.empty_table()
        return pa.concat_tables(tables)

    return rd.read_binary_files(paths, include_paths=True).map_batches(
        parse, batch_format="pyarrow")


def score_series_dataset(ds, nu: float, lamb: float, degree: int = 2,
                         concurrency: int = 4):
    """All-pairs TWED over a (small) series Dataset -> long-form pair table.

    The Ray-native equivalent of the reference's all-pairs validation
    matrices: emits (id_a, id_b, twed) for i<j — dense matrices don't scale,
    long form does (SURVEY.md §1.4).  The series table is broadcast; pairs
    are generated and scored in partitioned map_batches tasks.
    """
    import ray
    import ray.data as rd

    from cutwed_ray.kernel.batch import _sweep, pack_series

    tbl = pa.concat_tables([ray.get(r) for r in ds.to_arrow_refs()])
    ids = tbl.column("series_id").to_numpy()
    ser = tbl.column("series")
    ts = tbl.column("ts")
    if isinstance(ser, pa.ChunkedArray):
        ser = ser.combine_chunks()
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    series = [np.asarray(ser[i].values, dtype=np.float64) if hasattr(ser[i], "values")
              else np.asarray(ser[i].as_py()) for i in range(len(tbl))]
    tss = [np.asarray(ts[i].values, dtype=np.float64) if hasattr(ts[i], "values")
           else np.asarray(ts[i].as_py()) for i in range(len(tbl))]
    X, TX, lens = pack_series(series, tss)
    store = ray.put((X, TX, lens, ids))

    ia, ib = np.triu_indices(len(tbl), k=1)
    pairs = rd.from_arrow(pa.table({
        "pi": pa.array(ia.astype(np.int64), pa.int64()),
        "pj": pa.array(ib.astype(np.int64), pa.int64()),
    }))

    def score(t: pa.Table, _nu=nu, _lamb=lamb, _deg=degree) -> pa.Table:
        # elastic TASKS: the pool is plasma-mapped per worker via ray.get
        # (zero-copy, ~µs) — no actor pool to size or deadlock
        X, TX, lens, ids = ray.get(store)
        pi = t.column("pi").to_numpy()
        pj = t.column("pj").to_numpy()
        d = _sweep(X, TX, lens, X, TX, lens, pi, pj, _nu, _lamb, _deg)
        return pa.table({
            "id_a": pa.array(ids[pi], pa.int64()),
            "id_b": pa.array(ids[pj], pa.int64()),
            "twed": pa.array(d, pa.float64()),
        })

    pairs = pairs.repartition(max(concurrency * 2, 2))
    return pairs.map_batches(score, batch_format="pyarrow", batch_size=4096,
                             num_cpus=1)
