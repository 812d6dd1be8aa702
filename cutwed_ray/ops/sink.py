"""Resumable partitioned parquet sink.

The prompt-level requirement for 100-TB runs: output lands as ONE
DIRECTORY PER PARTITION (hive-style ``key=value/``), each partition
committed atomically (files first, ``_SUCCESS`` marker last), so a failed
run re-invoked with ``resume=True`` skips finished partitions at the READ
(a streaming filter — finished partitions' rows never shuffle again) and
re-writes only the missing ones.  Never one giant file.

Scale shape: ``groupby(key).map_groups`` co-locates each partition in one
task (the standard dynamic-partitioning shuffle — unavoidable if a
partition must be one directory written by one writer); each task writes
its rows in ``max_rows_per_file`` chunks, fsyncs nothing it doesn't own,
and emits a single (partition, n_rows, n_files) summary row.  Partition
keys should be low-cardinality (lang, date, shard id) — for unkeyed data
use ``hash_partition_col`` to derive a bounded bucket column first.

Crash semantics: a partition directory WITHOUT ``_SUCCESS`` is presumed
torn — resume deletes and rewrites it.  The summary of a resumed run
counts only partitions written THIS run (skipped ones are listed in the
returned manifest's ``skipped``).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from cutwed_ray.stages.hashing import splitmix64

_SUCCESS = "_SUCCESS"


def hash_partition_col(t: pa.Table, id_col: str, n_buckets: int,
                       out_col: str = "part") -> pa.Table:
    """Derive a bounded int64 bucket column from an id column (splitmix64
    mod n_buckets) — the unkeyed-data lane into write_partitioned."""
    ids = t.column(id_col).to_numpy().astype(np.int64, copy=False)
    b = (splitmix64(ids.view(np.uint64)) % np.uint64(n_buckets)).astype(np.int64)
    return t.append_column(out_col, pa.array(b, pa.int64()))


def _part_dir(out_dir: str, by: str, value) -> str:
    return os.path.join(out_dir, f"{by}={value}")


def finished_partitions(out_dir: str, by: str) -> list[str]:
    """Partition VALUES (as strings) whose directory carries _SUCCESS."""
    if not os.path.isdir(out_dir):
        return []
    out = []
    pre = f"{by}="
    for d in sorted(os.listdir(out_dir)):
        if d.startswith(pre) and \
                os.path.exists(os.path.join(out_dir, d, _SUCCESS)):
            out.append(d[len(pre):])
    return out


def write_partitioned(ds, out_dir: str, *, by: str, resume: bool = True,
                      max_rows_per_file: int = 1 << 20) -> dict:
    """Write ``ds`` as ``out_dir/{by}={value}/chunk-*.parquet`` with
    atomic per-partition commit.  Returns a manifest dict::

        {"written": {value: {"n_rows": .., "n_files": ..}},
         "skipped": [values...]}    # finished partitions resume skipped

    The partition column is kept in the files (self-describing rows).
    """
    os.makedirs(out_dir, exist_ok=True)
    done = set(finished_partitions(out_dir, by)) if resume else set()

    # torn partitions (no _SUCCESS) are rewritten: clear them up front so
    # a crash mid-cleanup is still safe (idempotent)
    pre = f"{by}="
    for d in list(os.listdir(out_dir)):
        if d.startswith(pre) and d[len(pre):] not in done:
            shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)

    if done:
        done_list = sorted(done)

        def keep(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            vals = pc.cast(t.column(by), pa.string())
            return t.filter(pc.invert(pc.is_in(
                vals, value_set=pa.array(done_list, pa.string()))))

        ds = ds.map_batches(keep, batch_format="pyarrow")

    def write_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({by: pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64()),
                             "n_files": pa.array([], pa.int64())})
        value = str(g.column(by)[0].as_py())
        pdir = _part_dir(out_dir, by, value)
        shutil.rmtree(pdir, ignore_errors=True)
        os.makedirs(pdir, exist_ok=True)
        n_files = 0
        for lo in range(0, g.num_rows, max_rows_per_file):
            chunk = g.slice(lo, max_rows_per_file)
            pq.write_table(chunk,
                           os.path.join(pdir, f"chunk-{n_files:05d}.parquet"))
            n_files += 1
        with open(os.path.join(pdir, "_MANIFEST.json"), "w") as fh:
            json.dump({"n_rows": g.num_rows, "n_files": n_files}, fh)
        open(os.path.join(pdir, _SUCCESS), "w").close()   # commit LAST
        return pa.table({by: pa.array([value], pa.string()),
                         "n_rows": pa.array([g.num_rows], pa.int64()),
                         "n_files": pa.array([n_files], pa.int64())})

    summary = (ds.groupby(by)
                 .map_groups(write_group, batch_format="pyarrow")
                 .to_pandas())
    written = {r[by]: {"n_rows": int(r["n_rows"]),
                       "n_files": int(r["n_files"])}
               for _, r in summary.iterrows()}
    return {"written": written, "skipped": sorted(done)}


def read_partitioned(out_dir: str, by: str):
    """Read back ONLY committed partitions as one Dataset."""
    import glob

    import ray.data as rd

    files: list[str] = []
    for v in finished_partitions(out_dir, by):
        # enumerate data files explicitly: the partition dirs also hold
        # _SUCCESS/_MANIFEST.json markers a bare directory read trips on
        files.extend(sorted(glob.glob(
            os.path.join(_part_dir(out_dir, by, v), "chunk-*.parquet"))))
    if not files:
        raise FileNotFoundError(f"no committed partitions under {out_dir}")
    return rd.read_parquet(files)
