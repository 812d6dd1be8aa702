"""Resumable partitioned parquet sink (ops/sink.py)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mk(n=300):
    import ray.data as rd

    ids = np.arange(n, dtype=np.int64)
    lang = np.array(["en", "de", "fr"])[ids % 3]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "lang": pa.array(lang, pa.string()),
        "val": pa.array(ids * 7, pa.int64()),
    })).repartition(4)


def test_write_partitioned_commit_and_roundtrip(ray_session, tmp_path):
    from cutwed_ray.ops.sink import read_partitioned, write_partitioned

    out = str(tmp_path / "out")
    m = write_partitioned(_mk(), out, by="lang")
    assert sorted(m["written"]) == ["de", "en", "fr"]
    assert m["skipped"] == []
    assert sum(v["n_rows"] for v in m["written"].values()) == 300
    for v in ("en", "de", "fr"):
        assert os.path.exists(f"{out}/lang={v}/_SUCCESS")
        assert os.path.exists(f"{out}/lang={v}/_MANIFEST.json")
    back = (read_partitioned(out, "lang").to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    want = (_mk().to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(back[want.columns.tolist()], want)


def test_write_partitioned_resume_skips_committed(ray_session, tmp_path):
    import shutil

    from cutwed_ray.ops.sink import read_partitioned, write_partitioned

    out = str(tmp_path / "out")
    write_partitioned(_mk(), out, by="lang")
    # simulate a crash: one partition gone, one torn (no _SUCCESS)
    shutil.rmtree(f"{out}/lang=de")
    os.remove(f"{out}/lang=fr/_SUCCESS")
    mtime_en = os.path.getmtime(f"{out}/lang=en/chunk-00000.parquet")
    m = write_partitioned(_mk(), out, by="lang", resume=True)
    assert sorted(m["written"]) == ["de", "fr"]      # only the broken two
    assert m["skipped"] == ["en"]
    # committed partition untouched
    assert os.path.getmtime(f"{out}/lang=en/chunk-00000.parquet") == mtime_en
    back = (read_partitioned(out, "lang").to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    want = _mk().to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[want.columns.tolist()], want)


def test_write_partitioned_no_resume_rewrites_all(ray_session, tmp_path):
    from cutwed_ray.ops.sink import write_partitioned

    out = str(tmp_path / "out")
    write_partitioned(_mk(), out, by="lang")
    m = write_partitioned(_mk(), out, by="lang", resume=False)
    assert sorted(m["written"]) == ["de", "en", "fr"] and m["skipped"] == []


def test_write_partitioned_multifile_chunks(ray_session, tmp_path):
    from cutwed_ray.ops.sink import write_partitioned

    out = str(tmp_path / "out")
    m = write_partitioned(_mk(300), out, by="lang", max_rows_per_file=30)
    assert all(v["n_files"] == 4 for v in m["written"].values())  # 100/30


def test_hash_partition_col_deterministic():
    from cutwed_ray.ops.sink import hash_partition_col

    t = pa.table({"doc_id": pa.array(np.arange(50), pa.int64())})
    a = hash_partition_col(t, "doc_id", 8).column("part").to_numpy()
    b = hash_partition_col(t, "doc_id", 8).column("part").to_numpy()
    assert (a == b).all() and a.min() >= 0 and a.max() < 8
