"""Unit tests for ops.packing (global ordered prefix-scan, sequence
packing), ops.agg.pivot_counts and ops.agg.zscore_outliers.

The oracle-parity test (test_queries_oracle.py) pins the DuckDB match for
the shipped queries; these carry the independent verification load —
brute-force twins on random inputs, parallelism invariance, and the
error paths (duplicate scan keys, unknown pivot categories, nulls)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _scan_df(ds) -> pd.DataFrame:
    return ds.to_pandas().sort_values("k").reset_index(drop=True)


def test_ordered_prefix_sum_matches_numpy(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.packing import ordered_prefix_sum

    rng = np.random.RandomState(5)
    for parts in (1, 7):
        k = rng.permutation(2000).astype(np.int64)          # shuffled order
        v = rng.randint(0, 400, size=2000).astype(np.int64)
        ds = rd.from_arrow(pa.table({"k": k, "v": v})).repartition(parts)
        got = _scan_df(ordered_prefix_sum(
            ds, order_col="k", value_col="v", cols=["k", "v"],
            out_col="cum"))
        order = np.argsort(k, kind="stable")
        want = np.concatenate(([0], np.cumsum(v[order])[:-1]))
        assert (got["cum"].to_numpy() == want).all()
        assert (got["v"].to_numpy() == v[order]).all()


def test_ordered_prefix_sum_sparse_skewed_keys(ray_session):
    """Non-dense key domain (big gaps, one far outlier) still scans
    correctly — range buckets may be uneven but never wrong."""
    import ray.data as rd

    from cutwed_ray.ops.packing import ordered_prefix_sum

    k = np.array([3, 5, 9, 1_000_000, 2_000_000_000], dtype=np.int64)
    v = np.array([10, 20, 30, 40, 50], dtype=np.int64)
    ds = rd.from_arrow(pa.table({"k": k, "v": v})).repartition(3)
    got = _scan_df(ordered_prefix_sum(
        ds, order_col="k", value_col="v", cols=["k", "v"], out_col="cum"))
    assert got["cum"].tolist() == [0, 10, 30, 60, 100]


def test_ordered_prefix_sum_duplicate_keys_raise(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.packing import ordered_prefix_sum

    ds = rd.from_arrow(pa.table({"k": [1, 1, 2], "v": [1, 2, 3]}))
    with pytest.raises(Exception, match="duplicate"):
        ordered_prefix_sum(ds, order_col="k", value_col="v",
                           cols=["k"], out_col="cum").materialize()


def test_pack_stats_matches_brute_force(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.packing import pack_stats

    rng = np.random.RandomState(9)
    k = rng.permutation(500).astype(np.int64)
    v = rng.randint(1, 300, size=500).astype(np.int64)
    budget = 1000
    ds = rd.from_arrow(pa.table({"k": k, "v": v})).repartition(5)
    got = (pack_stats(ds, order_col="k", tokens_col="v", budget=budget)
           .to_pandas().sort_values("pack_id").reset_index(drop=True))

    order = np.argsort(k, kind="stable")
    excl = np.concatenate(([0], np.cumsum(v[order])[:-1]))
    pid = excl // budget
    want = (pd.DataFrame({"pack_id": pid, "v": v[order]})
            .groupby("pack_id", as_index=False)
            .agg(n_docs=("v", "size"), pack_tokens=("v", "sum")))
    assert got["pack_id"].tolist() == want["pack_id"].tolist()
    assert got["n_docs"].tolist() == want["n_docs"].tolist()
    assert got["pack_tokens"].tolist() == want["pack_tokens"].tolist()
    # every pack starts within budget of its boundary: first doc of pack p
    # has exclusive cumsum in [p*budget, (p+1)*budget)
    assert (got["pack_id"].to_numpy()
            == np.arange(got["pack_id"].iloc[0],
                         got["pack_id"].iloc[0] + len(got))).all()


def test_chunk_stats_matches_brute_force(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.packing import chunk_stats

    rng = np.random.RandomState(41)
    ids = np.arange(300, dtype=np.int64)
    n = rng.randint(0, 3000, size=300).astype(np.int64)   # incl. zeros
    n[::50] = 0
    ds = rd.from_arrow(pa.table({"id": ids, "n": n})).repartition(4)
    got = (chunk_stats(ds, id_col="id", tokens_col="n",
                       chunk_len=512, stride=384)
           .to_pandas().sort_values(["id", "chunk_id"])
           .reset_index(drop=True))
    rows = []
    for i, nt in zip(ids, n):
        c = 0
        while nt > 0 and c * 384 < nt and (c == 0 or (nt - 512) > (c - 1) * 384):
            rows.append((i, c, min(512, nt - c * 384)))
            c += 1
    want = pd.DataFrame(rows, columns=["id", "chunk_id", "chunk_tokens"])
    assert got["id"].tolist() == want["id"].tolist()
    assert got["chunk_id"].tolist() == want["chunk_id"].tolist()
    assert got["chunk_tokens"].tolist() == want["chunk_tokens"].tolist()
    # every chunk is 1..512 tokens and zero-token docs emit nothing
    assert got["chunk_tokens"].between(1, 512).all()
    assert not got["id"].isin(ids[::50]).any()


def test_contract_violations_counts(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.contract import contract_violations

    v = np.array([-1, 0, 5, -3, 2, 7], dtype=np.int64)
    k = np.array([1, 2, 3, 4, 5, 6], dtype=np.int64)
    ds = rd.from_arrow(pa.table({"k": k, "v": v})).repartition(3)
    out = contract_violations(ds, {
        "v_nonneg": lambda t: t.column("v").to_numpy() < 0,
        "v_small": lambda t: t.column("v").to_numpy() > 5,
    }).to_pandas().sort_values("constraint_name").reset_index(drop=True)
    assert out["constraint_name"].tolist() == ["v_nonneg", "v_small"]
    assert out["n_violations"].tolist() == [2, 1]
    assert out["n_checked"].tolist() == [6, 6]


def test_latest_per_key_validates_projection(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.window import latest_per_key

    ds = rd.from_arrow(pa.table({"k": [1], "t": [1], "v": [1]}))
    with pytest.raises(ValueError, match="must include key"):
        latest_per_key(ds, key="k", order_cols=["t"], cols=["k", "v"])


def test_ordered_prefix_sum_all_null_order_raises(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.packing import ordered_prefix_sum

    ds = rd.from_arrow(pa.table({
        "o": pa.array([None, None], pa.int64()),
        "v": pa.array([1, 2], pa.int64())}))
    with pytest.raises(Exception, match="nulls"):
        ordered_prefix_sum(ds, order_col="o", value_col="v",
                           cols=["o", "v"]).materialize()


def test_contract_null_semantics(ray_session, tmp_path):
    """NULL predicate = NOT a violation, matching SQL's COUNT(*) FILTER
    three-valued logic — verified end-to-end against the DuckDB oracle on
    a null-bearing events table (the live testdata has no nulls, so this
    is the only coverage of the divergence ADVICE r04 flagged)."""
    import duckdb
    import pyarrow.parquet as pq

    from cutwed_ray.pipelines.queries import SQL_EVENTS_CONTRACT, QUERIES

    ts = pa.array([np.datetime64("2024-01-05", "us"),
                   np.datetime64("2023-12-31", "us"), None,
                   np.datetime64("2024-01-20", "us")],
                  pa.timestamp("us"))
    t = pa.table({
        "ts": ts,
        "event_type": pa.array(["click", "bogus", None, "view"]),
        "value": pa.array([1.0, -2.0, None, 3.0], pa.float64()),
        "props": pa.array(['{"a":1}', "oops", None, "{}"]),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = (QUERIES["events_contract"](str(tmp_path)).to_pandas()
           .sort_values("constraint_name").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    exp = (con.execute(SQL_EVENTS_CONTRACT).df()
           .sort_values("constraint_name").reset_index(drop=True))
    for c in ["constraint_name", "n_violations", "n_checked"]:
        assert got[c].tolist() == exp[c].tolist(), c


def test_contract_bad_mask_shape_raises(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.contract import contract_violations

    ds = rd.from_arrow(pa.table({"v": [1, 2, 3]}))
    with pytest.raises(Exception, match="mask of shape"):
        contract_violations(ds, {
            "broken": lambda t: np.zeros(1, dtype=bool),
        }).materialize()


def test_global_rank_matches_argsort(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.packing import global_rank

    rng = np.random.RandomState(21)
    v = rng.randint(0, 50, size=600).astype(np.int64)     # many ties
    tb = rng.permutation(600).astype(np.int64)            # unique tiebreak
    ds = rd.from_arrow(pa.table({"v": v, "tb": tb})).repartition(5)
    got = (global_rank(ds, order_col="v", tiebreak="tb",
                       cols=["v", "tb"], out_col="r")
           .to_pandas().sort_values("r").reset_index(drop=True))
    order = np.lexsort((tb, v))
    assert got["r"].tolist() == list(range(600))
    assert (got["v"].to_numpy() == v[order]).all()
    assert (got["tb"].to_numpy() == tb[order]).all()


def test_latest_per_key_matches_pandas(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.window import latest_per_key

    rng = np.random.RandomState(23)
    n = 1200
    k = rng.randint(0, 60, size=n).astype(np.int64)
    t = rng.randint(0, 40, size=n).astype(np.int64)       # tied times
    eid = rng.permutation(n).astype(np.int64)             # unique tiebreak
    ds = rd.from_arrow(pa.table({"k": k, "t": t, "eid": eid})) \
        .repartition(7)
    got = (latest_per_key(ds, key="k", order_cols=["t", "eid"],
                          cols=["k", "t", "eid"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = (pd.DataFrame({"k": k, "t": t, "eid": eid})
            .sort_values(["k", "t", "eid"], kind="stable")
            .drop_duplicates(subset=["k"], keep="last")
            .sort_values("k").reset_index(drop=True))
    assert got["k"].tolist() == want["k"].tolist()
    assert got["t"].tolist() == want["t"].tolist()
    assert got["eid"].tolist() == want["eid"].tolist()


def test_pivot_counts_matches_crosstab(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.agg import pivot_counts

    rng = np.random.RandomState(13)
    cats = ["a", "b", "c"]
    k = rng.randint(0, 40, size=800).astype(np.int64)
    c = rng.choice(cats, size=800)
    ds = rd.from_arrow(pa.table({"k": k, "cat": c})).repartition(6)
    got = (pivot_counts(ds, "k", "cat", cats, total_col="n")
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = pd.crosstab(pd.Series(k, name="k"), pd.Series(c, name="cat")) \
        .reindex(columns=cats, fill_value=0)
    for cat in cats:
        assert (got[f"c_{cat}"].to_numpy()
                == want[cat].to_numpy().astype(np.int64)).all()
    assert (got["n"].to_numpy()
            == want.sum(axis=1).to_numpy().astype(np.int64)).all()


def test_pivot_counts_unknown_category_raises(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.agg import pivot_counts

    ds = rd.from_arrow(pa.table({"k": [1, 2], "cat": ["a", "zz"]}))
    with pytest.raises(Exception, match="outside the dictionary"):
        pivot_counts(ds, "k", "cat", ["a", "b"]).materialize()


def test_debounce_matches_pandas(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.window import debounce

    rng = np.random.RandomState(31)
    n = 900
    k = rng.randint(0, 40, size=n).astype(np.int64)
    t = rng.randint(0, 500, size=n).astype(np.int64)
    eid = rng.permutation(n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": k, "t": t, "eid": eid})).repartition(6)
    got = (debounce(ds, key="k", time="t", tiebreak="eid", min_gap=20,
                    cols=["eid", "k"])
           .to_pandas().sort_values("eid").reset_index(drop=True))
    df = (pd.DataFrame({"k": k, "t": t, "eid": eid})
          .sort_values(["k", "t", "eid"], kind="stable"))
    gap = df.groupby("k")["t"].diff()
    want = df[gap.isna() | (gap >= 20)].sort_values("eid") \
        .reset_index(drop=True)
    assert got["eid"].tolist() == want["eid"].tolist()


def test_grouped_share_matches_pandas(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.agg import grouped_share

    rng = np.random.RandomState(37)
    g = rng.choice(["a", "b", "c"], size=700)
    k = rng.randint(0, 25, size=700).astype(np.int64)
    v = rng.randint(1, 1000, size=700).astype(np.int64)
    ds = rd.from_arrow(pa.table({"g": g, "k": k, "v": v})).repartition(5)
    got = (grouped_share(ds, "g", "k", "v")
           .to_pandas().sort_values(["g", "k"]).reset_index(drop=True))
    df = pd.DataFrame({"g": g, "k": k, "v": v})
    sums = df.groupby(["g", "k"], as_index=False).agg(value_sum=("v", "sum"))
    tot = df.groupby("g")["v"].sum()
    sums["share"] = (sums["value_sum"].to_numpy().astype(np.float64)
                     / sums["g"].map(tot).to_numpy().astype(np.float64))
    sums = sums.sort_values(["g", "k"]).reset_index(drop=True)
    assert got["value_sum"].tolist() == sums["value_sum"].tolist()
    # bit identity of the division
    assert (got["share"].to_numpy().view(np.int64)
            == sums["share"].to_numpy().view(np.int64)).all()
    # shares per group sum to ~1
    ssum = got.groupby("g")["share"].sum()
    assert np.allclose(ssum.to_numpy(), 1.0, atol=1e-12)


def test_full_outer_sum_join_matches_pandas(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.joins import full_outer_sum_join

    rng = np.random.RandomState(29)
    lk = rng.randint(0, 30, size=400).astype(np.int64)
    lv = rng.randint(0, 100, size=400).astype(np.int64)
    rk = rng.randint(20, 50, size=300).astype(np.int64)   # partial overlap
    rv = rng.randint(0, 100, size=300).astype(np.int64)
    left = rd.from_arrow(pa.table({"k": lk, "a": lv})).repartition(4)
    right = rd.from_arrow(pa.table({"k": rk, "b": rv})).repartition(3)
    got = (full_outer_sum_join(left, right, left_key="k", right_key="k",
                               out_key="key", left_vals=["a"],
                               right_vals=["b"])
           .to_pandas().sort_values("key").reset_index(drop=True))
    lw = (pd.DataFrame({"key": lk, "a": lv}).groupby("key")
          .agg(n_left=("a", "size"), a=("a", "sum")))
    rw = (pd.DataFrame({"key": rk, "b": rv}).groupby("key")
          .agg(n_right=("b", "size"), b=("b", "sum")))
    want = lw.join(rw, how="outer").fillna(0).astype(np.int64) \
        .reset_index().sort_values("key").reset_index(drop=True)
    for c in ("key", "n_left", "a", "n_right", "b"):
        assert got[c].tolist() == want[c].tolist(), c


def test_audio_energy_matches_per_row_loop(ray_session):
    from cutwed_ray.ops.multimodal import AudioEnergyStage, synth_audio_table

    t = synth_audio_table(12)
    out = AudioEnergyStage(window=1024)(t).to_pandas() \
        .sort_values(["media_id", "window_id"]).reset_index(drop=True)
    rows = []
    for i in range(12):
        pcm = np.frombuffer(t.column("payload")[i].as_py(), dtype="<i2") \
            .astype(np.int64)
        for w0 in range(0, len(pcm), 1024):
            seg = pcm[w0:w0 + 1024]
            rows.append((i, w0 // 1024, len(seg), int((seg * seg).sum()),
                         int(np.abs(seg).max())))
    want = pd.DataFrame(rows, columns=["media_id", "window_id",
                                       "n_in_window", "energy", "peak"])
    for c in want.columns:
        assert out[c].tolist() == want[c].tolist(), c


def test_schema_migration_edges(ray_session):
    """apply_migration + cast_report on nulls / out-of-range / NaN / inf:
    nulls pass through uncounted, uncastables go NULL and count."""
    import ray.data as rd

    from cutwed_ray.ops.schema import CastSpec, apply_migration, cast_report

    t = pa.table({
        "i": pa.array([1, 2**31, -(2**31) - 1, None, -5], pa.int64()),
        "f": pa.array([2.0, 2.5, float("nan"), float("inf"), None],
                      pa.float64()),
        "ts": pa.array([np.datetime64("2024-01-02T03:00", "us"),
                        np.datetime64("1969-12-31T12:00", "us"),
                        None, np.datetime64("1970-01-01", "us"),
                        np.datetime64("2024-06-01", "us")],
                       pa.timestamp("us")),
        "s": pa.array(["ab", None, "xyz", "", "q"]),
    })
    specs = [CastSpec("i", "int32"), CastSpec("f", "int64_exact"),
             CastSpec("ts", "date", out_col="d"), CastSpec("s", "string")]
    ds = rd.from_arrow(t).repartition(2)
    mig = apply_migration(ds, specs).to_pandas()
    assert mig.columns.tolist() == ["i", "f", "d", "s"]
    assert mig["i"].tolist()[:2] == [1, None] or mig["i"].notna().sum() == 2
    rep = (cast_report(ds, specs).to_pandas()
           .set_index("column_name").sort_index())
    assert rep.loc["i", "n_violations"] == 2          # 2**31 and -2**31-1
    assert rep.loc["i", "n_ok"] == 2                  # 1 and -5
    assert rep.loc["i", "checksum"] == 1 + ((-5) % 1000003)
    assert rep.loc["f", "n_violations"] == 3          # 2.5, nan, inf
    assert rep.loc["f", "n_ok"] == 1 and rep.loc["f", "checksum"] == 2
    assert rep.loc["d", "n_violations"] == 0 and rep.loc["d", "n_ok"] == 4
    # days: 19724, -1 (floor of 1969-12-31T12:00), 0, 19875
    assert rep.loc["d", "checksum"] == (19724 + ((-1) % 1000003) + 0 + 19875)
    assert rep.loc["s", "n_ok"] == 4
    assert rep.loc["s", "checksum"] == 2 + 3 + 0 + 1


def test_decode_ppm_golden():
    from cutwed_ray.ops.multimodal import decode_ppm, ppm_block_features

    raster = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    img = decode_ppm(b"P6\n2 2\n255\n" + raster)
    assert img.shape == (2, 2, 3)
    assert img[0, 0, 0] == 255 and img[1, 1, 2] == 255
    # netpbm whitespace + comment handling
    img2 = decode_ppm(b"P6 # comment\n 2\t2 # w h\n255\n" + raster)
    assert (img2 == img).all()
    # 1x1 grid feature: mean gray of [255, 255, 255, 765] / 765
    f = ppm_block_features(img, 1)
    assert f.shape == (1,) and f[0] == 1530 / (765.0 * 4)
    # malformed inputs -> None, never raise
    assert decode_ppm(b"P5\n2 2\n255\n" + raster) is None
    assert decode_ppm(b"P6\n2 2\n255\n" + raster[:-1]) is None
    assert decode_ppm(b"P6\n2 2\n70000\n" + raster) is None
    assert decode_ppm(b"") is None


def test_media_image_real_decodes(ray_session):
    """End-to-end real PPM decode through the actor-pool stage: row 0
    (corrupt) -> decode_ok=0, every other row's features equal a direct
    decode_ppm + ppm_block_features computation."""
    from cutwed_ray.ops.multimodal import (decode_ppm, ppm_block_features,
                                           synth_ppm_table)
    from cutwed_ray.pipelines.queries import QUERIES

    out = (QUERIES["media_image_real"]("/root/testdata/sf0.001").to_pandas()
           .sort_values("media_id").reset_index(drop=True))
    assert len(out) == 256
    assert out.decode_ok.tolist() == [False] + [True] * 255
    t = synth_ppm_table(256, seed=42)
    fcols = [f"f{j:02d}" for j in range(16)]
    for mid in (1, 7, 255):
        img = decode_ppm(t.column("payload")[mid].as_py())
        want = ppm_block_features(img, 4)
        got = out.loc[out.media_id == mid, fcols].to_numpy()[0]
        np.testing.assert_array_equal(got, want)
    # corrupt row contributes zero features
    assert (out.loc[out.media_id == 0, fcols].to_numpy() == 0).all()


def test_dup_clusters_transitive_and_canonical(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.dedup import dup_clusters

    ids = np.arange(20, dtype=np.int64)
    corpus = rd.from_arrow(pa.table({"doc_id": ids}))
    # components: {1,3,5,7} (chain), {10,11}, singletons elsewhere
    pairs = rd.from_arrow(pa.table({"id_a": [1, 3, 5, 10],
                                    "id_b": [3, 5, 7, 11],
                                    "sim": [0.9, 0.9, 0.9, 0.9]}))
    out = (dup_clusters(corpus, pairs).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    lab = dict(zip(out.doc_id, out.dup_cluster_id))
    assert lab[1] == lab[3] == lab[5] == lab[7] == 1
    assert lab[10] == lab[11] == 10
    for i in ids:
        if i not in (1, 3, 5, 7, 10, 11):
            assert lab[i] == i
    canon = out[out.is_canonical == 1].doc_id.tolist()
    assert 1 in canon and 10 in canon
    assert 3 not in canon and 11 not in canon
    # exactly one canonical per cluster
    assert (out.groupby("dup_cluster_id")["is_canonical"].sum() == 1).all()


def test_dup_clusters_distributed_path_bit_equal(ray_session):
    """Past max_driver_edges the op auto-routes to distributed label
    propagation; labels must be bit-identical to the driver path."""
    import ray.data as rd

    from cutwed_ray.ops.dedup import dup_clusters

    rng = np.random.default_rng(7)
    ids = np.arange(200, dtype=np.int64)
    corpus = rd.from_arrow(pa.table({"doc_id": ids}))
    a = rng.integers(0, 200, 80).astype(np.int64)
    b = (a + rng.integers(1, 40, 80)).clip(max=199).astype(np.int64)
    keep = a != b
    pairs = rd.from_arrow(pa.table({"id_a": a[keep], "id_b": b[keep],
                                    "sim": np.full(int(keep.sum()), 0.9)}))
    drv = (dup_clusters(corpus, pairs).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    dist = (dup_clusters(corpus, pairs, max_driver_edges=0).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert drv.equals(dist)
    assert drv.dtypes.astype(str).tolist() == ["int64"] * 3


def test_zscore_outliers_matches_brute_force(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.agg import zscore_outliers

    rng = np.random.RandomState(17)
    g = rng.choice(["x", "y"], size=1000)
    v = rng.randint(0, 10_000, size=1000).astype(np.int64)
    # plant unmistakable outliers
    v[:3] = 1_000_000
    ds = rd.from_arrow(pa.table({"id": np.arange(1000, dtype=np.int64),
                                 "g": g, "v": v})).repartition(4)
    got = (zscore_outliers(ds, "g", "v", cols=["id", "g", "v"], z=2.0)
           .to_pandas().sort_values("id").reset_index(drop=True))

    df = pd.DataFrame({"id": np.arange(1000), "g": g, "v": v})
    keep = []
    for grp, sub in df.groupby("g"):
        n = np.float64(len(sub))
        s = np.float64(sub.v.sum())
        q = np.float64((sub.v.astype(object) ** 2).sum())
        mean = s / n
        sd = np.sqrt((n * q - s * s) / (n * n))
        vv = sub.v.to_numpy().astype(np.float64)
        keep.append(sub[(vv > mean + 2.0 * sd) | (vv < mean - 2.0 * sd)])
    want = pd.concat(keep).sort_values("id").reset_index(drop=True)
    assert got["id"].tolist() == want["id"].tolist()
    assert set(got["id"][:0]) == set()          # schema sanity
    assert {0, 1, 2} <= set(got["id"])          # planted outliers caught
