"""Unit tests for ops.agg (grouped quantiles, HLL) and the semi/anti join.

The oracle-parity test (test_queries_oracle.py) pins the DuckDB match for
the quantile and anti-join queries; these tests carry the independent
verification load — brute-force twins on random inputs and HLL accuracy
vs exact counts."""

import numpy as np
import pyarrow as pa
import pytest


# --------------------------------------------------------- pure quantile core
def test_quantile_disc_from_hist_matches_brute_force():
    from cutwed_ray.ops.agg import quantile_disc_from_hist

    rng = np.random.RandomState(7)
    for trial in range(50):
        vals = rng.randint(-50, 50, size=rng.randint(1, 40)).astype(np.int64)
        uniq, cnt = np.unique(vals, return_counts=True)
        s = np.sort(vals)
        n = len(s)
        qs = (0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
        got = quantile_disc_from_hist(uniq, cnt, qs)
        want = [int(s[max(1, min(int(np.ceil(q * float(n))), n)) - 1]) for q in qs]
        assert got == want, (trial, vals)


def test_quantile_disc_matches_duckdb_rule():
    """Pin the ceil(q*n)-1 rule against DuckDB directly on random data."""
    import duckdb

    from cutwed_ray.ops.agg import quantile_disc_from_hist

    rng = np.random.RandomState(11)
    con = duckdb.connect()
    for trial in range(10):
        vals = rng.randint(0, 1000, size=rng.randint(3, 200)).astype(np.int64)
        uniq, cnt = np.unique(vals, return_counts=True)
        qs = (0.25, 0.5, 0.75, 0.9, 0.99)
        got = quantile_disc_from_hist(uniq, cnt, qs)
        df = __import__("pandas").DataFrame({"x": vals})
        con.register("t", df)
        want = [con.sql(f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
                for q in qs]
        con.unregister("t")
        assert got == [int(w) for w in want], (trial, vals)


# -------------------------------------------------------- distributed wrapper
def test_grouped_quantiles_dataset(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.agg import grouped_quantiles

    rng = np.random.RandomState(3)
    g = rng.choice(["a", "b", "c"], size=500)
    v = rng.randint(0, 100, size=500).astype(np.int64)
    ds = rd.from_arrow(pa.table({"g": g, "v": v})).repartition(7)
    out = grouped_quantiles(ds, "g", "v", qs=(0.5, 0.9)).to_pandas()
    out = out.sort_values("g").reset_index(drop=True)
    for _, row in out.iterrows():
        s = np.sort(v[g == row.g])
        n = len(s)
        assert row.n_rows == n
        assert row.q50 == s[int(np.ceil(0.5 * n)) - 1]
        assert row.q90 == s[int(np.ceil(0.9 * n)) - 1]


def test_grouped_mode_dataset(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.agg import grouped_mode

    rng = np.random.RandomState(17)
    g = rng.choice(["a", "b"], size=400)
    v = rng.randint(0, 20, size=400).astype(np.int64)
    ds = rd.from_arrow(pa.table({"g": g, "v": v})).repartition(6)
    out = grouped_mode(ds, "g", "v").to_pandas().sort_values("g")
    for _, row in out.iterrows():
        vals, cnts = np.unique(v[g == row.g], return_counts=True)
        best = np.lexsort((vals, -cnts))[0]
        assert row.mode_value == vals[best] and row.mode_count == cnts[best]


# ------------------------------------------------------------------------ HLL
def test_hll_registers_merge_property():
    """Register arrays are mergeable: regs(A ∪ B) == max(regs(A), regs(B))."""
    from cutwed_ray.ops.agg import hll_registers

    rng = np.random.RandomState(5)
    a = rng.randint(0, 10**9, size=1000).astype(np.int64)
    b = rng.randint(0, 10**9, size=1000).astype(np.int64)
    ra, rb = hll_registers(a, p=10), hll_registers(b, p=10)
    rab = hll_registers(np.r_[a, b], p=10)
    assert (np.maximum(ra, rb) == rab).all()


@pytest.mark.parametrize("n", [100, 5000, 50000])
def test_hll_estimate_accuracy(n):
    from cutwed_ray.ops.agg import hll_estimate, hll_registers

    rng = np.random.RandomState(n)
    ids = rng.randint(0, 10**12, size=n * 2).astype(np.int64)[:n]
    exact = len(np.unique(ids))
    est = hll_estimate(hll_registers(ids, p=12))
    # p=12 -> rse ~1.6%; allow 6 sigma
    assert abs(est - exact) <= max(10, 0.1 * exact), (est, exact)


def test_hll_distinct_dataset_vs_exact(ray_session):
    import pandas as pd
    import ray.data as rd

    from cutwed_ray.ops.agg import hll_distinct

    rng = np.random.RandomState(9)
    g = rng.choice(["x", "y"], size=4000)
    ids = rng.randint(0, 800, size=4000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"g": g, "uid": ids})).repartition(5)
    out = hll_distinct(ds, "g", "uid", p=12).to_pandas()
    exact = pd.DataFrame({"g": g, "uid": ids}).groupby("g").uid.nunique()
    for _, row in out.iterrows():
        assert abs(row.approx_distinct - exact[row.g]) <= 0.1 * exact[row.g]


def test_hll_distinct_block_layout_invariant(ray_session):
    """Sketches are order- and partitioning-insensitive: different block
    layouts give the bit-identical estimate (fixture-oracle requirement)."""
    import ray.data as rd

    from cutwed_ray.ops.agg import hll_distinct

    rng = np.random.RandomState(21)
    g = rng.choice(["x", "y", "z"], size=3000)
    ids = rng.randint(0, 500, size=3000).astype(np.int64)
    t = pa.table({"g": g, "uid": ids})
    outs = []
    for parts in (1, 4, 13):
        ds = rd.from_arrow(t).repartition(parts)
        outs.append(hll_distinct(ds, "g", "uid", p=12).to_pandas()
                    .sort_values("g").reset_index(drop=True))
    assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])


# ------------------------------------------------------------- semi/anti join
def test_key_filter_join_semi_and_anti(ray_session):
    import pandas as pd
    import ray.data as rd

    from cutwed_ray.ops.joins import key_filter_join

    rng = np.random.RandomState(13)
    lk = rng.randint(0, 50, size=300).astype(np.int64)
    payload = rng.randint(0, 10**6, size=300).astype(np.int64)
    rk = rng.randint(25, 75, size=400).astype(np.int64)
    left = rd.from_arrow(pa.table({"k": lk, "p": payload})).repartition(3)
    right = rd.from_arrow(pa.table({"rk": rk})).repartition(4)

    have = set(rk.tolist())
    want_semi = pd.DataFrame({"k": lk, "p": payload})[
        np.isin(lk, list(have))].sort_values(["k", "p"]).reset_index(drop=True)
    want_anti = pd.DataFrame({"k": lk, "p": payload})[
        ~np.isin(lk, list(have))].sort_values(["k", "p"]).reset_index(drop=True)

    got_semi = (key_filter_join(left, right, left_key="k", right_key="rk",
                                left_cols=["k", "p"]).to_pandas()
                .sort_values(["k", "p"]).reset_index(drop=True))
    got_anti = (key_filter_join(left, right, left_key="k", right_key="rk",
                                left_cols=["k", "p"], anti=True).to_pandas()
                .sort_values(["k", "p"]).reset_index(drop=True))
    assert got_semi.equals(want_semi)
    assert got_anti.equals(want_anti)
    assert len(got_semi) + len(got_anti) == 300


def test_key_filter_join_rejects_null_keys(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.joins import key_filter_join

    left = rd.from_arrow(pa.table({"k": pa.array([1, None], pa.int64()),
                                   "p": pa.array([1, 2], pa.int64())}))
    right = rd.from_arrow(pa.table({"rk": pa.array([1], pa.int64())}))
    with pytest.raises(Exception, match="null"):
        key_filter_join(left, right, left_key="k", right_key="rk",
                        left_cols=["k", "p"]).to_pandas()


def test_global_quantile_and_threshold_filter(ray_session):
    import pandas as pd
    import ray.data as rd

    from cutwed_ray.ops.agg import (global_quantile_disc,
                                    quantile_threshold_filter)

    rng = np.random.RandomState(9)
    v = rng.randint(0, 500, size=4000).astype(np.int64)
    ids = np.arange(4000, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"id": ids, "v": v})).repartition(6)

    for q in (0.5, 0.9, 0.99):
        got = global_quantile_disc(ds, "v", q)
        s = np.sort(v)
        want = int(s[max(1, min(int(np.ceil(q * float(len(s)))), len(s))) - 1])
        assert got == want, (q, got, want)

    thr = global_quantile_disc(ds, "v", 0.9)
    out = (quantile_threshold_filter(ds, "v", 0.9, ["id", "v"])
           .to_pandas().sort_values("id").reset_index(drop=True))
    want_df = (pd.DataFrame({"id": ids, "v": v})[v >= thr]
               .sort_values("id").reset_index(drop=True))
    assert out.equals(want_df)


def test_bloom_prefilter_bit_parity(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.joins import key_filter_join

    rng = np.random.RandomState(21)
    lk = rng.randint(0, 2000, size=900).astype(np.int64)
    payload = np.arange(900, dtype=np.int64)
    rk = np.unique(rng.randint(0, 2000, size=300).astype(np.int64))
    left = rd.from_arrow(pa.table({"k": lk, "p": payload})).repartition(5)
    right = rd.from_arrow(pa.table({"rk": rk})).repartition(3)

    for anti in (False, True):
        plain = (key_filter_join(left, right, left_key="k", right_key="rk",
                                 left_cols=["k", "p"], anti=anti)
                 .to_pandas().sort_values(["k", "p"]).reset_index(drop=True))
        bloom = (key_filter_join(left, right, left_key="k", right_key="rk",
                                 left_cols=["k", "p"], anti=anti,
                                 bloom_bits=1 << 12)
                 .to_pandas().sort_values(["k", "p"]).reset_index(drop=True))
        assert bloom.equals(plain), f"anti={anti}"


def test_bloom_one_sided_guarantee():
    from cutwed_ray.ops.joins import bloom_from_keys, bloom_test

    rng = np.random.RandomState(4)
    present = np.unique(rng.randint(0, 10**9, size=5000).astype(np.int64))
    bits = bloom_from_keys(present, m_bits=1 << 16, k=4)
    # no false negatives, ever
    assert bloom_test(present, bits, 4).all()
    # false-positive rate is in the expected ballpark for m/n ~ 13 bits/key
    absent = np.arange(2 * 10**9, 2 * 10**9 + 20000, dtype=np.int64)
    fp = bloom_test(absent, bits, 4).mean()
    assert fp < 0.05, fp


def test_bloom_join_empty_right(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.joins import key_filter_join

    left = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                                   "p": pa.array([7, 8, 9], pa.int64())}))
    right = rd.from_arrow(pa.table({"rk": pa.array([], pa.int64())}))
    anti = (key_filter_join(left, right, left_key="k", right_key="rk",
                            left_cols=["k", "p"], anti=True,
                            bloom_bits=1 << 10)
            .to_pandas().sort_values("k").reset_index(drop=True))
    assert anti.k.tolist() == [1, 2, 3]
    semi = (key_filter_join(left, right, left_key="k", right_key="rk",
                            left_cols=["k", "p"], bloom_bits=1 << 10)
            .to_pandas())
    assert len(semi) == 0


def test_quantile_cont_from_hist_matches_duckdb():
    """Weighted-histogram interpolated quantiles == DuckDB quantile_cont
    over the expanded multiset, bit-exact (no tolerance) — 40 random
    histograms."""
    import duckdb

    from cutwed_ray.ops.agg import quantile_cont_from_hist

    con = duckdb.connect()
    rng = np.random.default_rng(11)
    qs = (0.25, 0.5, 0.75, 0.9, 0.99)
    for _ in range(40):
        nv = int(rng.integers(1, 50))
        v = np.sort(rng.choice(np.arange(-10**9, 10**9, 7919), nv,
                               replace=False)).astype(np.int64)
        c = rng.integers(1, 6, nv).astype(np.int64)
        expanded = np.repeat(v, c)
        con.execute("CREATE OR REPLACE TABLE t AS SELECT * FROM expanded")
        got = quantile_cont_from_hist(v, c, qs)
        for q, g in zip(qs, got):
            d = con.execute(
                f"SELECT quantile_cont(column0, {q}) FROM t").fetchone()[0]
            assert g == d, (q, g, d)


def test_grouped_quantiles_cont_brute_force(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.agg import (grouped_quantiles_cont,
                                    quantile_cont_from_hist)

    rng = np.random.default_rng(5)
    g = np.array(["a", "b", "c"])[rng.integers(0, 3, 500)]
    v = rng.integers(-1000, 1000, 500).astype(np.int64)
    ds = rd.from_arrow(pa.table({"g": g, "v": pa.array(v, pa.int64())}))
    out = (grouped_quantiles_cont(ds.repartition(4), "g", "v")
           .to_pandas().set_index("g").sort_index())
    for grp in "abc":
        vals = np.sort(v[g == grp])
        uq, cnt = np.unique(vals, return_counts=True)
        want = quantile_cont_from_hist(uq, cnt, (0.25, 0.5, 0.75, 0.9, 0.99))
        assert out.loc[grp, "n_rows"] == vals.size
        got = [out.loc[grp, f"qc{p}"] for p in (25, 50, 75, 90, 99)]
        assert got == want
