"""Unit tests for the round-4 late additions: grouped_corr (vs numpy),
rollup_sum (level consistency), funnel_counts (vs brute force), and
pca_project (vs a direct numpy PCA of the same quantized values)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_grouped_corr_matches_numpy(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.agg import grouped_corr

    rng = np.random.RandomState(7)
    g = rng.randint(0, 3, 400)
    x = rng.randint(1, 50, 400).astype(np.int64)
    y = (x * 3 + rng.randint(-20, 20, 400)).astype(np.int64)
    ds = rd.from_arrow(pa.table({"g": g.astype(np.int64), "x": x, "y": y})) \
        .repartition(5)
    out = grouped_corr(ds, "g", "x", "y").to_pandas() \
        .sort_values("g").reset_index(drop=True)
    assert len(out) == 3
    for _, row in out.iterrows():
        m = g == row.g
        expect = np.corrcoef(x[m], y[m])[0, 1]
        assert abs(row["corr"] - expect) < 1e-12
        assert row.n_rows == int(m.sum())
        assert row.sum_x == int(x[m].sum())


def test_grouped_corr_layout_invariant_bits(ray_session):
    """The corr doubles must be BIT-identical across block layouts (the
    property the SQL oracle parity relies on)."""
    import ray.data as rd

    from cutwed_ray.ops.agg import grouped_corr

    rng = np.random.RandomState(11)
    t = pa.table({"g": rng.randint(0, 2, 300).astype(np.int64),
                  "x": rng.randint(0, 100, 300).astype(np.int64),
                  "y": rng.randint(0, 1000, 300).astype(np.int64)})
    outs = []
    for parts in (1, 7):
        df = grouped_corr(rd.from_arrow(t).repartition(parts), "g", "x", "y") \
            .to_pandas().sort_values("g").reset_index(drop=True)
        outs.append(df["corr"].to_numpy().view(np.int64))
    assert np.array_equal(outs[0], outs[1])


def test_rollup_sum_levels_consistent(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.agg import rollup_sum

    rng = np.random.RandomState(3)
    a = np.array(["r1", "r2"])[rng.randint(0, 2, 200)]
    b = np.array(["n1", "n2", "n3"])[rng.randint(0, 3, 200)]
    v = rng.randint(0, 1000, 200).astype(np.int64)
    ds = rd.from_arrow(pa.table({"a": a, "b": b, "v": v})).repartition(4)
    out = rollup_sum(ds, ["a", "b"], "v").to_pandas()

    finest = out[(out.a != "ALL") & (out.b != "ALL")]
    mid = out[(out.a != "ALL") & (out.b == "ALL")]
    total = out[(out.a == "ALL") & (out.b == "ALL")]
    assert len(total) == 1
    assert total.v.iloc[0] == v.sum() == finest.v.sum()
    assert total.n_rows.iloc[0] == 200
    for _, row in mid.iterrows():
        kids = finest[finest.a == row.a]
        assert row.v == kids.v.sum()
        assert row.n_rows == kids.n_rows.sum()
    # every finest row matches a direct pandas groupby
    direct = pd.DataFrame({"a": a, "b": b, "v": v}).groupby(
        ["a", "b"], as_index=False).v.sum()
    merged = finest.merge(direct, on=["a", "b"], suffixes=("", "_direct"))
    assert (merged.v == merged.v_direct).all() and len(merged) == len(finest)


def _brute_funnel(df, stages):
    counts = []
    cur = df[df.t2 == stages[0]].groupby("u").ts.min()
    counts.append(len(cur))
    for s in stages[1:]:
        nxt = {}
        ev = df[df.t2 == s]
        for u, prev_t in cur.items():
            after = ev[(ev.u == u) & (ev.ts > prev_t)]
            if len(after):
                nxt[u] = after.ts.min()
        cur = pd.Series(nxt, dtype=np.int64)
        counts.append(len(cur))
    return counts


def test_funnel_counts_matches_bruteforce(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.window import funnel_counts

    rng = np.random.RandomState(5)
    n = 600
    df = pd.DataFrame({
        "u": rng.randint(0, 40, n).astype(np.int64),
        "t2": np.array(["A", "B", "C", "other"])[rng.randint(0, 4, n)],
        "ts": rng.randint(0, 10_000, n).astype(np.int64),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(6)
    out = funnel_counts(ds, key="u", type_col="t2", time="ts",
                        stages=["A", "B", "C"]).to_pandas() \
        .sort_values("funnel_stage").reset_index(drop=True)
    expect = _brute_funnel(df, ["A", "B", "C"])
    assert out.funnel_stage.tolist() == ["1_A", "2_B", "3_C"]
    assert out.n_keys.tolist() == expect
    # monotone non-increasing
    assert all(out.n_keys.iloc[i] >= out.n_keys.iloc[i + 1]
               for i in range(len(out) - 1))


def test_pca_project_matches_direct_numpy(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.pca import pca_project

    rng = np.random.RandomState(9)
    n, dim = 300, 8
    base = rng.randn(n, 2) @ rng.randn(2, dim) * 3 + rng.randn(n, dim) * 0.1
    t = pa.table({
        "vid": np.arange(n, dtype=np.int64),
        "emb": pa.array(list(base.astype(np.float32)),
                        pa.list_(pa.float32())),
    })
    out = pca_project(rd.from_arrow(t).repartition(5), ["vid"], "emb",
                      n_components=2).to_pandas() \
        .sort_values("vid").reset_index(drop=True)

    # direct numpy PCA of the SAME quantized values
    q = np.floor(base.astype(np.float32).astype(np.float64) * 1e6 + 0.5)
    qs = q / 1e6
    mean = qs.mean(axis=0)
    cov = np.cov(qs.T, bias=True)
    w, v = np.linalg.eigh(cov)
    comp = v[:, ::-1][:, :2]
    for j in range(2):
        i = int(np.argmax(np.abs(comp[:, j])))
        if comp[i, j] < 0:
            comp[:, j] = -comp[:, j]
    expect = (qs - mean) @ comp
    got = out[["pc1", "pc2"]].to_numpy()
    assert np.allclose(got, expect, atol=2e-6)
    # descending variance
    assert got[:, 0].var() >= got[:, 1].var()


def test_json_int_field_extraction():
    from cutwed_ray.ops.text import json_int_field

    t = pa.table({"props": ['{"k": 69}', '{"k":-3}', '{"j": 1}', None,
                            '{"k": 7, "j": 2}']})
    out = json_int_field(t, "k")
    assert out.column("k").to_pylist() == [69, -3, None, None, 7]
    assert out.schema.field("k").type == pa.int64()


def test_cms_sandwiches_exact_counts(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.agg import cms_token_counts

    rng = np.random.RandomState(13)
    vocab = [f"w{i}" for i in range(50)]
    docs = [" ".join(np.array(vocab)[rng.randint(0, 50, 30)])
            for _ in range(200)]
    ds = rd.from_arrow(pa.table({"text": docs})).repartition(4)
    candidates = vocab[:10] + ["absent_token"]
    out = cms_token_counts(ds, "text", candidates, width=1 << 12, depth=4) \
        .to_pandas()

    exact = pd.Series(" ".join(docs).split()).value_counts()
    n_total = 200 * 30
    eps_n = int(np.e / (1 << 12) * n_total) + 1
    for _, row in out.iterrows():
        true = int(exact.get(row.token, 0))
        assert row.est_count >= true          # CMS never undercounts
        assert row.est_count <= true + eps_n  # and overcounts are bounded
    assert out.token.tolist() == candidates   # input order preserved


def test_cms_layout_invariant(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.agg import cms_token_counts

    docs = [f"a b c d{i % 7}" for i in range(100)]
    outs = []
    for parts in (1, 5):
        ds = rd.from_arrow(pa.table({"text": docs})).repartition(parts)
        outs.append(cms_token_counts(ds, "text", ["a", "d3"], width=256,
                                     depth=3).to_pandas())
    assert outs[0].equals(outs[1])
