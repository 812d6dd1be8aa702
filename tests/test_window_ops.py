"""ops/window.py: lag_delta / running_sum vs a pandas brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events(n=400, keys=13, seed=7):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, keys, n).astype(np.int64),
        # coarse ts with deliberate (user, ts) ties to exercise the tiebreak
        "ts": rng.integers(0, 50, n).astype(np.int64) * 60_000_000,
        "v": rng.integers(-5, 100, n).astype(np.int64),
    })
    return df


def _brute_lag(df):
    df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    out = []
    for _, g in df.groupby("user_id", sort=False):
        t = g.ts.to_numpy()
        for i in range(1, len(g)):
            out.append((g.event_id.iloc[i], g.user_id.iloc[i],
                        int(t[i] - t[i - 1])))
    return pd.DataFrame(out, columns=["event_id", "user_id", "gap"])


def _brute_cumsum(df):
    df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    rows = []
    for _, g in df.groupby("user_id", sort=False):
        acc = 0
        for _, r in g.iterrows():
            acc += int(r.v)
            rows.append((r.event_id, r.user_id, acc))
    return pd.DataFrame(rows, columns=["event_id", "user_id", "running"])


def _canon(df):
    return (df.sort_values(list(df.columns)).reset_index(drop=True)
              .astype({c: np.int64 for c in df.columns}))


def test_lag_delta_matches_brute_force(ray_session):
    import ray.data as rd
    from cutwed_ray.ops.window import lag_delta

    df = _events()
    got = lag_delta(rd.from_pandas(df).repartition(7),
                    key="user_id", time="ts", tiebreak="event_id",
                    cols=["event_id", "user_id"], out_col="gap").to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(_brute_lag(df)))


def test_lag_delta_timestamp_micros(ray_session):
    """datetime64 time columns are differenced in exact epoch-us."""
    import ray.data as rd
    from cutwed_ray.ops.window import lag_delta

    df = pd.DataFrame({
        "event_id": np.int64([1, 2, 3]),
        "user_id": np.int64([5, 5, 5]),
        "ts": pd.to_datetime(["2024-01-01 00:00:00.000001",
                              "2024-01-01 00:00:00.000004",
                              "2024-01-01 00:00:01.000004"]),
    })
    got = lag_delta(rd.from_pandas(df), key="user_id", time="ts",
                    tiebreak="event_id", cols=["event_id"],
                    out_col="gap").to_pandas().sort_values("event_id")
    assert got.gap.tolist() == [3, 1_000_000]


def test_running_sum_matches_brute_force(ray_session):
    import ray.data as rd
    from cutwed_ray.ops.window import running_sum

    df = _events(seed=11)
    got = running_sum(rd.from_pandas(df).repartition(5),
                      key="user_id", time="ts", tiebreak="event_id",
                      value="v", cols=["event_id", "user_id"],
                      out_col="running").to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(_brute_cumsum(df)))


def test_window_rejects_nulls(ray_session):
    import ray.data as rd
    from cutwed_ray.ops.window import lag_delta

    t = pa.table({"event_id": pa.array([1, 2], pa.int64()),
                  "user_id": pa.array([1, None], pa.int64()),
                  "ts": pa.array([10, 20], pa.int64())})
    ds = lag_delta(rd.from_arrow(t), key="user_id", time="ts",
                   tiebreak="event_id", cols=["event_id"])
    with pytest.raises(Exception, match="null"):
        ds.materialize()


def test_grouped_rank_ntile_small_groups(ray_session):
    """n < k gives each row its own tile (SQL NTILE semantics); ranks are
    1-based per group."""
    import ray.data as rd

    from cutwed_ray.ops.window import grouped_rank_ntile

    t = pa.table({
        "g": pa.array(["a", "a", "a", "b", "b", "b", "b", "b"]),
        "v": pa.array([30, 10, 20, 5, 4, 3, 2, 1], pa.int64()),
        "i": pa.array(list(range(8)), pa.int64()),
    })
    out = (grouped_rank_ntile(rd.from_arrow(t).repartition(3),
                              group_col="g", order_col="v", tiebreak="i",
                              k=4, cols=["g", "v", "i"])
           .to_pandas().sort_values(["g", "rk"]).reset_index(drop=True))
    a = out[out.g == "a"]
    assert a["v"].tolist() == [10, 20, 30]
    assert a["rk"].tolist() == [1, 2, 3]
    assert a["tile"].tolist() == [1, 2, 3]          # n=3 < k=4
    b = out[out.g == "b"]
    assert b["v"].tolist() == [1, 2, 3, 4, 5]
    assert b["rk"].tolist() == [1, 2, 3, 4, 5]
    assert b["tile"].tolist() == [1, 1, 2, 3, 4]    # q=1, r=1: sizes 2,1,1,1


def test_grouped_rank_ntile_duplicate_pair_raises(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.window import grouped_rank_ntile

    t = pa.table({"g": pa.array(["a", "a"]),
                  "v": pa.array([1, 1], pa.int64()),
                  "i": pa.array([7, 7], pa.int64())})
    with pytest.raises(Exception, match="duplicate"):
        grouped_rank_ntile(rd.from_arrow(t), group_col="g", order_col="v",
                           tiebreak="i", k=2,
                           cols=["g", "v", "i"]).materialize()


def test_hourly_retention_brute_force(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.window import hourly_retention

    rng = np.random.default_rng(9)
    n = 400
    u = rng.integers(0, 25, n).astype(np.int64)
    ts = rng.integers(0, 10 * 3_600_000_000, n).astype(np.int64)
    t = pa.table({"user_id": pa.array(u, pa.int64()),
                  "ts": pa.array(ts.astype("datetime64[us]"),
                                 pa.timestamp("us"))})
    out = (hourly_retention(rd.from_arrow(t).repartition(4),
                            user_col="user_id", ts_col="ts")
           .to_pandas().set_index("hour_id").sort_index())
    h = ts // 3_600_000_000
    pairs = set(zip(u.tolist(), h.tolist()))
    for hour in sorted(set(h.tolist())):
        act = {uu for uu, hh in pairs if hh == hour}
        ret = {uu for uu in act if (uu, hour + 1) in pairs}
        assert out.loc[hour, "n_active"] == len(act)
        assert out.loc[hour, "n_retained"] == len(ret)


def test_rolling_mean_brute_force(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.window import rolling_mean

    rng = np.random.default_rng(13)
    n = 300
    k = rng.integers(0, 12, n).astype(np.int64)
    t = rng.integers(0, 10_000, n).astype(np.int64)
    i = np.arange(n, dtype=np.int64)
    v = rng.integers(-500, 500, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(k, pa.int64()), "t": pa.array(t, pa.int64()),
        "i": pa.array(i, pa.int64()), "v": pa.array(v, pa.int64())}))
    out = (rolling_mean(ds.repartition(4), key="k", time="t", tiebreak="i",
                        value="v", window_rows=3, cols=["k", "t", "i", "v"])
           .to_pandas().sort_values("i").reset_index(drop=True))
    import pandas as pd
    df = pd.DataFrame({"k": k, "t": t, "i": i, "v": v}) \
        .sort_values(["k", "t", "i"], kind="stable")
    want = (df.groupby("k")["v"]
              .rolling(3, min_periods=1).mean()
              .reset_index(level=0, drop=True))
    df["w"] = want
    df = df.sort_values("i").reset_index(drop=True)
    assert (out["rolling_mean"].to_numpy() == df["w"].to_numpy()).all()


def test_grouped_string_agg_order_and_nulls(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.window import grouped_string_agg

    t = pa.table({"k": pa.array([2, 1, 1, 2, 1], pa.int64()),
                  "v": pa.array(["b", "x", "a", "a", "x"]),
                  "t": pa.array([5, 3, 1, 4, 2], pa.int64()),
                  "i": pa.array([0, 1, 2, 3, 4], pa.int64())})
    out = (grouped_string_agg(rd.from_arrow(t).repartition(3), key="k",
                              value="v", order_cols=["t", "i"],
                              out_col="path")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["path"].tolist() == ["a,x,x", "a,b"]
    bad = pa.table({"k": pa.array([1], pa.int64()),
                    "v": pa.array([None], pa.string()),
                    "t": pa.array([1], pa.int64()),
                    "i": pa.array([0], pa.int64())})
    with pytest.raises(Exception, match="nulls"):
        grouped_string_agg(rd.from_arrow(bad), key="k", value="v",
                           order_cols=["t", "i"]).materialize()
