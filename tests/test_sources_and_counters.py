"""Series sources (SURVEY §2.4 parser analogues) + salt-cap counters."""

import numpy as np
import pyarrow as pa
import pytest


class TestSeriesSources:
    def test_from_numpy_roundtrip(self):
        from cutwed_ray.sources.series import from_numpy

        X = np.arange(12, dtype=float).reshape(3, 4)
        t = from_numpy(X)
        assert t.column("series").to_pylist()[1] == [4.0, 5.0, 6.0, 7.0]
        assert t.column("ts").to_pylist()[0] == [0.0, 1.0, 2.0, 3.0]

    def test_read_series_text(self, ray_session, tmp_path):
        from cutwed_ray.sources.series import read_series_text

        p = tmp_path / "control.txt"
        rows = [" ".join(f"{v:.3f}" for v in np.sin(np.arange(10) + i))
                for i in range(7)]
        p.write_text("\n".join(rows) + "\n")
        ds = read_series_text(str(p), sample_len=8)
        df = ds.to_pandas()
        assert len(df) == 7
        assert all(len(s) == 8 for s in df.series)

    def test_read_series_gz_columns_roundtrip(self, ray_session, tmp_path):
        """Gzip columnar round-trip (the reference's synthetic-index shape):
        lines = time steps, columns = series, fabricated unit time axis,
        sample_len truncation regenerates the axis."""
        import gzip

        from cutwed_ray.sources.series import read_series_gz_columns

        rng = np.random.RandomState(5)
        M = rng.randn(7, 3)                       # 7 time steps x 3 series
        p = tmp_path / "synthetic.data.gz"
        with gzip.open(p, "wt") as f:
            for row in M:
                f.write(" ".join(f"{v:.17g}" for v in row) + "\n")

        df = read_series_gz_columns(str(p)).to_pandas().sort_values(
            "series_id").reset_index(drop=True)
        assert len(df) == 3
        for i in range(3):
            assert np.allclose(df.series[i], M[:, i])
            assert np.allclose(df.ts[i], np.linspace(0, 1, 7))

        df2 = read_series_gz_columns(str(p), sample_len=4).to_pandas() \
            .sort_values("series_id").reset_index(drop=True)
        assert all(len(s) == 4 for s in df2.series)
        assert np.allclose(df2.ts[0], np.linspace(0, 1, 4))
        assert np.allclose(df2.series[2], M[:4, 2])

    def test_score_series_dataset_matches_batch(self, ray_session):
        """The distributed all-pairs series scorer equals twed_batch."""
        import ray.data as rd

        from cutwed_ray import twed_batch
        from cutwed_ray.sources.series import from_numpy, score_series_dataset

        rng = np.random.RandomState(3)
        X = rng.randn(10, 16)
        T = np.tile(np.arange(16, dtype=float), (10, 1))
        ds = rd.from_arrow(from_numpy(X))
        out = score_series_dataset(ds, 1.0, 1.0, 2).to_pandas()
        M = twed_batch(X, T, X, T, 1.0, 1.0, 2)
        assert len(out) == 45
        for _, r in out.iterrows():
            assert np.isclose(r.twed, M[int(r.id_a), int(r.id_b)], atol=1e-9)


class TestDroppedPairCounter:
    def test_salt_cap_reports_dropped(self, ray_session):
        """A hot block above max_block_size is salt-split; the exact dropped
        pair count must surface in run_er metrics (no silent caps)."""
        import ray.data as rd

        from cutwed_ray.pipelines.entity_resolution import default_config, run_er

        rng = np.random.RandomState(8)
        vocab = [f"w{i}" for i in range(200)]
        base = [vocab[i] for i in rng.randint(0, 200, 80)]
        rows = []
        for i in range(60):   # 60 distinct near-identical docs -> one hot block
            toks = list(base)
            toks[79] = f"uniq{i}"
            rows.append((f"r{i}", f"p{i}", f"c{i}", "python", " ".join(toks)))
        files = pa.table({
            "repo": pa.array([r[0] for r in rows], pa.string()),
            "path": pa.array([r[1] for r in rows], pa.string()),
            "commit": pa.array([r[2] for r in rows], pa.string()),
            "lang": pa.array([r[3] for r in rows], pa.string()),
            "content": pa.array([r[4] for r in rows], pa.string()),
        })
        cfg = default_config(threshold=0.25, max_block_size=16)
        res = run_er(rd.from_arrow(files), cfg, n_buckets=4)
        assert res.metrics.get("n_dropped_pairs", 0) > 0
        # pairs actually produced stay within the cap arithmetic
        assert res.metrics["n_pairs_scored"] > 0

    def test_no_cap_no_drop(self, ray_session):
        import ray.data as rd

        from cutwed_ray.corpus import generate_corpus
        from cutwed_ray.pipelines.entity_resolution import default_config, run_er

        files, _ = generate_corpus(400, seed=9)
        res = run_er(rd.from_arrow(files), default_config(threshold=0.25),
                     n_buckets=4)
        assert res.metrics.get("n_dropped_pairs", 0) == 0


def test_addids_matches_tokenize_identity():
    """AddIdsStage (light labeling, no tokenization) must produce the SAME
    row_id and sha256 as TokenizeStage — the id-compatibility invariant
    that lets outputs of either stage be joined/compared."""
    from cutwed_ray.corpus import generate_corpus
    from cutwed_ray.pipelines.entity_resolution import default_config
    from cutwed_ray.stages.tokenize import AddIdsStage, TokenizeStage

    files, _ = generate_corpus(50, seed=9)
    full = TokenizeStage(default_config())(files)
    light = AddIdsStage()(files)
    assert full.column("row_id").to_pylist() == light.column("row_id").to_pylist()
    assert full.column("sha256").to_pylist() == light.column("sha256").to_pylist()
