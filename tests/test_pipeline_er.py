"""End-to-end entity-resolution pipeline tests (SURVEY.md §5 test plan 4-5).

Targets: pairwise F1 >= 0.99 on labeled same-block pairs, per-row sha256
invariant, checkpoint/resume determinism, distributed-vs-driver clustering
parity.
"""

import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from cutwed_ray.corpus import generate_corpus
from cutwed_ray.pipelines.entity_resolution import (
    default_config,
    pairwise_f1,
    run_er,
)

N_FILES = 1200


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(N_FILES, seed=42)


@pytest.fixture(scope="module")
def er_result(ray_session, corpus):
    import ray.data as rd

    files, truth = corpus
    cfg = default_config(threshold=0.25)
    res = run_er(rd.from_arrow(files), cfg, n_buckets=16)
    res.pairs = res.pairs.materialize()
    res.clusters = res.clusters.materialize()
    return res, files, truth, cfg


class TestERPipeline:
    def test_f1_target(self, er_result):
        res, files, truth, cfg = er_result
        ct = res.clusters.select_columns(["row_id", "cluster_id"]).to_pandas()
        ctbl = pa.table({
            "row_id": pa.array(ct.row_id.to_numpy(dtype="int64"), pa.int64()),
            "cluster_id": pa.array(ct.cluster_id.to_numpy(dtype="int64"), pa.int64()),
        })
        f1 = pairwise_f1(res.pairs, truth, files, cfg, clusters_tbl=ctbl)
        assert f1["n_labeled_pairs"] > 500
        assert f1["f1"] >= 0.99, f1

    def test_sha256_invariant(self, er_result):
        """Output rows carry sha256(content) equal to a fresh recomputation.

        Default clusters are LIGHT (no content column — content is ~95% of
        input bytes; carrying it through labeling duplicates the corpus at
        scale), so join content back from the source table by path."""
        res, files, truth, cfg = er_result
        assert "content" not in res.clusters.schema().names
        by_path = dict(zip(files.column("path").to_pylist(),
                           files.column("content").to_pylist()))
        out = res.clusters.select_columns(["path", "sha256"]).take(50)
        for row in out:
            digest = hashlib.sha256(by_path[row["path"]].encode()).hexdigest()
            assert digest == row["sha256"]

    def test_cluster_content_opt_in(self, ray_session):
        """cfg.cluster_content=True keeps the raw content column on the
        clusters output (both strategies), with the sha256 invariant held."""
        import ray.data as rd

        files, _ = generate_corpus(200, seed=13)
        for strategy in ("broadcast", "carry"):
            cfg = default_config(threshold=0.25, cluster_content=True)
            res = run_er(rd.from_arrow(files), cfg, n_buckets=8,
                         strategy=strategy)
            assert "content" in res.clusters.schema().names, strategy
            out = res.clusters.select_columns(["content", "sha256"]).take(20)
            for row in out:
                assert (hashlib.sha256(row["content"].encode()).hexdigest()
                        == row["sha256"]), strategy

    def test_all_rows_labeled(self, er_result):
        res, files, truth, cfg = er_result
        assert res.clusters.count() == files.num_rows
        assert "cluster_id" in res.clusters.schema().names

    def test_exact_duplicates_same_cluster(self, er_result):
        """Rows with identical content must land in the same cluster."""
        res, files, truth, cfg = er_result
        df = res.clusters.select_columns(["sha256", "cluster_id"]).to_pandas()
        nuniq = df.groupby("sha256")["cluster_id"].nunique()
        assert (nuniq == 1).all()

    def test_pairs_ordered_and_dedup(self, er_result):
        res, files, truth, cfg = er_result
        pt = res.pairs.select_columns(["id_a", "id_b"]).to_pandas()
        assert (pt.id_a < pt.id_b).all()
        assert not pt.duplicated().any(), "cross-band pair dedup failed"


class TestClusteringParity:
    def test_label_prop_matches_union_find(self, er_result):
        from cutwed_ray.stages.cluster import label_propagation, union_find_driver

        res, files, truth, cfg = er_result
        edges = res.pairs.filter(expr=f"twed_norm <= {cfg.threshold}")
        uf = union_find_driver(edges)
        lp = {int(r["node"]): int(r["label"])
              for r in label_propagation(edges, num_partitions=4).iter_rows()}
        assert lp == uf

    def test_overflow_path_matches_driver_path(self, ray_session):
        """Forcing max_driver_edges=0 exercises the at-scale branch
        (distributed label propagation + join-based labeling, no driver
        materialization); its cluster partition must equal the driver
        union-find path's."""
        import ray.data as rd

        files, _ = generate_corpus(300, seed=7)
        cfg_small = default_config(threshold=0.25)
        cfg_over = default_config(threshold=0.25, max_driver_edges=0)
        r1 = run_er(rd.from_arrow(files), cfg_small, n_buckets=8)
        r2 = run_er(rd.from_arrow(files), cfg_over, n_buckets=8)
        c1 = r1.clusters.select_columns(["row_id", "cluster_id"]).to_pandas() \
            .sort_values("row_id").reset_index(drop=True)
        c2 = r2.clusters.select_columns(["row_id", "cluster_id"]).to_pandas() \
            .sort_values("row_id").reset_index(drop=True)
        assert (c1.row_id.values == c2.row_id.values).all()
        assert (c1.cluster_id.values == c2.cluster_id.values).all()

    def test_numpy_cc_matches_union_find(self, er_result):
        import pandas as pd

        from cutwed_ray.stages.cluster import connected_components_arrays, union_find_driver

        res, files, truth, cfg = er_result
        edges = res.pairs.filter(expr=f"twed_norm <= {cfg.threshold}")
        uf = union_find_driver(edges)
        df = edges.select_columns(["id_a", "id_b"]).to_pandas()
        cc = connected_components_arrays(df.id_a.to_numpy(np.int64),
                                         df.id_b.to_numpy(np.int64))
        assert cc == uf


class TestCheckpointResume:
    def test_resume_skips_completed_shards(self, ray_session, corpus, tmp_path):
        """Kill-and-rerun determinism (SURVEY.md §7.4): second run with one
        shard invalidated reproduces the identical pair set."""
        import ray.data as rd

        files, truth = corpus
        ckpt = str(tmp_path / "ckpt")
        cfg = default_config(threshold=0.25, checkpoint_dir=ckpt)
        res1 = run_er(rd.from_arrow(files), cfg, n_buckets=16, n_shards=4)
        p1 = res1.pairs.select_columns(["id_a", "id_b", "twed"]).to_pandas()
        p1 = p1.sort_values(["id_a", "id_b"]).reset_index(drop=True)

        # simulate a lost shard: delete its output + manifest entry
        import json

        man_path = os.path.join(ckpt, "manifest.json")
        with open(man_path) as f:
            man = json.load(f)
        del man["shards"]["2"]
        with open(man_path, "w") as f:
            json.dump(man, f)
        shutil.rmtree(os.path.join(ckpt, "pairs", "shard=2"))

        res2 = run_er(rd.from_arrow(files), cfg, n_buckets=16, n_shards=4)
        p2 = res2.pairs.select_columns(["id_a", "id_b", "twed"]).to_pandas()
        p2 = p2.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        assert len(p1) == len(p2)
        assert (p1.id_a.values == p2.id_a.values).all()
        assert np.allclose(p1.twed.values, p2.twed.values)

    def test_stale_format_checkpoint_resets(self, ray_session, corpus,
                                            tmp_path):
        """A manifest predating the current checkpoint format (the
        tokenized schema contract changed when cluster_content landed) must
        RESET the artifacts: the rerun rewrites tokenized/ instead of
        appending mixed-era parquet files, and reproduces the identical
        pair set (ADVICE r3)."""
        import json

        import ray.data as rd

        files, truth = corpus
        ckpt = str(tmp_path / "ckpt3")
        cfg = default_config(threshold=0.25, checkpoint_dir=ckpt)
        res1 = run_er(rd.from_arrow(files), cfg, n_buckets=16, n_shards=2)
        p1 = res1.pairs.select_columns(["id_a", "id_b", "twed"]).to_pandas()
        p1 = p1.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        tok_dir = os.path.join(ckpt, "tokenized")
        n_tok_files = len(os.listdir(tok_dir))

        man_path = os.path.join(ckpt, "manifest.json")
        with open(man_path) as f:
            man = json.load(f)
        man.pop("format_version")          # simulate an older-code manifest
        with open(man_path, "w") as f:
            json.dump(man, f)

        res2 = run_er(rd.from_arrow(files), cfg, n_buckets=16, n_shards=2)
        p2 = res2.pairs.select_columns(["id_a", "id_b", "twed"]).to_pandas()
        p2 = p2.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        # reset, not append: same tokenized file count as a fresh run
        assert len(os.listdir(tok_dir)) == n_tok_files
        assert len(p1) == len(p2)
        assert (p1.id_a.values == p2.id_a.values).all()
        assert np.allclose(p1.twed.values, p2.twed.values)

    def test_config_change_invalidates(self, ray_session, corpus, tmp_path):
        import json

        import ray.data as rd

        files, truth = corpus
        ckpt = str(tmp_path / "ckpt2")
        cfg = default_config(threshold=0.25, checkpoint_dir=ckpt)
        run_er(rd.from_arrow(files), cfg, n_buckets=16, n_shards=2)
        with open(os.path.join(ckpt, "manifest.json")) as f:
            h1 = json.load(f)["config_hash"]
        cfg2 = default_config(threshold=0.1, checkpoint_dir=ckpt)
        run_er(rd.from_arrow(files), cfg2, n_buckets=16, n_shards=2)
        with open(os.path.join(ckpt, "manifest.json")) as f:
            h2 = json.load(f)["config_hash"]
        assert h1 != h2


class TestTopkNeighbors:
    def test_topk_matches_pandas_bruteforce(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from cutwed_ray.pipelines.entity_resolution import topk_twed_neighbors

        rng = np.random.RandomState(3)
        n_pairs = 500
        a = rng.randint(0, 60, n_pairs)
        b = rng.randint(0, 60, n_pairs)
        keep = a != b
        a, b = a[keep], b[keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        df = pd.DataFrame({"id_a": lo, "id_b": hi,
                           "twed_norm": rng.rand(lo.shape[0])}).drop_duplicates(
            subset=["id_a", "id_b"])
        t = pa.table({"id_a": pa.array(df.id_a.to_numpy(), pa.int64()),
                      "id_b": pa.array(df.id_b.to_numpy(), pa.int64()),
                      "twed_norm": pa.array(df.twed_norm.to_numpy(), pa.float64())})
        got = topk_twed_neighbors(rd.from_arrow(t), k=3).to_pandas()
        got = got.sort_values(["row_id", "rank"]).reset_index(drop=True)

        und = pd.concat([
            df.rename(columns={"id_a": "row_id", "id_b": "neighbor_id"}),
            df.rename(columns={"id_b": "row_id", "id_a": "neighbor_id"}),
        ])
        und = und.sort_values(["row_id", "twed_norm", "neighbor_id"])
        want = und.groupby("row_id").head(3)
        assert len(got) == len(want)
        w = want.sort_values(["row_id", "twed_norm", "neighbor_id"]).reset_index(drop=True)
        assert (got.row_id.values == w.row_id.values).all()
        assert (got.neighbor_id.values == w.neighbor_id.values).all()
        assert np.allclose(got.twed_norm.values, w.twed_norm.values)
        assert (got.groupby("row_id")["rank"].min() == 1).all()


class TestOutputSink:
    def test_output_dir_writes_clusters_and_metrics(self, ray_session, tmp_path):
        """run_er(output_dir=...) persists partitioned Parquet clusters +
        metrics.json; reading back matches the in-memory result."""
        import json

        import ray.data as rd

        files, _ = generate_corpus(200, seed=11)
        out = str(tmp_path / "er_out")
        res = run_er(rd.from_arrow(files), default_config(threshold=0.25),
                     n_buckets=8, output_dir=out)
        back = rd.read_parquet(os.path.join(out, "clusters"))
        assert back.count() == files.num_rows
        assert "cluster_id" in back.schema().names
        with open(os.path.join(out, "metrics.json")) as f:
            m = json.load(f)
        assert m["n_pairs_scored"] == res.metrics["n_pairs_scored"]
        # multiple files (partitioned output, never one giant file)
        import glob
        assert len(glob.glob(os.path.join(out, "clusters", "*.parquet"))) >= 1
