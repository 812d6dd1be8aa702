"""Fused tee-broadcast path tests (stages/tee.py).

The tee fuses tokenize -> explode -> shuffle -> pairgen -> scoring into
ONE streaming execution while capturing the tokenized blocks as a plasma
side-channel; these tests pin its bit-parity against the carry strategy,
the budget fallback, re-execution idempotence, and broadcast-strategy
checkpoint resume.
"""

import json
import os
import shutil

import numpy as np
import pytest

from cutwed_ray.corpus import generate_corpus
from cutwed_ray.pipelines import entity_resolution as er
from cutwed_ray.pipelines.entity_resolution import default_config, run_er


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(600, seed=21)


def _cluster_df(res):
    return (res.clusters.select_columns(["row_id", "cluster_id"]).to_pandas()
            .sort_values("row_id").reset_index(drop=True))


def _pairs_df(res):
    return (res.pairs.select_columns(["id_a", "id_b", "twed"]).to_pandas()
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))


class TestTeeBroadcast:
    def test_run_er_tee_matches_carry(self, ray_session, corpus):
        import ray.data as rd

        files, _ = corpus
        cfg = default_config(threshold=0.25, broadcast_tee=True,
                             cluster_content=True)
        r_b = run_er(rd.from_arrow(files), cfg, n_buckets=8, strategy="broadcast")
        assert r_b.metrics["strategy"] == "broadcast"
        assert r_b.keepalive is not None, "tee collector must be kept alive"
        r_c = run_er(rd.from_arrow(files), cfg, n_buckets=8, strategy="carry")
        assert r_c.metrics["strategy"] == "carry"

        pb, pc_ = _pairs_df(r_b), _pairs_df(r_c)
        assert len(pb) == len(pc_)
        assert (pb.id_a.values == pc_.id_a.values).all()
        assert (pb.id_b.values == pc_.id_b.values).all()
        assert np.allclose(pb.twed.values, pc_.twed.values)

        cb, cc = _cluster_df(r_b), _cluster_df(r_c)
        assert (cb.row_id.values == cc.row_id.values).all()
        assert (cb.cluster_id.values == cc.cluster_id.values).all()
        # labeling pass reuses the tee'd blocks: full input schema survives
        assert "content" in r_b.clusters.schema().names
        assert "sha256" in r_b.clusters.schema().names

    def test_over_budget_streams_carry(self, ray_session, corpus):
        """broadcast + provably-over-budget input must run the carry path
        WITHOUT materializing the tokenized corpus (ADVICE r2 medium)."""
        import ray.data as rd

        files, _ = corpus
        cfg = default_config(threshold=0.25, broadcast_store_max_bytes=1,
                             broadcast_tee=True)
        res = run_er(rd.from_arrow(files), cfg, n_buckets=8, strategy="broadcast")
        assert res.metrics["strategy"] == "carry"
        assert res.keepalive is None
        cfg2 = default_config(threshold=0.25)
        ref = run_er(rd.from_arrow(files), cfg2, n_buckets=8, strategy="carry")
        cb, cc = _cluster_df(res), _cluster_df(ref)
        assert (cb.cluster_id.values == cc.cluster_id.values).all()

    def test_score_pairs_tee_reexecution_idempotent(self, ray_session, corpus):
        """Consuming the lazy tee pipeline twice re-tees blocks; the
        collector's fingerprint dedup must keep results identical."""
        import ray.data as rd

        files, _ = corpus
        cfg = default_config(threshold=0.25, broadcast_tee=True)
        pairs = er.score_pairs(rd.from_arrow(files), cfg, n_buckets=8,
                               strategy="broadcast")
        assert er.LAST_SCORE_STRATEGY == "broadcast"
        n1 = pairs.count()                      # execution 1
        df = pairs.to_pandas()                  # execution 2 (re-tees)
        assert n1 == len(df)
        assert not df[["id_a", "id_b"]].duplicated().any()

    def test_tee_store_guard_raises_on_missing_rows(self, ray_session):
        """The broadcast scorer hard-fails (never silently mis-scores) when
        the store lacks a pair's rows."""
        import ray

        import pyarrow as pa

        from cutwed_ray.stages.scorer_broadcast import TwedScorerBroadcast

        store = {"row_ids": np.array([5, 9], dtype=np.int64),
                 "starts": np.array([0, 3], dtype=np.int64),
                 "lens": np.array([3, 2], dtype=np.int64),
                 "values": np.arange(5, dtype=np.float32)}
        scorer = TwedScorerBroadcast(ray.put(store), default_config())
        bad = pa.table({"id_a": pa.array([5], pa.int64()),
                        "id_b": pa.array([7], pa.int64()),   # 7 not in store
                        "exact": pa.array([False])})
        with pytest.raises(RuntimeError, match="missing pair rows"):
            scorer(bad)


class TestBroadcastCheckpoint:
    def test_broadcast_resume_skips_completed_shards(self, ray_session, corpus,
                                                     tmp_path):
        """Kill-after-N-shards resume with strategy='broadcast' (VERDICT r2
        item 10): the rerun reproduces the identical pair set and scores the
        lost shard from the plasma store, not by re-carrying tokens."""
        import ray.data as rd

        files, _ = corpus
        ckpt = str(tmp_path / "ckpt_b")
        cfg = default_config(threshold=0.25, checkpoint_dir=ckpt)
        r1 = run_er(rd.from_arrow(files), cfg, n_buckets=8, n_shards=4,
                    strategy="broadcast")
        assert r1.metrics["strategy"] == "broadcast"
        p1 = _pairs_df(r1)

        man_path = os.path.join(ckpt, "manifest.json")
        with open(man_path) as f:
            man = json.load(f)
        del man["shards"]["1"]
        with open(man_path, "w") as f:
            json.dump(man, f)
        shutil.rmtree(os.path.join(ckpt, "pairs", "shard=1"))

        r2 = run_er(rd.from_arrow(files), cfg, n_buckets=8, n_shards=4,
                    strategy="broadcast")
        p2 = _pairs_df(r2)
        assert len(p1) == len(p2)
        assert (p1.id_a.values == p2.id_a.values).all()
        assert (p1.id_b.values == p2.id_b.values).all()
        assert np.allclose(p1.twed.values, p2.twed.values)

    def test_broadcast_checkpoint_matches_carry_checkpoint(self, ray_session,
                                                           corpus, tmp_path):
        import ray.data as rd

        files, _ = corpus
        cfg_b = default_config(threshold=0.25,
                               checkpoint_dir=str(tmp_path / "cb"))
        cfg_c = default_config(threshold=0.25,
                               checkpoint_dir=str(tmp_path / "cc"))
        rb = run_er(rd.from_arrow(files), cfg_b, n_buckets=8, n_shards=2,
                    strategy="broadcast")
        rc = run_er(rd.from_arrow(files), cfg_c, n_buckets=8, n_shards=2,
                    strategy="carry")
        pb, pc_ = _pairs_df(rb), _pairs_df(rc)
        assert len(pb) == len(pc_)
        assert (pb.id_a.values == pc_.id_a.values).all()
        assert np.allclose(pb.twed.values, pc_.twed.values)
