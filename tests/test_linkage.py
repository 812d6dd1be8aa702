"""Cross-dataset record linkage (SURVEY §2.5 rectangular A x B product)."""

import numpy as np
import pyarrow as pa
import pytest

from cutwed_ray.corpus import generate_corpus
from cutwed_ray.pipelines.entity_resolution import default_config, link_er


@pytest.fixture(scope="module")
def two_sides():
    """Side A = base corpus; side B = same entities re-rendered with edits
    (distinct paths so ids differ), plus extra unrelated rows."""
    rng = np.random.RandomState(23)
    files, truth = generate_corpus(600, seed=23)
    # side B: copy of side A rows with a token substituted and new paths
    texts = files.column("content").to_pylist()
    b_texts = []
    for t in texts:
        toks = t.split()
        toks[rng.randint(0, len(toks))] = "zz9"
        b_texts.append(" ".join(toks))
    b = pa.table({
        "repo": files.column("repo"),
        "path": pa.array([f"B/{p}" for p in files.column("path").to_pylist()],
                         pa.string()),
        "commit": files.column("commit"),
        "lang": files.column("lang"),
        "content": pa.array(b_texts, pa.string()),
    })
    return files, b, truth


def test_link_er_cross_only(ray_session, two_sides):
    import ray.data as rd

    a, b, truth = two_sides
    cfg = default_config(threshold=0.25)
    pairs = link_er(rd.from_arrow(a), rd.from_arrow(b), cfg, n_buckets=8)
    df = pairs.to_pandas()
    assert len(df) > 0
    # every pair crosses datasets
    assert ((df.side_a != df.side_b)).all()
    assert (((df.id_a.to_numpy() ^ df.id_b.to_numpy()) & 1) == 1).all()
    # most A rows find their B counterpart below threshold
    matched = df[df.twed_norm <= cfg.threshold]
    assert len(matched) >= 0.8 * a.num_rows


def test_broadcast_budget_fallback_bit_equal(ray_session, two_sides):
    """With a tiny store budget the broadcast strategy must auto-fall-back
    to carry (observable via LAST_SCORE_STRATEGY) and produce the identical
    pair set."""
    import ray.data as rd

    from cutwed_ray.pipelines import entity_resolution as er

    a, b, truth = two_sides
    files = rd.from_arrow(a)
    cfg = default_config(threshold=0.25)
    p1 = er.score_pairs(files, cfg, n_buckets=8, strategy="broadcast") \
        .to_pandas()
    assert er.LAST_SCORE_STRATEGY == "broadcast"
    cfg_tiny = default_config(threshold=0.25, broadcast_store_max_bytes=1)
    p2 = er.score_pairs(files, cfg_tiny, n_buckets=8, strategy="broadcast") \
        .to_pandas()
    assert er.LAST_SCORE_STRATEGY == "carry"
    k1 = p1.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    cols = [c for c in ["id_a", "id_b", "twed"] if c in p1.columns]
    k2 = p2.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(k1) == len(k2)
    assert (k1.id_a.values == k2.id_a.values).all()
    assert (k1.id_b.values == k2.id_b.values).all()
    assert np.allclose(k1.twed.values, k2.twed.values)


def test_empty_corpus_store(ray_session):
    """Zero-row corpus must build a valid empty store (no concat error)."""
    from cutwed_ray.stages.scorer_broadcast import _assemble_store

    store = _assemble_store([])
    assert store["row_ids"].shape == (0,)
    assert store["values"].shape == (0,)


def test_link_er_strategies_agree(ray_session, two_sides):
    import ray.data as rd

    a, b, truth = two_sides
    cfg = default_config(threshold=0.25)
    p1 = link_er(rd.from_arrow(a), rd.from_arrow(b), cfg, n_buckets=8,
                 strategy="carry").to_pandas()
    p2 = link_er(rd.from_arrow(a), rd.from_arrow(b), cfg, n_buckets=8,
                 strategy="broadcast").to_pandas()
    k1 = p1.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    k2 = p2[k1.columns].sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(k1) == len(k2)
    assert (k1.id_a.values == k2.id_a.values).all()
    assert np.allclose(k1.twed.values, k2.twed.values)


def test_central_pairgen_matches_shuffle_broadcast(ray_session, two_sides):
    """The shuffle-free central candidate generation (broadcast default)
    must produce the identical pair set, scores, exact flags and salt-cap
    drop total as the bucketed sort-shuffle broadcast path."""
    import ray.data as rd

    from cutwed_ray.pipelines import entity_resolution as er

    a, b, truth = two_sides
    files = rd.from_arrow(a)
    p1 = er.score_pairs(files, default_config(threshold=0.25),
                        n_buckets=8, strategy="broadcast").to_pandas()
    assert er.LAST_SCORE_STRATEGY == "broadcast"
    p2 = er.score_pairs(files,
                        default_config(threshold=0.25, central_pairgen=False),
                        n_buckets=8, strategy="broadcast").to_pandas()
    assert er.LAST_SCORE_STRATEGY == "broadcast"
    k1 = p1.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    k2 = p2.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(k1) == len(k2)
    assert (k1.id_a.values == k2.id_a.values).all()
    assert (k1.id_b.values == k2.id_b.values).all()
    assert (k1.exact.values == k2.exact.values).all()
    assert np.allclose(k1.twed.values, k2.twed.values)
    assert k1.n_dropped_bucket.sum() == k2.n_dropped_bucket.sum()


def test_checkpoint_resume_matches_central_pairgen(ray_session, two_sides,
                                                   tmp_path):
    """The checkpointed scoring path still runs the bucketed shuffle per
    shard, while the default in-memory broadcast path now uses shuffle-free
    central pairgen — the two must produce the identical pair set, scores
    and exact flags (VERDICT r3 item 7)."""
    import ray.data as rd

    from cutwed_ray.pipelines import entity_resolution as er

    a, b, truth = two_sides
    files = rd.from_arrow(a)
    p1 = er.score_pairs(files, default_config(threshold=0.25),
                        n_buckets=8, strategy="broadcast").to_pandas()
    assert er.LAST_SCORE_STRATEGY == "broadcast"

    ckpt = str(tmp_path / "ckpt_central")
    cfg = default_config(threshold=0.25, checkpoint_dir=ckpt)
    res = er.run_er(files, cfg, n_buckets=8, n_shards=3,
                    strategy="broadcast")
    p2 = res.pairs.to_pandas()

    k1 = p1.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    k2 = p2.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(k1) == len(k2) > 0
    assert (k1.id_a.values == k2.id_a.values).all()
    assert (k1.id_b.values == k2.id_b.values).all()
    assert (k1.exact.values == k2.exact.values).all()
    assert (k1.twed.values == k2.twed.values).all()


def test_stratified_central_pairgen_union_identical(two_sides):
    """S stratified central_pair_chunks calls must union to exactly the
    single-task pair set (blocks are atomic under block_key % S)."""
    import pandas as pd
    import pyarrow as pa

    from cutwed_ray.pipelines.entity_resolution import tokenize as _  # noqa: F401
    from cutwed_ray.stages.pairgen import central_pair_chunks
    from cutwed_ray.stages.tokenize import TokenizeStage

    a, b, truth = two_sides
    cfg = default_config(threshold=0.25)
    tok = TokenizeStage(cfg)(a)

    def collect(tbls):
        df = pa.concat_tables(tbls).to_pandas()
        return (df.sort_values(["id_a", "id_b"]).reset_index(drop=True),
                df.n_dropped_bucket.sum())

    single, drop1 = collect(central_pair_chunks(cfg, 7, 0, 1, tok))
    parts = []
    for s in range(3):
        parts.extend(central_pair_chunks(cfg, 3, s, 3, tok))
    strat, drop3 = collect(parts)
    assert len(single) == len(strat) > 0
    for col in ("id_a", "id_b", "exact", "block_key"):
        assert (single[col].values == strat[col].values).all(), col
    assert drop1 == drop3


def test_sharded_store_scoring_bit_equal(ray_session, two_sides):
    """A K-sharded token store must score bit-identically to the
    single-shard store (the shard layout only changes WHERE rows live,
    never the padded pools the kernel sees), and the per-worker slot
    cache must survive cloudpickle (module state, not closure globals)."""
    import ray

    from cutwed_ray.stages.scorer_broadcast import (
        TwedScorerBroadcast, _assemble_store, build_token_store_async)
    from cutwed_ray.stages.tokenize import TokenizeStage

    a, b, truth = two_sides
    cfg = default_config(threshold=0.25)
    tok = TokenizeStage(cfg)(a)
    # single store vs 4 shards assembled from interleaved block slices
    blocks = [tok.slice(i * 150, 150) for i in range(4)]
    single = TwedScorerBroadcast(ray.put(_assemble_store(blocks)), cfg)
    sharded = TwedScorerBroadcast(
        [ray.put(_assemble_store([t])) for t in blocks], cfg)
    ids = tok.column("row_id").to_numpy()
    rng = np.random.RandomState(7)
    n = 300
    pairs = pa.table({
        "id_a": pa.array(ids[rng.randint(0, len(ids), n)], pa.int64()),
        "id_b": pa.array(ids[rng.randint(0, len(ids), n)], pa.int64()),
        "exact": pa.array([False] * n, pa.bool_()),
    })
    s1 = single(pairs).column("twed").to_numpy()
    s2 = sharded(pairs).column("twed").to_numpy()
    assert (s1 == s2).all()

    # async builder path (shards capped at the block count)
    import ray.data as rd
    ds = rd.from_arrow(blocks)
    refs = build_token_store_async(ds, n_shards=3)
    assert isinstance(refs, list) and len(refs) == 3
    via_async = TwedScorerBroadcast(refs, cfg)
    s3 = via_async(pairs).column("twed").to_numpy()
    assert (s1 == s3).all()
