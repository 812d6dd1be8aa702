"""The flagship pipeline: blocking + TWED pair scoring + transitive clustering.

Lifecycle (BASELINE.json north_star; the Ray-Data re-expression of the
reference's batch entry point, SURVEY.md §3.2):

    read_parquet(repo_files)
      -> map_batches(TokenizeStage).materialize()   content -> token series
         (ONE materialization, reused for scoring AND the final labeling)
      -> [broadcast] token store assembled as K parallel shard tasks
         (plasma; a single concat task was a data-proportional serial
          gate on scoring start — scorers searchsorted per shard)
      -> central_pair_chunks remote task       band table -> candidate pairs
         (shuffle-FREE: broadcast mode is under a plasma byte budget by
          definition, so the band table fits one task; pairs come back as
          equal-cost longest-first chunks — no shuffle barrier/straggler)
      -> map_batches(score)                    elastic TASKS, store from plasma
      -> filter(twed_norm <= tau)              edges (single distributed pass)
      -> union-find (small) / distributed label propagation + join (large)
      -> write_parquet

Past ``central_pairgen_max_rows`` (or with ``cfg.central_pairgen=False``)
the broadcast strategy instead shuffles light band rows:
``map_batches(ExplodeBands)`` -> ``groupby(bucket).map_groups(PairGen)``
-> fused scoring, one streaming execution with no repartition barrier.
The carry strategy ships token lists through that shuffle and scores
inside the bucket tasks (ScoreBucket) — the beyond-store-budget path;
``strategy="broadcast"``/``"auto"`` self-guards on a byte budget and
falls back to carry.  With ``cfg.checkpoint_dir`` set, the tokenized
table and each scoring shard are checkpointed to Parquet with a manifest,
and a rerun skips completed shards (deterministic shard = bucket %
n_shards).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cutwed_ray.config import PipelineConfig, TwedConfig
from cutwed_ray.stages.blocking import ExplodeBands
from cutwed_ray.stages.scorer import ScoreBucket
from cutwed_ray.stages.tokenize import TokenizeStage
from cutwed_ray.stages.cluster import assign_clusters

#: pipeline default TWED params for token series in [0,1) with unit-step
#: timestamps: small nu keeps the time penalty subordinate to token costs
#: (calibrated on the seeded synthetic corpus; see tests/test_pipeline_er.py)
ER_TWED = TwedConfig(nu=0.01, lamb=1.0, degree=2)


def default_config(**kw) -> PipelineConfig:
    kw.setdefault("twed", ER_TWED)
    return PipelineConfig(**kw)


def tune_data_context(num_cpus: int) -> None:
    """Performance knobs (call once per session).

    Ray's default 200-way hash-shuffle parallelism spawns ~160 worker
    processes on a 32-CPU node (measured: worker churn + 2x slowdown);
    cap it near the CPU count.
    """
    from ray.data.context import DataContext

    ctx = DataContext.get_current()
    ctx.default_hash_shuffle_parallelism = max(8, min(64, 2 * num_cpus))
    # Ray's default read parallelism target of 200 blocks turns every
    # downstream map stage into ~200 tiny tasks (measured: the explode
    # stage spent 2.2 s wall on 0.7 core-s of work — pure scheduling);
    # 8 blocks/CPU keeps pipelining without the task-storm.  8 (not the
    # round-2 4): the scoring stage's task count follows reduce-block
    # bundling, and 8/CPU halves its straggler (16 CPUs: max task
    # 7.96 -> 5.15 s, wall 15.9 -> 14.6 s in the same cooled window)
    # while map stages bundle small blocks by batch_size anyway.
    ctx.read_op_min_num_blocks = max(8, min(256, 8 * num_cpus))
    ctx.enable_progress_bars = False


@contextmanager
def _shuffle_for(strategy: str):
    """Pick the shuffle strategy per scoring mode: HASH_SHUFFLE only for the
    carry strategy, whose blocking shuffle moves heavy token-list rows
    (measured ~2x over sort there); the broadcast strategy shuffles only
    light band rows, where the hash shuffle's per-execution aggregator-ACTOR
    startup (~2 s of fresh processes on a 16-CPU node) costs more than it
    saves — task-based sort shuffle wins (measured 16.2 s vs 18.5 s at 16
    CPUs, 52 s vs 54 s at 4)."""
    if strategy == "carry":
        with _hash_shuffle():
            yield
    else:
        yield


@contextmanager
def _hash_shuffle():
    """Scope the HASH_SHUFFLE strategy to the carry-mode blocking shuffle
    only: it is ~2x faster than the sort shuffle for heavy token-carrying
    rows on our coarse integer bucket key, but its per-execution
    aggregator-actor startup penalizes the many small groupbys elsewhere,
    so it must not leak into the global context.

    The shuffle parallelism is capped to the cluster CPU count — Ray's
    default of 200 requests ~64 aggregator actors, which deadlocks small
    clusters (observed on a 4-CPU test session) and churns ~160 worker
    processes on a 32-CPU node.
    """
    import ray
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    old_strat = ctx.shuffle_strategy
    old_par = ctx.default_hash_shuffle_parallelism
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.default_hash_shuffle_parallelism = max(4, min(64, cpus))
    try:
        yield
    finally:
        ctx.shuffle_strategy = old_strat
        ctx.default_hash_shuffle_parallelism = old_par


@dataclass
class ERResult:
    clusters: Any                 # Dataset: input cols + cluster_id
    pairs: Any                    # Dataset: scored candidate pairs
    metrics: dict = field(default_factory=dict)
    # tee-collector actor handle (broadcast strategy): it OWNS the plasma
    # blocks the lazy `clusters` dataset reads — must outlive consumption
    keepalive: Any = None


def _cfg_hash(cfg: PipelineConfig, extra: str = "") -> str:
    return hashlib.sha256((json.dumps(cfg.to_dict(), sort_keys=True) + extra).encode()).hexdigest()[:16]


def tokenize(ds, cfg: PipelineConfig):
    return ds.map_batches(TokenizeStage(cfg), batch_format="pyarrow")


#: strategy actually used by the last ``score_pairs`` call on this driver
#: ("carry" | "broadcast") — observability for the budget auto-fallback
LAST_SCORE_STRATEGY: str | None = None


def score_pairs(ds_files, cfg: PipelineConfig, n_buckets: int = 64,
                scorer_concurrency: int | None = None,
                strategy: str = "carry"):
    """files Dataset -> scored candidate-pair Dataset (streaming, no checkpoint).

    Two strategies:

    * ``"carry"`` (default, unbounded scale): token lists ride through the
      blocking shuffle; each bucket task generates AND scores its pairs.
    * ``"broadcast"`` (small-side store): tokens are collected into one
      flat store in plasma and mapped zero-copy by a ``map_batches`` scorer
      actor pool; the shuffle moves only light band rows (~25x fewer
      bytes).  Guarded by ``cfg.broadcast_store_max_bytes`` (default 25% of
      the object store): above the budget the call silently falls back to
      "carry" (see ``LAST_SCORE_STRATEGY``), so "broadcast" is safe to
      request unconditionally.  Measured bench-scale speedup is ~2x and
      scaling efficiency improves because the shuffle stops being the
      bottleneck.

    The carry scorer is an autoscaling actor pool (1, N): a FIXED pool of N
    would eagerly reserve N CPUs and can starve the upstream read/tokenize
    tasks on small clusters (observed deadlock with concurrency == num_cpus).
    """
    global LAST_SCORE_STRATEGY
    conc = scorer_concurrency or cfg.scorer_concurrency
    if strategy in ("broadcast", "auto"):
        # "auto" is an explicit alias: broadcast self-guards with the byte
        # budget and falls back to carry beyond it
        return _score_pairs_broadcast(ds_files, cfg, n_buckets, conc)
    LAST_SCORE_STRATEGY = "carry"
    tok = tokenize(ds_files, cfg)
    return _score_pairs_carry(tok, cfg, n_buckets, conc)


def _score_pairs_carry(tok, cfg: PipelineConfig, n_buckets: int, conc: int):
    """Carry-strategy scoring: tokens ride the shuffle; each bucket task
    generates AND scores its pairs.  Runs as elastic TASKS (ScoreBucket
    holds only the config — an autoscaling actor pool here ramps from 1
    and idles the cluster for the first half of the stage, measured in
    round 1)."""
    exploded = tok.map_batches(ExplodeBands(cfg, n_buckets), batch_format="pyarrow")
    scorer = ScoreBucket(cfg)

    def score_group(t: pa.Table, _sb=scorer) -> pa.Table:
        return _sb(t)

    return exploded.groupby("bucket").map_groups(
        score_group, batch_format="pyarrow", num_cpus=1)


def _store_budget_bytes(cfg: PipelineConfig) -> int:
    """Broadcast-store byte budget: explicit config, else 25% of the
    object store (the store is one object; leaving headroom keeps the
    shuffle + scorer outputs from spilling)."""
    if cfg.broadcast_store_max_bytes is not None:
        return cfg.broadcast_store_max_bytes
    import ray

    mem = ray.cluster_resources().get("object_store_memory", 4 << 30) \
        if ray.is_initialized() else 4 << 30
    return int(mem * 0.25)


#: logical-plan operators whose ``size_bytes()`` is metadata-only (no
#: execution): bare reads and already-in-memory inputs
_CHEAP_PLAN_OPS = {"Read", "InputData", "FromArrow", "FromPandas",
                   "FromNumpy", "FromItems", "FromBlocks"}


def _cheap_size_estimate(ds):
    """In-memory byte estimate of ``ds`` WITHOUT executing its plan, or
    None when any transform is present (``size_bytes()`` would then run
    the whole pipeline just to answer a pre-flight question).

    For parquet reads this is the decompressed-size estimate from file
    metadata — a conservative OVER-estimate of the token store (float32
    token series are ~0.7x their source text bytes)."""
    try:
        ops = [ds._logical_plan.dag]
        while ops:
            op = ops.pop()
            if type(op).__name__ not in _CHEAP_PLAN_OPS:
                return None
            ops.extend(op.input_dependencies)
        return ds.size_bytes()
    except Exception:
        return None


def _score_pairs_broadcast(ds_files, cfg: PipelineConfig, n_buckets: int,
                           conc: int):
    """Broadcast-strategy dispatch with the byte-budget guard applied at
    the cheapest possible point:

    * input size known from metadata and OVER budget -> carry, fully
      streaming (never materializes the tokenized corpus — the previous
      behavior materialized it just to discover it didn't fit);
    * within budget -> materialize the tokenized corpus (content dropped)
      and score with the store built in an OVERLAPPED remote task —
      measured faster than the fused tee path at both 4 and 16 CPUs
      (sf0.1: ~50 vs ~57 s and ~15 vs ~19 s); set ``cfg.broadcast_tee``
      to fuse everything into one execution instead;
    * size unknowable without executing (transformed input) -> the
      materialize-then-check path (the from_tok guard still falls back
      to carry beyond the budget).
    """
    global LAST_SCORE_STRATEGY
    est = _cheap_size_estimate(ds_files)
    if est is not None and est > _store_budget_bytes(cfg):
        LAST_SCORE_STRATEGY = "carry"
        return _score_pairs_carry(tokenize(ds_files, cfg), cfg, n_buckets, conc)
    if cfg.broadcast_tee and est is not None:
        pairs, _collector = _score_pairs_broadcast_tee(
            ds_files, cfg, n_buckets, tee_drop=("content",))
        return pairs
    tok = tokenize(ds_files, cfg).drop_columns(["content"]).materialize()
    return _score_pairs_broadcast_from_tok(tok, cfg, n_buckets, conc)


def _score_pairs_broadcast_tee(ds_files, cfg: PipelineConfig, n_buckets: int,
                               tee_drop: tuple = ()):
    """Fused single-execution broadcast scoring (stages/tee.py): the map
    stage tokenizes, tees the tokenized block into collector-owned plasma,
    and emits light band rows; scoring tasks build/fetch the flat store
    from the collector on first demand (the sort-shuffle barrier guarantees
    every tee registration happened first).  Returns (pairs_ds, collector);
    the collector handle must outlive every consumer of the tee'd blocks.
    """
    global LAST_SCORE_STRATEGY
    from cutwed_ray.stages.pairgen import PairGen
    from cutwed_ray.stages.tee import (
        TokenizeExplodeTee,
        make_collector,
        make_scoring_fn_tee,
    )

    LAST_SCORE_STRATEGY = "broadcast"
    collector = make_collector()
    fused = ds_files.map_batches(
        TokenizeExplodeTee(cfg, n_buckets, collector, tee_drop=tee_drop),
        batch_format="pyarrow")
    pair_gen = PairGen(cfg)

    def gen_pairs(t, _pg=pair_gen):
        return _pg(t)

    scored = (fused.groupby("bucket")
                   .map_groups(gen_pairs, batch_format="pyarrow")
                   .map_batches(make_scoring_fn_tee(collector, cfg),
                                batch_format="pyarrow",
                                batch_size=4 * cfg.score_batch_pairs,
                                num_cpus=1))
    return scored.drop_columns(["pair_max_len"]), collector


def _score_pairs_broadcast_from_tok(tok, cfg: PipelineConfig, n_buckets: int,
                                    conc: int):
    """Broadcast-strategy scoring over an already-materialized tokenized
    table (run_er reuses the same materialization for the labeling pass)."""
    global LAST_SCORE_STRATEGY
    import ray

    from cutwed_ray.stages.pairgen import PairGen
    from cutwed_ray.stages.scorer_broadcast import (
        build_token_store_async,
        make_scoring_fn,
    )

    # byte-budget guard: tok.size_bytes() (tokens dominate; conservative
    # over-estimate including the id/band/content columns) vs the budget —
    # beyond it the store would not fit plasma comfortably, so fall back to
    # the carry strategy, which streams at any scale
    if tok.size_bytes() > _store_budget_bytes(cfg):
        LAST_SCORE_STRATEGY = "carry"
        return _score_pairs_carry(tok, cfg, n_buckets, conc)
    LAST_SCORE_STRATEGY = "broadcast"

    # launched FIRST, awaited only inside the scoring tasks: the remote-task
    # concat overlaps with the candidate-generation stage below (was: a
    # serial driver-side concat + ray.put on the critical path)
    store_ref = build_token_store_async(tok)

    # shuffle-free candidate generation (default): broadcast mode already
    # pinned the whole token store in plasma, so the strictly-smaller band
    # table fits one remote task — pairs come back as n_buckets equal-cost
    # longest-first chunks and scoring is a flat map_batches over them
    # with NO shuffle barrier, reduce straggler, or task ramp (measured:
    # those three were the scoring stage's tail at 16 CPUs).  The row cap
    # keeps the single-task lexsort off the critical path for huge
    # in-budget corpora; past it, the bucketed sort-shuffle below runs.
    if (cfg.central_pairgen
            and tok.count() * cfg.minhash_bands <= cfg.central_pairgen_max_rows):
        from cutwed_ray.stages.pairgen import central_pair_chunks

        # stratified: S parallel tasks over disjoint block-key strata (block
        # atomicity under `block_key % S` keeps the union pair set
        # bit-identical) so the lexsort is not a serial critical-path term;
        # S scales with the cluster, bounded so each stratum stays meaty
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        # cap 4: each stratum task re-runs the (cheap) explode over every
        # block, so waste grows with strata; measured 240k/16: serial
        # 3.2-3.8 s -> 4-way 0.73-0.79 s, and the sort is no longer the
        # binding serial term between materialize and scoring start
        n_strata = max(1, min(4, cpus // 2))
        # floor 2: with num_returns=1 Ray would store the returned LIST as
        # the single object instead of unpacking it into per-chunk refs
        per = max(2, int(n_buckets) // n_strata)
        gen = ray.remote(num_cpus=1, num_returns=per)(central_pair_chunks)
        tok_refs = list(tok.to_arrow_refs())
        strata = [gen.remote(cfg, per, s, n_strata, *tok_refs)
                  for s in range(n_strata)]
        if per == 1:        # unreachable (floor 2), kept for clarity
            strata = [[r] for r in strata]
        # round-robin interleave so early-scheduled scoring tasks draw from
        # every stratum (each stratum's chunks are equal-cost internally)
        chunk_refs = [strata[s][c] for c in range(per)
                      for s in range(n_strata)]
        import ray.data as rd

        scored = rd.from_arrow_refs(chunk_refs).map_batches(
            make_scoring_fn(store_ref, cfg), batch_format="pyarrow",
            batch_size=None, num_cpus=1)
        return scored.drop_columns(["pair_max_len"])

    light = tok.map_batches(
        ExplodeBands(cfg, n_buckets, carry_tokens=False), batch_format="pyarrow")
    # the candidate-pair table is tiny (ids only): generate it with elastic
    # tasks (PairGen is stateless), then repartition fine-grained IN THE
    # SAME execution so the scoring stage gets many small balanced blocks
    pair_gen = PairGen(cfg)

    def gen_pairs(t, _pg=pair_gen):
        return _pg(t)

    # ONE streaming execution: blocking shuffle -> pair generation ->
    # task-based scoring fused onto the reduce outputs.  Scoring runs as
    # elastic TASKS (prestarted workers, no actor-pool process startup,
    # no deadlock risk against the live upstream), with the plasma-mapped
    # store cached per worker (make_scoring_fn) and batch-level slicing
    # for load balance; early buckets score while the shuffle tail is
    # still running.  NO repartition between pairgen and scoring — an
    # all-to-all there is a barrier that stalls scoring until every
    # bucket's pairs exist (measured +5-9 s at 16 CPUs for zero balance
    # benefit: the sort shuffle already yields many small partitions).
    scored = (light.groupby("bucket")
                   .map_groups(gen_pairs, batch_format="pyarrow")
                   .map_batches(make_scoring_fn(store_ref, cfg),
                                batch_format="pyarrow",
                                batch_size=4 * cfg.score_batch_pairs,
                                num_cpus=1))
    return scored.drop_columns(["pair_max_len"])


def link_er(ds_a, ds_b, cfg: PipelineConfig | None = None, n_buckets: int = 64,
            strategy: str = "carry"):
    """Record LINKAGE between two file tables (SURVEY.md §2.5 rectangular
    A x B product, done blocked instead of dense).

    Both sides go through the same blocking; candidate pairs are restricted
    to cross-dataset pairs *before* scoring (the side is encoded in the
    row_id's lowest bit, so no lookup/join is needed anywhere).  Returns the
    scored cross-pair Dataset with ``side_a``/``side_b`` columns
    (id_a's side / id_b's side; always different).
    """
    import dataclasses

    cfg = dataclasses.replace(cfg or default_config(), link_mode=True)

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "__side__", pa.array(np.full(len(t), side, dtype=np.int8), pa.int8()))
        return f

    ds = ds_a.map_batches(tag(0), batch_format="pyarrow").union(
        ds_b.map_batches(tag(1), batch_format="pyarrow"))
    with _shuffle_for(strategy):
        pairs = score_pairs(ds, cfg, n_buckets, strategy=strategy).materialize()

    def sides(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy() & 1
        b = t.column("id_b").to_numpy() & 1
        out = t.append_column("side_a", pa.array(a.astype(np.int8), pa.int8()))
        return out.append_column("side_b", pa.array(b.astype(np.int8), pa.int8()))

    return pairs.map_batches(sides, batch_format="pyarrow")


def run_er(ds_files, cfg: PipelineConfig | None = None, n_buckets: int = 64,
           n_shards: int = 8, output_dir: str | None = None,
           strategy: str = "carry") -> ERResult:
    """Run the full pipeline.  Resumable when cfg.checkpoint_dir is set."""
    cfg = cfg or default_config()
    t0 = time.time()
    metrics: dict[str, Any] = {"config_hash": _cfg_hash(cfg, f"b{n_buckets}")}

    global LAST_SCORE_STRATEGY
    tok = None            # tokenized Dataset for the labeling pass (or None)
    keepalive = None
    if cfg.checkpoint_dir:
        with _shuffle_for(strategy):
            pairs = _score_with_checkpoint(
                ds_files, cfg, n_buckets, n_shards, metrics, strategy)
        import ray.data as rd

        tok = rd.read_parquet(os.path.join(cfg.checkpoint_dir, "tokenized"))
    else:
        conc = cfg.scorer_concurrency
        broadcastish = strategy in ("broadcast", "auto")
        est = _cheap_size_estimate(ds_files) if broadcastish else None
        over_budget = est is not None and est > _store_budget_bytes(cfg)
        with _shuffle_for("carry" if not broadcastish or over_budget
                          else strategy):
            if (broadcastish and cfg.broadcast_tee and est is not None
                    and not over_budget):
                # fused tee path (opt-in, see PipelineConfig.broadcast_tee):
                # ONE streaming execution for tokenize -> shuffle -> pairgen
                # -> scoring; the tee'd tokenized blocks (content kept)
                # later serve the labeling pass with NO second corpus read
                # or tokenize barrier
                import ray
                import ray.data as rd

                pairs_lazy, collector = _score_pairs_broadcast_tee(
                    ds_files, cfg, n_buckets,
                    tee_drop=() if cfg.cluster_content else ("content",))
                pairs = pairs_lazy.materialize()
                refs = ray.get(collector.refs.remote())
                tok = rd.from_arrow_refs(refs) if refs else None
                keepalive = collector
            elif broadcastish and not over_budget:
                # default broadcast: materialize the tokenized corpus once
                # (reused by the labeling pass) and score with the store
                # built in an overlapped remote task; the from_tok guard
                # falls back to carry if the materialized size exceeds the
                # budget (covers the est-unknowable case too)
                t_tok = time.time()
                tok = tokenize(ds_files, cfg)
                if not cfg.cluster_content:
                    # content is ~95% of input bytes and only needed on the
                    # clusters output when opted in; the drop fuses into the
                    # tokenize task so content never lands in plasma — at
                    # 16-way this halves the materialize's first-touch
                    # fault volume (the dominant residual scaling tax)
                    tok = tok.drop_columns(["content"])
                tok = tok.materialize()
                metrics["tokenize_sec"] = round(time.time() - t_tok, 3)
                pairs = _score_pairs_broadcast_from_tok(
                    tok, cfg, n_buckets, conc).materialize()
            else:
                # carry (requested, or broadcast provably over budget)
                # stays FULLY streaming: tokens ride the shuffle and are
                # never pinned in plasma — the whole point of the
                # beyond-store-budget strategy (labeling re-derives ids
                # with the light AddIdsStage instead)
                LAST_SCORE_STRATEGY = "carry"
                pairs = _score_pairs_carry(
                    tokenize(ds_files, cfg), cfg, n_buckets, conc).materialize()
    metrics["score_sec"] = round(time.time() - t0, 3)
    metrics["strategy"] = LAST_SCORE_STRATEGY

    # counters + thresholded edges.  Small materialized pair tables (byte
    # size known from metadata, under a driver budget) are summarized
    # directly on the driver — one ray.get of already-local plasma blocks
    # beats an executor round-trip.  Bigger tables use ONE distributed
    # pass: each batch reduces to a 1-row summary with the edge ids as
    # list columns, so only counters + edges ever reach the driver.
    t1 = time.time()
    thr = cfg.threshold

    def summarize(t: pa.Table) -> pa.Table:
        ne = int(pc.sum(t.column("exact")).as_py() or 0)
        nd = (int(pc.sum(t.column("n_dropped_bucket")).as_py() or 0)
              if "n_dropped_bucket" in t.column_names else 0)
        eb = t.filter(pc.less_equal(t.column("twed_norm"), thr))
        ea = eb.column("id_a").combine_chunks()
        ebb = eb.column("id_b").combine_chunks()
        off = pa.array([0, len(eb)], pa.int32())
        return pa.table({
            "n_pairs": pa.array([len(t)], pa.int64()),
            "n_exact": pa.array([ne], pa.int64()),
            "n_dropped": pa.array([nd], pa.int64()),
            "edge_a": pa.ListArray.from_arrays(off, ea),
            "edge_b": pa.ListArray.from_arrays(off, ebb),
        })

    n_pairs = n_exact = n_dropped = n_edges = 0
    edge_a, edge_b = [], []
    overflow = False
    est_pairs = _cheap_size_estimate(pairs)
    if est_pairs is not None and est_pairs <= (64 << 20):
        # small materialized pair table: summarize on the driver directly —
        # one ray.get of already-local plasma blocks beats a whole executor
        # round-trip (identical counters/edges, just no extra execution)
        import ray

        tabs = [t for t in ray.get(list(pairs.to_arrow_refs())) if t.num_rows]
        for t in tabs:
            n_pairs += t.num_rows
            n_exact += int(pc.sum(t.column("exact")).as_py() or 0)
            if "n_dropped_bucket" in t.column_names:
                n_dropped += int(pc.sum(t.column("n_dropped_bucket")).as_py() or 0)
            eb = t.filter(pc.less_equal(t.column("twed_norm"), thr))
            n_edges += len(eb)
            if not overflow:
                edge_a.append(eb.column("id_a").to_numpy())
                edge_b.append(eb.column("id_b").to_numpy())
                if n_edges > cfg.max_driver_edges:
                    overflow = True
                    edge_a, edge_b = [], []
    else:
        summary = pairs.map_batches(summarize, batch_format="pyarrow",
                                    batch_size=1 << 18)
        for b in summary.iter_batches(batch_size=256, batch_format="pyarrow"):
            n_pairs += int(pc.sum(b.column("n_pairs")).as_py() or 0)
            n_exact += int(pc.sum(b.column("n_exact")).as_py() or 0)
            n_dropped += int(pc.sum(b.column("n_dropped")).as_py() or 0)
            ea = b.column("edge_a").combine_chunks().flatten().to_numpy()
            n_edges += ea.shape[0]
            if not overflow:
                edge_a.append(ea)
                edge_b.append(b.column("edge_b").combine_chunks().flatten().to_numpy())
                if n_edges > cfg.max_driver_edges:
                    overflow = True
                    edge_a, edge_b = [], []
    metrics["n_edges"] = n_edges

    # label the rows: reuse the tokenized table (row_id + sha256 already
    # computed, content preserved) — no second corpus read / re-hash.
    # Carry mode has no retained tokenized table; AddIdsStage re-derives
    # (row_id, sha256) from the raw files in a light streaming pass.
    if tok is not None:
        _tok_only = {"tokens", "n_tokens", "len_bucket"} | {
            f"band_{i}" for i in range(cfg.minhash_bands)}
        with_ids = tok.drop_columns(
            [c for c in tok.schema().names if c in _tok_only])
    else:
        from cutwed_ray.stages.tokenize import AddIdsStage

        with_ids = ds_files.map_batches(AddIdsStage(), batch_format="pyarrow")
        if not cfg.cluster_content:
            with_ids = with_ids.drop_columns(["content"])

    if overflow:
        # scale path: distributed label propagation over the edge Dataset,
        # labels joined onto the rows distributively — the label table
        # NEVER lands on the driver (it is O(corpus) in the worst case)
        from cutwed_ray.stages.cluster import assign_clusters_ds, label_propagation

        edges = pairs.filter(expr=f"twed_norm <= {cfg.threshold}")
        labels = label_propagation(edges).materialize()
        clustered = assign_clusters_ds(with_ids, labels)
        n_merges = labels.count()
    else:
        from cutwed_ray.stages.cluster import connected_components_arrays

        mapping = connected_components_arrays(
            np.concatenate(edge_a) if edge_a else np.zeros(0, dtype=np.int64),
            np.concatenate(edge_b) if edge_b else np.zeros(0, dtype=np.int64))
        clustered = assign_clusters(with_ids, mapping)
        n_merges = len(mapping)
    metrics["cluster_sec"] = round(time.time() - t1, 3)

    metrics["n_pairs_scored"] = n_pairs
    metrics["n_exact_pairs"] = n_exact
    if "n_dropped_bucket" in pairs.schema().names:
        # pairs sacrificed to the oversized-block salt cap (upper bound on
        # distinct pairs — see stages/pairgen.generate_block_pairs docstring)
        metrics["n_dropped_pairs"] = n_dropped
    metrics["n_cluster_merges"] = n_merges
    metrics["wall_sec"] = round(time.time() - t0, 3)

    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        clustered.write_parquet(os.path.join(output_dir, "clusters"))
        with open(os.path.join(output_dir, "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=2, default=str)
    return ERResult(clusters=clustered, pairs=pairs, metrics=metrics,
                    keepalive=keepalive)


def topk_twed_neighbors(pairs_ds, k: int = 5, n_buckets: int | None = None):
    """Per-row top-k nearest neighbors from the scored pair table
    (SURVEY.md §2.6: 'top-k nearest neighbors per file').

    Each undirected pair is emitted in both directions, shuffled on a
    COARSE bucket of the source id, and every bucket resolves all its
    sources' top-ks in one vectorized pandas pass (sort + groupby.head) —
    no per-source micro-groups.  Returns (row_id, neighbor_id, twed_norm,
    rank) with rank 1..k, ties broken by neighbor id.
    """
    import pandas as pd

    from cutwed_ray.stages.cluster import coarse_buckets

    n_buckets = n_buckets or coarse_buckets()

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy()
        b = t.column("id_b").to_numpy()
        d = t.column("twed_norm").to_numpy()
        src = np.r_[a, b]
        bkt = (src.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
               % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({
            "nbkt": pa.array(bkt, pa.int32()),
            "row_id": pa.array(src, pa.int64()),
            "neighbor_id": pa.array(np.r_[b, a], pa.int64()),
            "twed_norm": pa.array(np.r_[d, d], pa.float64()),
        })

    def topk_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["row_id", "twed_norm", "neighbor_id"], kind="stable")
        g = g.groupby("row_id", as_index=False, sort=False).head(k).copy()
        g["rank"] = (g.groupby("row_id", sort=False).cumcount() + 1).astype(np.int64)
        return g[["row_id", "neighbor_id", "twed_norm", "rank"]]

    return (pairs_ds.map_batches(both_dirs, batch_format="pyarrow")
                    .groupby("nbkt")
                    .map_groups(topk_bucket, batch_format="pandas"))


# ------------------------------------------------------------- checkpointing
def _score_with_checkpoint(ds_files, cfg, n_buckets, n_shards, metrics,
                           strategy: str = "carry"):
    """Shard-wise scoring with per-shard Parquet checkpoints + manifest.

    Layout: {ckpt}/tokenized/ (stage-1 columnar checkpoint),
    {ckpt}/pairs/shard={s}/ + {ckpt}/manifest.json with per-shard lineage
    (config hash, bucket range, row count, wall time).  A rerun with the
    same config hash skips completed shards — the deterministic
    bucket -> shard mapping makes shard outputs stable across retries
    (SURVEY.md §7.4 resumability).

    ``strategy="broadcast"``: the token store is assembled ONCE from the
    tokenized checkpoint and shared by every shard's scoring tasks; the
    per-shard shuffle then moves only light band rows (budget-guarded,
    falls back to carry beyond it — same contract as ``score_pairs``).
    """
    global LAST_SCORE_STRATEGY
    import ray.data as rd

    ckpt = cfg.checkpoint_dir
    os.makedirs(ckpt, exist_ok=True)
    man_path = os.path.join(ckpt, "manifest.json")
    tok_dir = os.path.join(ckpt, "tokenized")
    # the manifest records the checkpoint FORMAT alongside the config hash:
    # cluster_content decides whether the tokenized parquet carries the
    # content column, so resuming across a flag flip must never silently
    # mix schemas (ADVICE r3) — the config hash covers the flag, and any
    # mismatch resets the stale artifacts instead of appending new parquet
    # files next to old ones (write_parquet into a non-empty dir appends)
    manifest = {"config_hash": metrics["config_hash"],
                "format_version": 2,
                "cluster_content": bool(cfg.cluster_content),
                "shards": {}}
    if os.path.exists(man_path):
        with open(man_path) as f:
            old = json.load(f)
        if (old.get("config_hash") == manifest["config_hash"]
                and old.get("format_version") == manifest["format_version"]
                and old.get("cluster_content") == manifest["cluster_content"]):
            manifest = old
        else:
            # stale or older-format checkpoint: reset its artifacts so the
            # rerun starts clean rather than appending to mixed-era files
            import shutil

            shutil.rmtree(tok_dir, ignore_errors=True)
            shutil.rmtree(os.path.join(ckpt, "pairs"), ignore_errors=True)
    if not manifest.get("tokenized_done"):
        tok_w = tokenize(ds_files, cfg)
        if not cfg.cluster_content:
            # same contract as the in-memory path: the checkpoint (and the
            # clusters labeled from it) carries content only when opted in
            tok_w = tok_w.drop_columns(["content"])
        tok_w.write_parquet(tok_dir)
        manifest["tokenized_done"] = True
        _write_manifest(man_path, manifest)

    store_ref = None
    tok_mem = None
    todo = [s for s in range(n_shards)
            if not manifest["shards"].get(str(s), {}).get("done")]
    if strategy == "broadcast" and todo:
        from cutwed_ray.stages.scorer_broadcast import build_token_store_async

        tok_mem = rd.read_parquet(tok_dir).materialize()
        if tok_mem.size_bytes() <= _store_budget_bytes(cfg):
            store_ref = build_token_store_async(tok_mem)
        else:                       # over budget: carry per shard instead
            tok_mem = None
    LAST_SCORE_STRATEGY = "broadcast" if store_ref is not None else "carry"

    for s in range(n_shards):
        key = str(s)
        if manifest["shards"].get(key, {}).get("done"):
            continue
        t0 = time.time()
        tok = tok_mem if tok_mem is not None else rd.read_parquet(tok_dir)
        exploded = tok.map_batches(
            ExplodeBands(cfg, n_buckets, carry_tokens=store_ref is None),
            batch_format="pyarrow")
        def in_shard(t: pa.Table, _s=s, _n=n_shards) -> pa.Table:
            return t.filter(pa.array(t.column("bucket").to_numpy() % _n == _s))

        shard_rows = exploded.map_batches(in_shard, batch_format="pyarrow")
        if store_ref is not None:
            from cutwed_ray.stages.pairgen import PairGen
            from cutwed_ray.stages.scorer_broadcast import make_scoring_fn

            _pg = PairGen(cfg)

            def gen_pairs(t: pa.Table, _pg=_pg) -> pa.Table:
                return _pg(t)

            from cutwed_ray.stages.scorer import PAIR_SCHEMA

            pairs = (shard_rows.groupby("bucket")
                     .map_groups(gen_pairs, batch_format="pyarrow")
                     .map_batches(make_scoring_fn(store_ref, cfg),
                                  batch_format="pyarrow",
                                  batch_size=4 * cfg.score_batch_pairs,
                                  num_cpus=1)
                     # drop pair_max_len AND normalize to the carry scorer's
                     # column order so resumed runs mixing strategies read
                     # one uniform parquet schema
                     .select_columns(list(PAIR_SCHEMA.names)))
        else:
            _sb = ScoreBucket(cfg)

            def score_group(t: pa.Table, _sb=_sb) -> pa.Table:
                return _sb(t)

            pairs = shard_rows.groupby("bucket").map_groups(
                score_group, batch_format="pyarrow", num_cpus=1,
            )
        out_dir = os.path.join(ckpt, "pairs", f"shard={s}")
        tmp_dir = os.path.join(ckpt, "pairs", f"_tmp_shard={s}")
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)
        # pre-create: write_parquet of an EMPTY dataset (a shard whose
        # bucket ids are all elsewhere) writes no files and no directory,
        # and os.replace would then fail on the missing tmp_dir.
        os.makedirs(tmp_dir, exist_ok=True)
        pairs.write_parquet(tmp_dir)
        shutil.rmtree(out_dir, ignore_errors=True)
        os.replace(tmp_dir, out_dir)
        manifest["shards"][key] = {
            "done": True,
            "rows": None,
            "wall_sec": round(time.time() - t0, 3),
        }
        _write_manifest(man_path, manifest)

    metrics["resumed_shards"] = sum(
        1 for v in manifest["shards"].values() if v.get("done")
    )
    return rd.read_parquet(os.path.join(ckpt, "pairs"))


def _write_manifest(path: str, manifest: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, path)


# ------------------------------------------------------------------ metrics
def pairwise_f1(pairs_ds, truth_table: pa.Table, files_table: pa.Table,
                cfg: PipelineConfig, mapping: dict[int, int] | None = None,
                clusters_tbl: pa.Table | None = None) -> dict:
    """Pairwise F1 on labeled same-block pairs (FIXTURES.md F2).

    Candidate pairs = the pipeline's scored pairs (they share a block key by
    construction); is_match = same ground-truth entity_id; predicted = same
    final cluster.  Returns precision/recall/F1 for the *clustering* on the
    labeled pair set.
    """
    from cutwed_ray.stages.hashing import hash_string_array, splitmix64

    # ground-truth entity per row_id
    rid = np.zeros(truth_table.num_rows, dtype=np.uint64)  # viewed int64 below
    for c in ("repo", "path", "commit"):
        col = (truth_table if c in truth_table.column_names else files_table).column(c)
        rid = splitmix64(rid ^ hash_string_array(col))
    ent = truth_table.column("entity_id").to_numpy()
    rid2ent = dict(zip(rid.view(np.int64).tolist(), ent.tolist()))

    pt = pairs_ds.select_columns(["id_a", "id_b"]).to_pandas()
    ia = pt["id_a"].to_numpy(dtype=np.int64)
    ib = pt["id_b"].to_numpy(dtype=np.int64)

    if clusters_tbl is not None:
        cid = dict(zip(clusters_tbl.column("row_id").to_numpy().tolist(),
                       clusters_tbl.column("cluster_id").to_numpy().tolist()))
        pred_same = np.array([cid.get(int(a), int(a)) == cid.get(int(b), int(b))
                              for a, b in zip(ia, ib)])
    else:
        m = mapping or {}
        pred_same = np.array([m.get(int(a), int(a)) == m.get(int(b), int(b))
                              for a, b in zip(ia, ib)])
    true_same = np.array([rid2ent.get(int(a)) == rid2ent.get(int(b))
                          and rid2ent.get(int(a)) is not None
                          for a, b in zip(ia, ib)])

    tp = int((pred_same & true_same).sum())
    fp = int((pred_same & ~true_same).sum())
    fn = int((~pred_same & true_same).sum())
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-12)
    return {"tp": tp, "fp": fp, "fn": fn, "precision": prec, "recall": rec, "f1": f1,
            "n_labeled_pairs": int(len(ia))}
