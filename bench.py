#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and prints ONE JSON line:

  {"metric": ..., "value": sec, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "er": {...pairs/sec...}}

Headline = the flagship entity-resolution pipeline (blocking + TWED
scoring + clustering) over the deterministic seeded synthetic code-repo
table (BASELINE.json input_hint schema), sized by the sf of GRAFT_SF_DIR
and cached as Parquet under /tmp.  Also times the flagship over the
testdata documents table plus representative operator queries.

`bench.py --scaling` runs the flagship at GRAFT_SCALE_LO/HI CPUs
(default 4/16) as GRAFT_SCALE_PAIRS back-to-back leg pairs in fresh
processes and reports the median per-pair efficiency (BASELINE.md
two-cluster-size criterion; pairing keeps both legs of each ratio inside
one host-throughput phase — see run_scaling and BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# Keep idle Ray workers alive between executions (must be set before
# ray.init).  On this host, guest memory is lazily backed: a worker's
# FIRST full-size task pays a multi-second page-fault storm faulting in
# its arena, so killing idle workers between bench passes re-pays that
# storm and makes min-of-N measure cold state.  A long-lived production
# cluster runs warm workers; this makes the bench measure the same thing.
os.environ.setdefault("RAY_kill_idle_workers_interval_ms", "0")

#: synthetic corpus rows per sf (sf parsed from the dir name); lengths are
#: log-normal around exp(5.5)~245 tokens so the quadratic TWED scoring is
#: the dominant compute (not fixed pipeline overhead)
CORPUS_ROWS = {"0.001": 2_000, "0.01": 20_000, "0.1": 120_000}
CORPUS_LOG_LEN = float(os.environ.get("GRAFT_BENCH_LOGLEN", "6.0"))


def _sf() -> str:
    for k in sorted(CORPUS_ROWS, key=len, reverse=True):
        if f"sf{k}" in SF_DIR:
            return k
    return "0.1"


def corpus_path(n_files: int) -> str:
    """Deterministic synthetic repo table, generated once (32 parallel Ray
    tasks) and cached under /tmp; requires Ray to be initialised."""
    out = f"/tmp/cutwed_ray_corpus/par_n{n_files}_L{CORPUS_LOG_LEN}_seed42"
    from cutwed_ray.corpus import write_corpus_parallel

    write_corpus_parallel(out, n_files, seed=42, mean_log_len=CORPUS_LOG_LEN)
    return out


#: representative operator queries the default bench sweep runs (order =
#: execution order); --queries a,b,c restricts the sweep to a subset.
BENCH_QUERIES = [
    "minhash_near_dup", "simhash_near_dup", "ngram_jaccard",
    "token_counts", "text_quality", "lineitem_pricing",
    "orders_by_segment", "supplier_region_revenue",
    "order_priority_revenue", "events_hourly",
    "events_hopping", "events_asof_order",
    "events_prev_hour", "knn_bruteforce", "knn_ivf",
    "exact_dedup", "repetition_signals",
    "embedding_kmeans", "events_value_quantiles",
    "customers_no_orders", "approx_user_counts",
    "events_lag_delta", "events_user_cumsum",
    "docs_stratified_sample", "top_tokens",
    "docs_redacted", "docs_contamination",
    "docs_tfidf_top3", "lineitem_corr",
    "region_nation_rollup", "events_funnel",
    "embedding_pca2", "events_props_stats",
    "approx_token_freq", "docs_pack_stats",
    "events_type_pivot", "events_value_outliers",
    "events_latest_per_user", "cust_spend_rank",
    "cust_profile", "order_ship_90d",
    "events_debounced", "events_value_share",
    "docs_chunk_stats", "events_contract",
    "events_schema_migrate", "events_value_ntile",
    "events_value_quantiles_cont", "order_fulfillment",
    "events_retention", "events_rolling_value", "events_user_journey",
    "media_image_real",
    "media_audio_energy",
]


def _prev_round_queries() -> dict[str, float]:
    """Per-query seconds from the LATEST driver-recorded BENCH_r*.json —
    the baseline for the per-query regression guard."""
    import glob
    import re

    best_n, path = -1, None
    here = os.path.dirname(os.path.abspath(__file__))
    for f in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", f)
        if m and int(m.group(1)) > best_n:
            best_n, path = int(m.group(1)), f
    if path is None:
        return {}
    try:
        with open(path) as fh:
            d = json.load(fh)
        # only comparable at the same scale factor + CPU count
        if float(d.get("sf", -1)) != float(_sf()) \
                or int(d.get("num_cpus", -1)) != NUM_CPUS:
            return {}
        return dict(d.get("queries") or {})
    except Exception:
        return {}


def _regressions(results: dict[str, float],
                 ratio: float = 1.5, floor_sec: float = 0.3) -> list[dict]:
    """Queries slower than ``ratio``x the previous round (prev >=
    ``floor_sec`` — sub-floor walls are executor-latency noise).  Walls on
    this box swing +-25% with ambient load: only trust a non-empty list
    from a cooled window (uptime 1-min load < 1)."""
    prev = _prev_round_queries()
    out = []
    for k, v in results.items():
        p = prev.get(k)
        if p is not None and p >= floor_sec and v > ratio * p:
            out.append({"query": k, "prev_sec": p, "now_sec": v,
                        "ratio": round(v / p, 2)})
    return out


def run_bench(only: set[str] | None = None) -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from cutwed_ray.pipelines import queries as Q
    from cutwed_ray.pipelines.entity_resolution import (
        default_config, run_er, score_pairs, tune_data_context)

    tune_data_context(NUM_CPUS)
    sf = _sf()
    n_files = int(os.environ.get("GRAFT_BENCH_N", CORPUS_ROWS[sf]))
    cpath = corpus_path(n_files)

    # GRAFT_BENCH_ER_ONLY=1 (scaling legs): only the headline ER pipeline —
    # skipping ~30 s of operator queries keeps BOTH legs of a scaling pair
    # inside one host-throughput phase (the phase-paired protocol's point)
    er_only = os.environ.get("GRAFT_BENCH_ER_ONLY") == "1"
    run_er_headline = only is None or "er_synthetic" in only

    # warm-up: page cache for inputs AND worker-process imports + the
    # compiled kernel (first pipeline execution otherwise pays ~1-2 s of
    # module imports in every Ray worker)
    if run_er_headline:
        rd.read_parquet(f"{cpath}/files").count()
    if not er_only:
        for t in ("documents", "lineitem", "events", "embeddings"):
            rd.read_parquet(f"{SF_DIR}/{t}.parquet").count()
    if run_er_headline:
        score_pairs(rd.read_parquet(f"{cpath}/files").limit(1000),
                    default_config(), n_buckets=8).count()

    results: dict[str, float] = {}
    extras: dict = {}

    # --- headline: flagship ER on the synthetic repo table ---
    # 6 bands x 3 minhash rows: for the long-doc bench corpus this keeps
    # same-entity blocking recall at 0.976 while shrinking hot chance-
    # collision bands (max block 21 vs 279 with 2-row bands) — the skew
    # that otherwise serializes one scorer task on 16% of all work.
    # Two passes, min taken: steady-state throughput, not warmup noise.
    cfg = default_config(threshold=0.25, scorer_concurrency=NUM_CPUS,
                         minhash_perms=18, minhash_bands=6)
    er_sec = float("inf")
    n_passes = int(os.environ.get("GRAFT_BENCH_PASSES", "2"))
    # bucket granularity: 12 buckets/CPU at EVERY cluster size (cooled
    # A/B sweep after the malloc tune: 4 CPUs 48 beats 8 buckets 33.4 vs
    # 40.9 s; 16 CPUs 192 beats 96, 11.1 vs 12.7 s; 32 CPUs 384 beats 64,
    # 10.3 vs 12.5 s — max scoring task drops 37.5 -> 8.2 s at 4 CPUs).
    # The round-2 'coarse buckets win' findings were an artifact of the
    # pre-retention allocator: under-filled scoring batches re-paid a
    # page-fault storm per task, which persistent scratch + malloc tuning
    # eliminated; with those fixed, task balance dominates and finer
    # buckets win until ~2x that (384@16 measured 12.8 s: under-fill
    # returns).  Scoring-task count follows reduce-block bundling, so the
    # read-block count (tune_data_context: 8 blocks/CPU) must rise with it.
    # Small corpora floor at ~300 rows/bucket (20k rows @ 8 CPUs: 32
    # buckets beat 96, 4.3 vs 4.6 s — shallow optimum, rows-bound).
    n_buckets = min(12 * NUM_CPUS, max(2 * NUM_CPUS, n_files // 300))
    if run_er_headline:
        for _ in range(n_passes):
            t0 = time.time()
            res = run_er(rd.read_parquet(f"{cpath}/files"), cfg,
                         n_buckets=n_buckets, strategy="broadcast")
            n_clusters_rows = res.clusters.count()
            er_sec = min(er_sec, time.time() - t0)
        results["er_synthetic"] = round(er_sec, 3)
        n_pairs = res.metrics.get("n_pairs_scored", 0)
        extras["er"] = {
            "n_files": n_files,
            "n_pairs_scored": n_pairs,
            "pairs_per_sec": round(n_pairs / er_sec, 1),
            "n_edges": res.metrics.get("n_edges"),
            "rows_labeled": n_clusters_rows,
        }

    if not er_only:
        # --- flagship over the testdata documents table ---
        if only is None or "er_documents" in only:
            t0 = time.time()
            Q.q_er_clusters_documents(SF_DIR).to_pandas()
            results["er_documents"] = round(time.time() - t0, 3)

        # --- representative operator queries ---
        for name in BENCH_QUERIES:
            if only is not None and name not in only:
                continue
            t0 = time.time()
            out = Q.QUERIES[name](SF_DIR)
            # consume without materializing to the driver more than needed
            out.count() if hasattr(out, "count") else len(out)
            results[name] = round(time.time() - t0, 3)

    ray.shutdown()

    headline = results.get("er_synthetic",
                           next(iter(results.values()), 0.0))
    return {
        "metric": "er_synthetic_wall_sec",
        "value": headline,
        "unit": "sec",
        "queries": results,
        "sf": float(sf),
        "num_cpus": NUM_CPUS,
        "regressions": _regressions(results),
        **extras,
    }


def _host_probe(secs: float = 0.6) -> dict:
    """Cheap host-health probe logged per scaling pair: single-core spin
    rate (arbitrary units, comparable across runs), steal%% during the
    spin, and DRAM copy bandwidth.  This guest's host oscillates through
    ~10-minute degraded phases invisible to guest loadavg (other tenants
    — shows up as lower spin/copy rates, sometimes steal); the probe lets
    the campaign table show WHICH pairs ran degraded."""
    import numpy as np

    def stat():
        return list(map(int, open("/proc/stat").readline().split()[1:]))

    a = stat()
    end = time.perf_counter() + secs
    n = 0
    x = 1
    while time.perf_counter() < end:
        for _ in range(10_000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        n += 10_000
    spin = n / secs / 1e6
    b = stat()
    d = [y - x for x, y in zip(a, b)]
    steal = d[7] / max(sum(d), 1) * 100
    buf = np.ones(64 << 20, dtype=np.uint8)
    t0 = time.perf_counter()
    dst = buf.copy()                       # fresh dest: first-touch faults
    fault_gbps = buf.nbytes * 2 / (time.perf_counter() - t0) / 1e9
    t0 = time.perf_counter()
    for _ in range(3):
        dst[:] = buf                       # preallocated dest: pure memcpy
    gbps = 3 * buf.nbytes * 2 / (time.perf_counter() - t0) / 1e9
    del buf, dst
    return {"spin": round(spin, 2), "steal_pct": round(steal, 2),
            "mem_gbps": round(gbps, 2), "fault_gbps": round(fault_gbps, 2)}


def run_scaling() -> dict:
    """Two-cluster-size criterion, phase-paired protocol.

    The host under this guest oscillates through ~10-minute throughput
    phases; a lo-leg and hi-leg measured in different phases corrupt the
    ratio in either direction.  So the legs run as back-to-back PAIRS
    (lo process then hi process, ~2-4 min total — inside one phase) and
    the reported efficiency is the MEDIAN of the per-pair ratios over
    GRAFT_SCALE_PAIRS pairs (default 3).  Each leg is a fresh process
    with GRAFT_BENCH_PASSES ER passes (default 2: first warms the
    prestarted workers, min is the steady-state measure).  A host-health
    probe (spin rate / steal / DRAM bandwidth) is recorded before each
    pair so degraded pairs are visible in the output.
    """
    def run(ncpu: int) -> dict:
        # scaling legs default to 2x the sf's corpus: the per-execution
        # fixed latency (session spin-up, store build, first-touch warm-up)
        # is scale-INDEPENDENT, so at the sf0.1 default (120k rows) it
        # floors the hi-CPU leg's wall and understates scaling; 240k
        # amortizes it (measured round 3/4: 4->16 median 0.64 at 120k vs
        # 0.80 at 240k with FLAT scoring core-seconds at both sizes)
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_ER_ONLY="1",
                   GRAFT_BENCH_N=os.environ.get(
                       "GRAFT_BENCH_N", str(2 * CORPUS_ROWS[_sf()])),
                   GRAFT_BENCH_PASSES=os.environ.get("GRAFT_BENCH_PASSES", "2"))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    # N -> 4N pair; 4/16 by default: at 32 CPUs the single shared memory
    # subsystem saturates (a real 4x-node cluster brings 4x DRAM channels),
    # which would understate multi-node scaling (see BASELINE.md)
    lo_cpus = int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi_cpus = int(os.environ.get("GRAFT_SCALE_HI", "16"))
    n_pairs = int(os.environ.get("GRAFT_SCALE_PAIRS", "3"))
    pairs = []
    lo = hi = None
    for _ in range(n_pairs):
        probe = _host_probe()
        lo = run(lo_cpus)
        hi = run(hi_cpus)
        ratio = (lo["value"] / hi["value"]) / (hi_cpus / lo_cpus)
        pairs.append({"eff": round(ratio, 3), "sec_lo": lo["value"],
                      "sec_hi": hi["value"], **probe})
    effs = sorted(p["eff"] for p in pairs)
    eff = effs[len(effs) // 2] if len(effs) % 2 else \
        (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo_cpus,
        "cpus_hi": hi_cpus,
        "sec_lo": min(p["sec_lo"] for p in pairs),
        "sec_hi": min(p["sec_hi"] for p in pairs),
        "pairs_detail": pairs,
        "n_files": lo.get("er", {}).get("n_files"),
        "pairs_per_sec_lo": lo.get("er", {}).get("pairs_per_sec"),
        "pairs_per_sec_hi": hi.get("er", {}).get("pairs_per_sec"),
        "queries_lo": lo["queries"],
        "queries_hi": hi["queries"],
        "sf": lo["sf"],
    }


def run_kernel() -> dict:
    """Reproduce the reference's published benchmark shape (BASELINE.md:
    100 upper-triangular pairs of 20,000-point float64 series — the
    synthetic_index notebook workload, reference CPU 0.18 pairs/s, cuTWED
    per-call GPU 1.37 pairs/s) on this engine's compiled kernel, fanned
    across cores with Ray tasks."""
    import numpy as np
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    n_series, n_pts = 15, 20_000            # C(15,2) = 105 pairs
    rng = np.random.RandomState(42)
    T = np.linspace(0, 1, n_pts)
    TS = np.sin(40 * T[None, :] * (1 + np.arange(n_series)[:, None])) \
        + rng.randn(n_series, n_pts) * 0.1
    TT = np.tile(T, (n_series, 1))
    lens = np.full(n_series, n_pts, dtype=np.int64)
    pool_ref = ray.put((TS[:, :, None], TT, lens))
    ia, ib = np.triu_indices(n_series, k=1)

    @ray.remote(num_cpus=1)
    def score(pa_idx, pb_idx):
        from cutwed_ray.kernel.batch import _sweep
        X, TX, L = ray.get(pool_ref)
        return _sweep(X, TX, L, X, TX, L, pa_idx, pb_idx, 1.0, 1.0, 2)

    # warm (compile + import)
    ray.get(score.remote(ia[:1], ib[:1]))
    t0 = time.time()
    chunk = max(1, len(ia) // (4 * NUM_CPUS))
    refs = [score.remote(ia[s:s + chunk], ib[s:s + chunk])
            for s in range(0, len(ia), chunk)]
    ray.get(refs)
    dt = time.time() - t0
    ray.shutdown()
    n_pairs = int(len(ia))
    return {
        "metric": "kernel_pairs_per_sec_20k",
        "value": round(n_pairs / dt, 2),
        "unit": "pairs/sec",
        "n_pairs": n_pairs,
        "series_len": n_pts,
        "wall_sec": round(dt, 2),
        "num_cpus": NUM_CPUS,
        "reference_cpu_pairs_per_sec": 0.18,
        "reference_gpu_per_call_pairs_per_sec": 1.37,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--kernel" in sys.argv:
        print(json.dumps(run_kernel()))
    else:
        only = None
        if "--queries" in sys.argv:
            # --queries a,b,c : run only that subset (er_synthetic /
            # er_documents included only if named) — the per-query
            # attribution tool for regression triage
            only = set(sys.argv[sys.argv.index("--queries") + 1].split(","))
            unknown = only - set(BENCH_QUERIES) \
                - {"er_synthetic", "er_documents"}
            if unknown:
                sys.exit(f"unknown bench queries: {sorted(unknown)}")
        print(json.dumps(run_bench(only)))
