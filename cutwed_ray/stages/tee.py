"""Plasma tee: capture tokenized blocks as a side-channel of ONE execution.

The broadcast scoring strategy needs the tokenized corpus twice — as the
flat token store for the scorers and as the labeled output's row table —
while the blocking shuffle only needs light band rows.  Rather than
materializing the tokenized Dataset (a full barrier + an extra scan for
the explode stage + one more executor round-trip, all scale-independent
costs that cap scaling efficiency), the fused stage tokenizes, *tees* the
full tokenized block into plasma owned by a zero-CPU collector actor, and
emits the light band rows — so read -> tokenize -> explode -> shuffle ->
pairgen -> scoring is a single streaming execution.

Correctness of the side-channel:

* The ``add`` call is **synchronous** (the map task blocks on the actor
  ack): a map task completing guarantees its block is registered, and the
  sort-shuffle barrier guarantees every map task completed before any
  scoring task runs — so the store, built lazily on first scorer demand,
  always covers every row.
* Ray may retry a map task (worker loss, speculative execution); the
  collector dedupes blocks by a (row-count, xor-of-row-ids) fingerprint so
  a replayed block is registered once.
* Tee objects are created with ``_owner=collector`` so they survive the
  producing worker's exit; they live exactly as long as the collector
  handle (held by the scoring closure and by ``ERResult.keepalive``).

This is the plasma analogue of the reference's device-resident batch mode
(``twed_batch_dev``, /root/reference/src/cuTWED_core.h:504-690): series are
shipped to the "device" (object store) once, while per-call work arrives as
light index pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cutwed_ray.config import PipelineConfig
from cutwed_ray.stages.blocking import ExplodeBands
from cutwed_ray.stages.tokenize import TokenizeStage


def _block_fingerprint(t: pa.Table) -> tuple:
    """Cheap, deterministic block identity for retry dedup: (row count,
    xor of row_ids).  Collisions would need two *different* retried blocks
    with equal counts and xor — not possible for replays of the same task,
    which is the only duplication source."""
    rid = t.column("row_id").to_numpy()
    x = int(np.bitwise_xor.reduce(rid.view(np.uint64))) if len(rid) else 0
    return (len(t), x)


class TeeCollector:
    """Zero-CPU actor owning the tee'd tokenized blocks.

    ``add`` registers a block ref (wrapped in a list so Ray passes the ref
    itself, not the resolved table).  ``store`` builds the flat token store
    once, on first scorer demand — by then the shuffle barrier guarantees
    all blocks are in.  ``refs`` hands the block list to the labeling pass.
    """

    def __init__(self):
        self._refs: dict = {}
        self._bytes: int = 0
        self._store_ref = None
        self._store_sec: float = 0.0

    def add(self, fp: tuple, wrapped_ref: list, nbytes: int) -> int:
        if fp not in self._refs:
            self._refs[fp] = wrapped_ref[0]
            self._bytes += int(nbytes)
        return len(self._refs)

    def refs(self) -> list:
        return list(self._refs.values())

    def tee_bytes(self) -> int:
        return self._bytes

    def store(self):
        """Build (once) and return the ObjectRef of the flat token store.

        The assembly runs as a remote CPU task, not in this zero-CPU actor:
        the first scorer's demand only *launches* it, and the returned ref
        resolves when the task finishes — so the concat/put occupies a real
        CPU slot and this actor never holds a corpus-sized heap."""
        import time

        import ray

        from cutwed_ray.stages.scorer_broadcast import (
            _assemble_store_from_blocks)

        if self._store_ref is None:
            t0 = time.time()
            builder = ray.remote(num_cpus=1)(_assemble_store_from_blocks)
            self._store_ref = builder.remote(*self._refs.values())
            self._store_sec = time.time() - t0
        return self._store_ref

    def store_build_sec(self) -> float:
        return self._store_sec


def make_collector():
    import ray

    c = ray.remote(num_cpus=0)(TeeCollector).remote()
    # block until the actor is scheduled: ray.put(_owner=...) against a
    # not-yet-started actor hard-crashes the calling worker (observed)
    ray.get(c.tee_bytes.remote())
    return c


class TokenizeExplodeTee:
    """Fused map stage: tokenize the batch, tee the full tokenized block to
    the collector, return LIGHT band rows for the blocking shuffle.

    ``tee_drop`` names columns excluded from the tee'd block (e.g. drop
    ``content`` when the caller only needs the token store, not the final
    labeling pass) — the store build needs only (row_id, tokens)."""

    def __init__(self, cfg: PipelineConfig, n_buckets: int, collector,
                 tee_drop: tuple = ()):
        self.tok = TokenizeStage(cfg)
        self.explode = ExplodeBands(cfg, n_buckets, carry_tokens=False)
        self.collector = collector
        self.tee_drop = tuple(tee_drop)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import os
        import time

        import ray

        t0 = time.time()
        c0 = time.process_time()
        t = self.tok(batch)
        c1 = time.process_time()
        t1 = time.time()
        tee_t = t.drop_columns([c for c in self.tee_drop
                                if c in t.column_names]) if self.tee_drop else t
        try:
            ref = ray.put(tee_t, _owner=self.collector)
        except TypeError:  # _owner unsupported on this Ray version
            ref = ray.put(tee_t)
        t2 = time.time()
        # synchronous on purpose: task completion must imply registration
        # (the shuffle barrier then orders ALL registrations before any
        # scoring task) — a fire-and-forget add could still be in flight
        # when the store builds, silently dropping rows
        ray.get(self.collector.add.remote(
            _block_fingerprint(t), [ref], tee_t.nbytes))
        t3 = time.time()
        out = self.explode(t)
        if os.environ.get("CUTWED_TEE_TRACE"):
            with open(f"/tmp/tee_trace_{os.getpid()}.log", "a") as f:
                f.write(f"{len(batch)} tok={t1-t0:.3f} tokcpu={c1-c0:.3f} "
                        f"put={t2-t1:.3f} "
                        f"ack={t3-t2:.3f} explode={time.time()-t3:.3f}\n")
        return out


def make_scoring_fn_tee(collector, cfg: PipelineConfig):
    """Scoring fn for ``map_batches`` TASKS, store fetched from the
    collector (built lazily on the first scorer's demand) and cached
    per worker like ``scorer_broadcast.make_scoring_fn``."""
    import json

    key = ("tee", collector._actor_id.hex(),
           json.dumps(cfg.to_dict(), sort_keys=True))

    def score(batch: pa.Table) -> pa.Table:
        import ray

        from cutwed_ray.stages.scorer_broadcast import (
            _SCORER_SLOT, TwedScorerBroadcast)

        if _SCORER_SLOT[0] != key:
            store_ref = ray.get(collector.store.remote())
            _SCORER_SLOT[0] = key
            _SCORER_SLOT[1] = TwedScorerBroadcast(store_ref, cfg)
        return _SCORER_SLOT[1](batch)

    return score
