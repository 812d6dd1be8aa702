"""Broadcast-store TWED scorer: pairs in, scores out, tokens from plasma.

The small-side-broadcast variant of the scoring stage: when the tokenized
corpus fits a byte budget (default 25% of the object store — the pipeline
auto-falls-back to the carry strategy above it, see
``entity_resolution._score_pairs_broadcast``), the flat token store is
assembled ONCE — in a remote task, so the concat overlaps with candidate
generation and never lands on the driver — and every scorer actor maps it
zero-copy from plasma in ``__init__``.  The blocking shuffle then only
moves light band rows (ids + 64-bit keys), ~25x less than carrying token
lists (stages/scorer.py remains the carry path for corpora beyond the
budget).

This is also the closest analogue of the reference's device-resident batch
mode (twed_batch_dev, /root/reference/src/cuTWED_core.h:504-690): "series
already on device" == "store already in plasma", with per-call index pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cutwed_ray.config import PipelineConfig
from cutwed_ray.stages.hashing import _ranges


def _assemble_store(tables) -> dict:
    """Concat (row_id, tokens) Arrow blocks into the flat store layout:
    row_ids sorted int64, per-row (start, len) into a float32 value buffer
    — lookups via searchsorted, all zero-copy views once in plasma."""
    ids_l, vals_l, lens_l = [], [], []
    for t in tables:
        if t.num_rows == 0:
            continue
        tok = t.column("tokens")
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        ids_l.append(t.column("row_id").to_numpy())
        off = np.asarray(tok.offsets, dtype=np.int64)
        lens_l.append(off[1:] - off[:-1])
        vals_l.append(np.asarray(tok.values, dtype=np.float32))
    if not ids_l:                      # empty corpus: a valid empty store
        return {"row_ids": np.zeros(0, np.int64), "starts": np.zeros(0, np.int64),
                "lens": np.zeros(0, np.int64), "values": np.zeros(0, np.float32)}
    ids = np.concatenate(ids_l)
    lens = np.concatenate(lens_l)
    vals = np.concatenate(vals_l)
    # values stay in arrival order — the lookup arrays (sorted by id) carry
    # each row's (start, len) so no 100s-of-MB re-gather is needed
    starts = np.zeros(ids.shape[0], dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    order = np.argsort(ids, kind="stable")
    return {
        "row_ids": ids[order],
        "starts": starts[order],
        "lens": lens[order].astype(np.int64),
        "values": vals,
    }


def _assemble_store_from_blocks(*tables) -> dict:
    return _assemble_store(tables)


def build_token_store(tokenized_ds):
    """Synchronous (driver-side) store build — small runs and tests.

    Returns (object_ref, n_rows, n_bytes).
    """
    import ray

    tables = ray.get(list(
        tokenized_ds.select_columns(["row_id", "tokens"]).to_arrow_refs()))
    store = _assemble_store(tables)
    n_bytes = store["values"].nbytes + 3 * store["row_ids"].nbytes
    return ray.put(store), store["row_ids"].shape[0], n_bytes


def _store_shards(n_blocks: int, cpus: int | None = None) -> int:
    """Shard count for the parallel store build: one concat task per shard.

    A single-task build is a DATA-PROPORTIONAL serial term that gates the
    whole scoring stage (measured 17-18 s at 480k rows: every worker's
    first scoring task blocks in ``ray.get(store_ref)`` while one task
    faults/concats ~780 MB).  Sharding by block subsets cuts that latency
    ~K-fold; the scorer looks ids up per shard (K vectorized
    searchsorteds — K is small)."""
    if cpus is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
    return max(1, min(16, cpus, n_blocks))


#: per-worker single-slot scorer cache: scoring runs as elastic TASKS in
#: prestarted reusable workers (no actor-process startup), so the mapped
#: store + config live here between batches of the same execution
_SCORER_SLOT: list = [None, None]          # [key, TwedScorerBroadcast]

#: persistent per-process pool scratch for _pack (Ray map tasks are
#: single-threaded per worker): fresh multi-MB np.zeros per chunk are
#: mmap-backed and on lazily-backed VMs every fresh worker re-pays
#: first-touch page faults for them — reuse + fill(0) instead
_PACK_SCRATCH: dict = {}


def _pack_scratch(key: str, size: int) -> np.ndarray:
    buf = _PACK_SCRATCH.get(key)
    if buf is None or buf.shape[0] < size:
        buf = np.empty(max(int(size * 5 // 4), 1 << 16), dtype=np.float64)
        _PACK_SCRATCH[key] = buf
    return buf


def make_scoring_fn(store_refs, cfg: PipelineConfig):
    """Stateless-callable scoring fn for ``map_batches`` TASKS.

    The token store (a single ref or a list of shard refs) is
    plasma-mapped once per worker (cached by ref) — task-based scoring
    keeps the elasticity and prestarted-worker reuse that a fixed actor
    pool gives up, at zero per-batch cost since ``ray.get`` of a mapped
    object is ~µs.

    The slot cache must be reached through the module (not the closure's
    own ``__globals__``): cloudpickle captures a closure's referenced
    globals BY VALUE, so each unpickled task would otherwise see a fresh
    ``_SCORER_SLOT`` copy and re-attach every batch.
    """

    import json

    refs = list(store_refs) if isinstance(store_refs, (list, tuple)) \
        else [store_refs]
    key = (tuple(r.hex() for r in refs),
           json.dumps(cfg.to_dict(), sort_keys=True))

    def score(batch: pa.Table) -> pa.Table:
        from cutwed_ray import _taskstats
        from cutwed_ray.stages import scorer_broadcast as _sb

        slot = _sb._SCORER_SLOT
        if slot[0] != key:
            slot[0] = key
            slot[1] = _taskstats.record(
                "store_attach", _sb.TwedScorerBroadcast, refs, cfg)
        return _taskstats.record("score", slot[1], batch)

    return score


def build_token_store_async(tokenized_ds, n_shards: int | None = None):
    """Store build as parallel remote TASKS: the block concat runs in K
    workers (zero driver bytes) and overlaps with whatever the driver
    schedules next (candidate generation).  Returns a LIST of ObjectRefs,
    each resolving to one shard's store dict; scoring tasks ``ray.get``
    them (plasma-mapped, zero-copy) and look ids up per shard.

    Sharding matters: a single concat task over the whole corpus is a
    data-proportional serial term that GATES scoring start — every
    worker's first scoring task blocks on the ref (measured 17-18 s at
    480k rows / 780 MB of tokens, first-touch faults dominate).  K tasks
    over disjoint block subsets cut that latency ~K-fold.

    Expects a MATERIALIZED dataset: the refs are passed straight to the
    builders (no projection execution — the assembler picks out row_id
    and tokens itself; extra columns cost nothing, the blocks are already
    in plasma)."""
    import ray

    refs = list(tokenized_ds.to_arrow_refs())
    k = _store_shards(len(refs)) if n_shards is None \
        else max(1, min(n_shards, len(refs)))
    builder = ray.remote(num_cpus=1)(_assemble_store_from_blocks)
    return [builder.remote(*refs[s::k]) for s in range(k)]


class TwedScorerBroadcast:
    """Actor-pool ``map_batches`` stage scoring candidate-pair batches.

    __init__ maps the broadcast token store from plasma (once per actor);
    __call__ packs each batch's unique series into padded pools
    (vectorized flat gather) and runs the compiled anti-diagonal kernel.
    """

    #: shard-id shift for the packed global index: (shard << _SH) | idx.
    #: idx < 2**48 always (shard row counts are bounded far below that).
    _SH = 48

    def __init__(self, store_refs, cfg: PipelineConfig | None = None):
        import ray

        self.cfg = cfg or PipelineConfig()
        if not isinstance(store_refs, (list, tuple)):
            store_refs = [store_refs]
        shards = ray.get(list(store_refs))
        shards = [s for s in shards if s["row_ids"].shape[0]] or shards[:1]
        self.sh_ids = [s["row_ids"] for s in shards]
        self.sh_starts = [s["starts"] for s in shards]
        self.sh_lens = [s["lens"] for s in shards]
        self.sh_values = [s["values"] for s in shards]
        self.dtype = np.dtype(self.cfg.dtype)

    def _lookup(self, ids: np.ndarray):
        """Resolve row ids to packed global indices (shard << _SH | idx).

        One vectorized searchsorted per shard (K is small); raises if any
        id is absent from every shard — a silent miss would score against
        the WRONG series."""
        gid = np.full(ids.shape[0], -1, dtype=np.int64)
        for k, rid in enumerate(self.sh_ids):
            if not rid.shape[0]:
                continue
            pos = np.searchsorted(rid, ids)
            np.minimum(pos, rid.shape[0] - 1, out=pos)
            hit = (rid[pos] == ids) & (gid < 0)
            if hit.any():
                gid[hit] = (k << self._SH) | pos[hit]
        if (gid < 0).any():
            raise RuntimeError("broadcast token store is missing pair rows")
        return gid

    def _field(self, gid: np.ndarray, per_shard: list) -> np.ndarray:
        """Gather a per-row int64 field (lens/starts) by packed index."""
        out = np.zeros(gid.shape[0], dtype=np.int64)
        sh = gid >> self._SH
        ix = gid & ((1 << self._SH) - 1)
        for k, arr in enumerate(per_shard):
            m = sh == k
            if m.any():
                out[m] = arr[ix[m]]
        return out

    def _pack(self, uniq_gid: np.ndarray):
        """Pad the unique store rows into (S, M) pools (vectorized).

        The pools live in persistent per-process scratch (zeroed per call
        with fill, not fresh calloc mmaps) and are consumed synchronously
        by the kernel within the same ``__call__`` chunk."""
        lens = self._field(uniq_gid, self.sh_lens)
        S = uniq_gid.shape[0]
        M = int(lens.max()) if S else 0
        X = _pack_scratch("X", S * M)[:S * M].reshape(S, M)
        X.fill(0.0)
        TX = _pack_scratch("TX", S * M)[:S * M].reshape(S, M)
        TX.fill(0.0)
        sh = uniq_gid >> self._SH
        ix = uniq_gid & ((1 << self._SH) - 1)
        rows_all = np.arange(S)
        for k in range(len(self.sh_ids)):
            nz = (sh == k) & (lens > 0)
            if not nz.any():
                continue
            gather = _ranges(self.sh_starts[k][ix[nz]], lens[nz])
            rows = np.repeat(rows_all[nz], lens[nz])
            pos = _ranges(np.zeros(int(nz.sum()), dtype=np.int64), lens[nz])
            X[rows, pos] = self.sh_values[k][gather].astype(np.float64)
            TX[rows, pos] = pos
        return X[:, :, None], TX, lens

    def __call__(self, batch: pa.Table) -> pa.Table:
        from cutwed_ray.kernel.batch import _sweep

        cfg = self.cfg
        n = len(batch)
        if n == 0:
            return batch.append_column("twed", pa.array([], pa.float64())) \
                        .append_column("twed_norm", pa.array([], pa.float64()))
        id_a = batch.column("id_a").to_numpy()
        id_b = batch.column("id_b").to_numpy()
        exact = batch.column("exact").to_numpy()

        twed_out = np.zeros(n, dtype=np.float64)
        la = self._lookup(id_a)
        lb = self._lookup(id_b)
        len_a = self._field(la, self.sh_lens)
        len_b = self._field(lb, self.sh_lens)

        need = np.flatnonzero(~exact)
        if need.size:
            # chunk by padded length so each pool pads to similar M
            pm = np.maximum(len_a[need], len_b[need])
            po = need[np.argsort(pm, kind="stable")]
            bs = cfg.score_batch_pairs
            t = cfg.twed
            for s in range(0, po.shape[0], bs):
                sel = po[s: s + bs]
                uniq, inv = np.unique(np.r_[la[sel], lb[sel]], return_inverse=True)
                X, TX, lens = self._pack(uniq)
                P = sel.shape[0]
                res = _sweep(X, TX, lens, X, TX, lens,
                             inv[:P].astype(np.int64), inv[P:].astype(np.int64),
                             t.nu, t.lamb, t.degree)
                twed_out[sel] = res

        norm = twed_out / np.maximum(len_a + len_b, 1)
        out = batch.append_column("twed", pa.array(twed_out, pa.float64()))
        return out.append_column("twed_norm", pa.array(norm, pa.float64()))
