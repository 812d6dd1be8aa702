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


def make_scoring_fn(store_ref, cfg: PipelineConfig):
    """Stateless-callable scoring fn for ``map_batches`` TASKS.

    The token store is plasma-mapped once per worker (cached by ref) —
    task-based scoring keeps the elasticity and prestarted-worker reuse
    that a fixed actor pool gives up, at zero per-batch cost since
    ``ray.get`` of a mapped object is ~µs.
    """

    import json

    key = (store_ref.hex(), json.dumps(cfg.to_dict(), sort_keys=True))

    def score(batch: pa.Table) -> pa.Table:
        if _SCORER_SLOT[0] != key:
            _SCORER_SLOT[0] = key
            _SCORER_SLOT[1] = TwedScorerBroadcast(store_ref, cfg)
        return _SCORER_SLOT[1](batch)

    return score


def build_token_store_async(tokenized_ds):
    """Store build as a remote TASK: the block concat runs in a worker
    (zero driver bytes) and overlaps with whatever the driver schedules
    next (candidate generation).  Returns an ObjectRef resolving to the
    store dict; scoring tasks ``ray.get`` it (plasma-mapped, zero-copy).

    Expects a MATERIALIZED dataset: the refs are passed straight to the
    builder (no projection execution — the assembler picks out row_id and
    tokens itself; extra columns cost nothing, the blocks are already in
    plasma)."""
    import ray

    refs = list(tokenized_ds.to_arrow_refs())
    builder = ray.remote(num_cpus=1)(_assemble_store_from_blocks)
    return builder.remote(*refs)


class TwedScorerBroadcast:
    """Actor-pool ``map_batches`` stage scoring candidate-pair batches.

    __init__ maps the broadcast token store from plasma (once per actor);
    __call__ packs each batch's unique series into padded pools
    (vectorized flat gather) and runs the compiled anti-diagonal kernel.
    """

    def __init__(self, store_ref, cfg: PipelineConfig | None = None):
        import ray

        self.cfg = cfg or PipelineConfig()
        store = ray.get(store_ref)
        self.row_ids = store["row_ids"]
        self.starts = store["starts"]
        self.lens = store["lens"]
        self.values = store["values"]
        self.dtype = np.dtype(self.cfg.dtype)

    def _pack(self, uniq_idx: np.ndarray):
        """Pad the unique store rows into (S, M) pools (vectorized).

        The pools live in persistent per-process scratch (zeroed per call
        with fill, not fresh calloc mmaps) and are consumed synchronously
        by the kernel within the same ``__call__`` chunk."""
        starts = self.starts[uniq_idx]
        lens = self.lens[uniq_idx]
        S = uniq_idx.shape[0]
        M = int(lens.max()) if S else 0
        X = _pack_scratch("X", S * M)[:S * M].reshape(S, M)
        X.fill(0.0)
        TX = _pack_scratch("TX", S * M)[:S * M].reshape(S, M)
        TX.fill(0.0)
        nz = lens > 0
        if nz.any():
            gather = _ranges(starts[nz], lens[nz])
            rows = np.repeat(np.arange(S)[nz], lens[nz])
            pos = _ranges(np.zeros(int(nz.sum()), dtype=np.int64), lens[nz])
            X[rows, pos] = self.values[gather].astype(np.float64)
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
        la = np.searchsorted(self.row_ids, id_a)
        lb = np.searchsorted(self.row_ids, id_b)
        # hard guard against a store that is missing rows (e.g. a lost tee
        # block): a silent searchsorted miss would score against the WRONG
        # series — fail loudly instead
        if self.row_ids.shape[0]:
            la = np.minimum(la, self.row_ids.shape[0] - 1)
            lb = np.minimum(lb, self.row_ids.shape[0] - 1)
        if (self.row_ids.shape[0] == 0
                or (self.row_ids[la] != id_a).any()
                or (self.row_ids[lb] != id_b).any()):
            raise RuntimeError("broadcast token store is missing pair rows")
        len_a = self.lens[la]
        len_b = self.lens[lb]

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
