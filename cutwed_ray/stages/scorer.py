"""TWED scoring stage: one bucket of blocks in, scored candidate pairs out.

Used as ``exploded.groupby("bucket").map_groups(ScoreBucket,
fn_constructor_args=(cfg,), batch_format="pyarrow", concurrency=N)`` — an
actor-pool stage (the analogue of the reference's device-buffer reuse via
twed_malloc_dev, /root/reference/src/cuTWED_core.h:370-381: state and
config live in the actor across groups, scratch is reused).

Per bucket (which holds MANY blocks — the bucket key is deliberately
coarse, see stages/blocking.py):

1. segment rows into blocks by ``block_key`` (one vectorized argsort);
2. within each block: collapse exact duplicates (same sha256 hash) into
   0-distance pairs; salt-cap oversized blocks into sub-blocks; emit
   ``i<j`` candidate pairs (the reference's tril work-skipping,
   src/cuTWED_core.h:598-600, done *before* scoring);
3. cross-band dedup WITHOUT a shuffle: a pair is scored only in the block
   of the FIRST band on which the two rows collide;
4. pairs from all blocks are pooled, sorted by padded length, chunked, and
   scored with the vectorized anti-diagonal kernel (pool indirection: each
   unique series is packed once per chunk no matter how many pairs use it).

Output schema: id_a int64, id_b int64 (id_a < id_b), twed float64,
twed_norm float64 (twed / (n_a + n_b)), exact bool, block_key int64,
bucket int32.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cutwed_ray.config import PipelineConfig
from cutwed_ray.kernel.batch import _sweep
from cutwed_ray.stages.hashing import hash_string_array, splitmix64

PAIR_SCHEMA = pa.schema([
    ("id_a", pa.int64()),
    ("id_b", pa.int64()),
    ("twed", pa.float64()),
    ("twed_norm", pa.float64()),
    ("exact", pa.bool_()),
    ("block_key", pa.int64()),
    ("bucket", pa.int32()),
    ("n_dropped_bucket", pa.int64()),
])


def _empty_pairs() -> pa.Table:
    return PAIR_SCHEMA.empty_table()


class ScoreBucket:
    """Callable-class stage (actor pool) scoring all blocks of one bucket."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()
        self.dtype = np.dtype(self.cfg.dtype)

    # ---- scoring --------------------------------------------------------
    def _score_chunk(self, ia, ib, tok_values, tok_offsets, n_tokens):
        """Score one chunk of pairs with the pool-indirect sweep."""
        cfg = self.cfg
        from cutwed_ray.stages.hashing import _ranges

        uniq, inv = np.unique(np.r_[ia, ib], return_inverse=True)
        P = ia.shape[0]
        loc_a, loc_b = inv[:P], inv[P:]
        lens = n_tokens[uniq]
        M = int(lens.max()) if lens.size else 0
        S = uniq.shape[0]
        X = np.zeros((S, M, 1), dtype=self.dtype)
        TX = np.zeros((S, M), dtype=self.dtype)
        # vectorized flat gather (same shape as scorer_broadcast._pack) —
        # no per-unique-series Python loop
        nz = lens > 0
        if nz.any():
            gather = _ranges(tok_offsets[uniq[nz]], lens[nz])
            rows = np.repeat(np.arange(S)[nz], lens[nz])
            pos = _ranges(np.zeros(int(nz.sum()), dtype=np.int64), lens[nz])
            X[rows, pos, 0] = tok_values[gather]
            TX[rows, pos] = pos
        t = cfg.twed
        return _sweep(X, TX, lens.astype(np.int64),
                      X, TX, lens.astype(np.int64),
                      loc_a.astype(np.int64), loc_b.astype(np.int64),
                      t.nu, t.lamb, t.degree)

    def __call__(self, group: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = len(group)
        if n < 2:
            return _empty_pairs()

        from cutwed_ray.stages.pairgen import generate_block_pairs

        key_np = group.column("block_key").to_numpy()
        row_id = group.column("row_id").to_numpy()
        n_tokens = group.column("n_tokens").to_numpy().astype(np.int64)
        band_id_np = group.column("band_id").to_numpy()
        bands = np.stack(
            [group.column(f"band_{i}").to_numpy() for i in range(cfg.minhash_bands)],
            axis=1,
        )
        content_key = hash_string_array(group.column("sha256"))
        bucket_val = int(group.column("bucket")[0].as_py())

        ia, ib, exact, bkeys, n_dropped = generate_block_pairs(
            key_np, row_id, content_key, bands, band_id_np, cfg)
        if ia.size == 0:
            return _empty_pairs()

        # flat token buffer (zero-copy out of Arrow)
        tok_col = group.column("tokens")
        if isinstance(tok_col, pa.ChunkedArray):
            tok_col = tok_col.combine_chunks()
        tok_values = np.asarray(tok_col.values, dtype=np.float64)
        tok_offsets = np.asarray(tok_col.offsets, dtype=np.int64)[:-1]

        twed_out = np.zeros(ia.shape[0], dtype=np.float64)
        need = ~exact
        if need.any():
            nia, nib = ia[need], ib[need]
            # sort by pair max length so each chunk pads to a similar M
            pair_max = np.maximum(n_tokens[nia], n_tokens[nib])
            po = np.argsort(pair_max, kind="stable")
            nia, nib = nia[po], nib[po]
            res = np.empty(nia.shape[0], dtype=np.float64)
            bs = cfg.score_batch_pairs
            for s in range(0, nia.shape[0], bs):
                e = min(s + bs, nia.shape[0])
                res[s:e] = self._score_chunk(nia[s:e], nib[s:e],
                                             tok_values, tok_offsets, n_tokens)
            back = np.empty_like(res)
            back[po] = res
            twed_out[need] = back

        la, lb_ = n_tokens[ia], n_tokens[ib]
        norm = twed_out / np.maximum(la + lb_, 1)
        id_a, id_b = row_id[ia], row_id[ib]
        swap = id_a > id_b
        id_a2 = np.where(swap, id_b, id_a)
        id_b2 = np.where(swap, id_a, id_b)

        return pa.table({
            "id_a": pa.array(id_a2, pa.int64()),
            "id_b": pa.array(id_b2, pa.int64()),
            "twed": pa.array(twed_out, pa.float64()),
            "twed_norm": pa.array(norm, pa.float64()),
            "exact": pa.array(exact, pa.bool_()),
            "block_key": pa.array(bkeys, pa.int64()),
            "bucket": pa.array(np.full(ia.shape[0], bucket_val, dtype=np.int32), pa.int32()),
            "n_dropped_bucket": pa.array(
                np.r_[np.int64(n_dropped), np.zeros(ia.shape[0] - 1, dtype=np.int64)],
                pa.int64()),
        })
