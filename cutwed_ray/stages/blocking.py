"""Blocking stage: explode rows into (block, bucket) rows for the scoring shuffle.

Blocking key = (lang, len_bucket, band_id, band_hash) — language and
geometric length bucket guarantee near-equal series lengths per block (the
reference's batch kernel requires equal-length stacks, /root/reference/
src/cuTWED.h:91-96; we only need *near*-equal since our sweep masks
variable lengths), the MinHash band restricts to content-similar rows.

Each row explodes into ``n_bands`` band rows.  Rows are then shuffled once
on ``bucket = block_hash % n_buckets`` — a deliberately coarse key so one
``map_groups`` task handles MANY blocks (amortizing per-task overhead and
letting the scorer pool pairs from different blocks into shared kernel
sweeps).  Skew: the bucket hash is uniform over blocks; pathological single
blocks are capped inside the scorer (salted sub-blocks), not here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cutwed_ray.config import PipelineConfig
from cutwed_ray.stages.hashing import _ranges, hash_string_array, splitmix64

#: columns the scorer needs per exploded row
BLOCK_COLS = ["bucket", "block_key", "band_id", "row_id", "sha256", "n_tokens", "tokens"]


class ExplodeBands:
    """``ds.map_batches(ExplodeBands(cfg, n_buckets), batch_format="pyarrow")``.

    Input: tokenized batch (TokenizeStage output).
    Output: one row per (input row, band): block_key uint64, bucket int32,
    band_id int8, plus row payload and the full band signature columns
    (band_0..band_{B-1}) needed for cross-band pair dedup in the scorer.
    """

    def __init__(self, cfg: PipelineConfig, n_buckets: int = 64,
                 carry_tokens: bool = True):
        self.cfg = cfg
        self.n_buckets = n_buckets
        # carry_tokens=False emits LIGHT rows (ids + keys only, tokens stay
        # out of the shuffle) for the broadcast-store scoring strategy
        self.carry_tokens = carry_tokens

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        nb = cfg.minhash_bands
        n = len(batch)
        lang_h = hash_string_array(batch.column("lang"))
        lb = batch.column("len_bucket").to_numpy().astype(np.uint64)
        base_key = splitmix64(lang_h ^ splitmix64(lb + np.uint64(0xA5A5)))

        bands = np.stack(
            [batch.column(f"band_{i}").to_numpy() for i in range(nb)], axis=1
        )  # (n, nb)

        # block key per (row, band): mix(base ^ band_hash ^ band_id)
        band_ids = np.arange(nb, dtype=np.uint64)
        keys = splitmix64(base_key[:, None] ^ bands ^ (band_ids[None, :] + np.uint64(0x1234567)))
        # LONG series (quadratic kernel cost, rare under the length
        # distribution but dominant per pair) get dedicated bucket ids,
        # INTERLEAVED through the id space at a fixed stride.  Why not
        # contiguous low ids (the round-3 first attempt): the groupby's
        # sort shuffle partitions the key range at ROW-count quantiles, and
        # long rows are rare — contiguous long ids all fall into ONE range
        # partition, whose fused pairgen->score task then carries ~25% of
        # total quadratic cost (measured: a 12 s straggler task defining a
        # 12.8 s stage wall at 16 CPUs).  Interleaving puts at most one
        # long bucket into any row-quantile partition, so per-task cost is
        # bounded by one long bucket (~2-3% of total) plus its short
        # neighbors.  Only the long tail is split out — a full cost-ordered
        # id space (class * n_buckets + slot) measured 2x SLOWER at 16
        # CPUs: hundreds of distinct keys under-fill the scoring batches.
        # Still a pure function of block_key (lb is part of it), so all
        # rows of a block share one bucket.
        n_long = max(2, self.n_buckets // 8)
        n_rest = max(1, self.n_buckets - n_long)
        stride = max(2, self.n_buckets // n_long)   # long ids: 0, s, 2s, ...
        gap = stride - 1                             # short slots per gap
        is_long = lb >= np.uint64(23)          # ~1000+ tokens (base 1.35)
        j = keys % np.uint64(n_rest)                 # short slot index
        short_ids = j + j // np.uint64(gap) + np.uint64(1)
        buckets = np.where(
            is_long[:, None],
            np.minimum((keys % np.uint64(n_long)) * np.uint64(stride),
                       np.uint64(self.n_buckets - 1)),
            np.minimum(short_ids, np.uint64(self.n_buckets - 1))).astype(np.int32)

        # Build the 8x-replicated table with flat-buffer NumPy ops —
        # pa.Table.take on a list<float> column is ~100x slower than a
        # direct value-buffer gather (measured: 250s core-time on a 200k-row
        # corpus, vs ~3s for this construction).
        take_idx = np.repeat(np.arange(n, dtype=np.int64), nb)
        cols: dict[str, pa.Array] = {
            "bucket": pa.array(buckets.reshape(-1), pa.int32()),
            "block_key": pa.array(keys.reshape(-1).view(np.int64), pa.int64()),
            "band_id": pa.array(np.tile(np.arange(nb, dtype=np.int8), n), pa.int8()),
        }

        if self.carry_tokens:
            tok = batch.column("tokens")
            if isinstance(tok, pa.ChunkedArray):
                tok = tok.combine_chunks()
            tok_vals = np.asarray(tok.values)
            tok_off = np.asarray(tok.offsets, dtype=np.int64)
            starts = tok_off[:-1][take_idx]
            counts = (tok_off[1:] - tok_off[:-1])[take_idx]
            new_off = np.zeros(take_idx.shape[0] + 1, dtype=np.int64)
            np.cumsum(counts, out=new_off[1:])
            nz = counts > 0      # _ranges requires positive segment lengths
            gather = _ranges(starts[nz], counts[nz])
            new_vals = tok_vals[gather] if gather.size else tok_vals[:0]
            cols["tokens"] = pa.ListArray.from_arrays(
                pa.array(new_off, pa.int32()), pa.array(new_vals, tok.type.value_type))
            # sha256 strings: arrow take on a plain string column is fine
            cols["sha256"] = batch.column("sha256").take(pa.array(take_idx))
        else:
            ck = hash_string_array(batch.column("sha256")).view(np.int64)
            cols["content_key"] = pa.array(ck[take_idx], pa.int64())

        for c in ("row_id", "n_tokens"):
            cols[c] = pa.array(batch.column(c).to_numpy()[take_idx])
        for i in range(nb):
            cols[f"band_{i}"] = pa.array(
                batch.column(f"band_{i}").to_numpy()[take_idx], pa.uint64())
        return pa.table(cols)


def block_stats(exploded_ds) -> "pa.Table":
    """Per-block row counts (diagnostics / skew report): block_key -> size."""
    from ray.data.aggregate import Count

    return exploded_ds.groupby("block_key").aggregate(Count(alias_name="block_size"))
