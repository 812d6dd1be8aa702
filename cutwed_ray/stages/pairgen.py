"""Candidate-pair generation from LIGHT exploded band rows (no tokens).

Same block semantics as the carrying scorer (stages/scorer.py): segment a
bucket into blocks, collapse exact duplicates, salt-cap oversized blocks,
emit i<j pairs deduplicated across bands by the first-collision rule.
Output is only ids + block metadata — the heavy token payload never enters
this shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cutwed_ray.config import PipelineConfig
from cutwed_ray.stages.hashing import splitmix64

PAIRGEN_SCHEMA = pa.schema([
    ("id_a", pa.int64()),
    ("id_b", pa.int64()),
    ("exact", pa.bool_()),
    ("block_key", pa.int64()),
    ("bucket", pa.int32()),
    ("pair_max_len", pa.int32()),
    ("n_dropped_bucket", pa.int64()),
])


def _pairs_within_segments(sizes: np.ndarray):
    """Vectorized i<j pair indices for consecutive segments of given sizes.

    Rows are numbered 0..sum(sizes)-1 in segment order; returns (ia, ib)
    global indices of every within-segment ordered pair.
    """
    from cutwed_ray.stages.hashing import _ranges

    R = int(sizes.sum())
    if R == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    seg_first = np.zeros(sizes.shape[0], dtype=np.int64)
    np.cumsum(sizes[:-1], out=seg_first[1:])
    t = np.arange(R, dtype=np.int64) - np.repeat(seg_first, sizes)   # local pos
    counts = np.repeat(sizes, sizes) - 1 - t                         # partners after me
    nz = counts > 0
    ia = np.repeat(np.arange(R, dtype=np.int64)[nz], counts[nz])
    ib = _ranges(np.arange(R, dtype=np.int64)[nz] + 1, counts[nz])
    return ia, ib


def generate_block_pairs(key_np, row_id, content_key, bands, band_id_np,
                         cfg: PipelineConfig):
    """Candidate pairs for one bucket — fully vectorized across its blocks.

    Returns (ia, ib, exact, bkeys): integer ROW indices into the bucket
    arrays, the exact-duplicate flag, and the block key per pair.  Semantics
    (identical to the original per-block loop):

    * rows sort by (block_key, content_key); one rep per distinct content
      per block; at band 0, members link to their rep as 0-distance pairs;
    * reps form i<j pairs within each block (the reference's tril
      work-skipping done before scoring, src/cuTWED_core.h:598-600);
    * a pair is kept only in the block of the FIRST band the two rows share
      (cross-band dedup without a shuffle);
    * blocks larger than ``cfg.max_block_size`` are salt-split into
      sub-blocks (documented recall cap for pathological hot blocks).

    Returns a 5th element ``n_dropped``: the number of block-view pairs
    sacrificed to the salt-cap in this bucket (sum of C(m,2) before minus
    after splitting) — surfaced in pipeline metrics so capped coverage is
    never silent.  Because the salt is deliberately band-INdependent (so a
    pair co-located in one band's sub-block is co-located in every band's),
    a distinct dropped pair is counted once per shared band: the metric is
    an upper bound on distinct lost pairs (exact when bands = 1).
    """
    n = key_np.shape[0]
    order = np.lexsort((content_key, key_np))
    k_s = key_np[order]
    ck_s = content_key[order]

    new_block = np.r_[True, k_s[1:] != k_s[:-1]]
    new_run = new_block | np.r_[True, ck_s[1:] != ck_s[:-1]]

    out_ia, out_ib, out_exact, out_key = [], [], [], []

    # --- exact-duplicate member -> rep links (band 0 blocks only) ---
    run_start_pos = np.where(new_run, np.arange(n), 0)
    np.maximum.accumulate(run_start_pos, out=run_start_pos)
    members = ~new_run
    if members.any():
        mem = np.nonzero(members)[0]
        first_band = band_id_np[order[mem]] == 0
        mem = mem[first_band]
        if mem.size and cfg.link_mode:
            rep_ids = row_id[order[run_start_pos[mem]]]
            mem_ids = row_id[order[mem]]
            mem = mem[((rep_ids ^ mem_ids) & 1) == 1]
        if mem.size:
            out_ia.append(order[run_start_pos[mem]])
            out_ib.append(order[mem])
            out_exact.append(np.ones(mem.size, dtype=bool))
            out_key.append(k_s[mem])

    # --- rep pairs within blocks ---
    rep_pos = np.nonzero(new_run)[0]
    rep_block = np.cumsum(new_block)[rep_pos] - 1       # block id per rep
    sizes = np.bincount(rep_block)
    orig_pairs = int((sizes * (sizes - 1) // 2).sum())
    big = sizes > cfg.max_block_size
    if big.any():
        # salt-split oversized blocks: re-key each rep of a big block by a
        # deterministic sub-group id, then treat sub-groups as blocks
        rep_rows = order[rep_pos]
        is_big = big[rep_block]
        sub = np.zeros(rep_pos.shape[0], dtype=np.int64)
        nsub = -(-sizes[rep_block[is_big]] // cfg.max_block_size)
        sub[is_big] = (
            splitmix64(row_id[rep_rows[is_big]].view(np.uint64)
                       ^ np.uint64(cfg.block_salt_seed))
            % nsub.astype(np.uint64)
        ).astype(np.int64)
        o2 = np.lexsort((sub, rep_block))
        rep_pos = rep_pos[o2]
        rb2 = rep_block[o2]
        sub2 = sub[o2]
        seg_new = np.r_[True, (rb2[1:] != rb2[:-1]) | (sub2[1:] != sub2[:-1])]
        sizes = np.diff(np.r_[np.nonzero(seg_new)[0], rep_pos.shape[0]])
    n_dropped = orig_pairs - int((sizes * (sizes - 1) // 2).sum())
    ia_l, ib_l = _pairs_within_segments(sizes)
    if ia_l.size:
        pa_pos, pb_pos = rep_pos[ia_l], rep_pos[ib_l]
        ia = order[pa_pos]
        ib = order[pb_pos]
        band_id = band_id_np[ia]
        eq = bands[ia] == bands[ib]
        keep = eq.argmax(axis=1) == band_id
        if cfg.link_mode:
            keep &= ((row_id[ia] ^ row_id[ib]) & 1) == 1
        if keep.any():
            out_ia.append(ia[keep])
            out_ib.append(ib[keep])
            out_exact.append(np.zeros(int(keep.sum()), dtype=bool))
            out_key.append(key_np[ia[keep]])

    if not out_ia:
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros(0, dtype=bool), z, n_dropped
    return (np.concatenate(out_ia), np.concatenate(out_ib),
            np.concatenate(out_exact), np.concatenate(out_key), n_dropped)


def central_pair_chunks(cfg: PipelineConfig, n_chunks: int, stratum: int,
                        n_strata: int, *tables):
    """All-at-once candidate generation for the BROADCAST strategy — the
    shuffle-free path.

    Broadcast mode already requires the tokenized corpus to fit a plasma
    byte budget; the light band-key table is strictly smaller than the
    token store, so when the store fits, candidate generation can run in
    ONE remote task over the materialized tokenized blocks instead of a
    sort-shuffle + per-bucket ``map_groups``.  That removes the shuffle
    barrier (scoring used to idle until every explode/sort-map task
    finished), the reduce-partition straggler (a long length-class bucket
    fused into one task), and the task ramp — the three measured
    tail-terms of the scoring stage at 16 CPUs.

    Pairs come out in globally DESCENDING length order, sliced into
    ``n_chunks`` equal-*cost* chunks (cost ~ padded-length², the kernel's
    per-pair work), so the scoring stage gets perfectly balanced tasks
    with the expensive ones scheduled first.  Intended to be invoked as a
    ``ray.remote(num_returns=n_chunks)`` task: returns a list of exactly
    ``n_chunks`` pair tables (empty-padded), each becoming one scoring
    block via ``ray.data.from_arrow_refs``.

    The pair SET (ids, exact flags, block keys, salt-cap drop count) is
    identical to the bucketed shuffle path: ``generate_block_pairs`` is
    bucket-agnostic and every row of a block shared one bucket there, so
    partitioning never affected which pairs exist.  The carry strategy
    keeps the shuffle — this path is only for corpora already under the
    broadcast budget (the 100-TB path never enters here).

    ``stratum``/``n_strata`` parallelize the generation itself: blocks
    are atomic under ``block_key % n_strata``, so S such tasks (each
    keeping only its stratum's band rows) produce disjoint,
    union-identical pair sets — the single-task lexsort stops being a
    serial term on the critical path.  The cross-band first-shared-band
    dedup still works across strata because every band row carries the
    FULL signature: each stratum decides each candidate pair identically
    and only the first-shared-band's block (wherever it lives) keeps it
    — the exact mechanism the bucketed path relied on.
    """
    from cutwed_ray.stages.blocking import ExplodeBands

    empty = PAIRGEN_SCHEMA.empty_table()
    ex = ExplodeBands(cfg, n_buckets=1, carry_tokens=False)
    parts = [ex(t) for t in tables if t.num_rows]
    if not parts:
        return [empty] * n_chunks
    band = pa.concat_tables(parts).combine_chunks()
    if n_strata > 1:
        keys_u = band.column("block_key").to_numpy().view(np.uint64)
        band = band.filter(
            pa.array(keys_u % np.uint64(n_strata) == np.uint64(stratum)))
        band = band.combine_chunks()
    n = band.num_rows
    if n < 2:
        return [empty] * n_chunks

    key_np = band.column("block_key").to_numpy()
    row_id = band.column("row_id").to_numpy()
    n_tokens = band.column("n_tokens").to_numpy().astype(np.int64)
    band_id_np = band.column("band_id").to_numpy()
    content_key = band.column("content_key").to_numpy().view(np.uint64)
    bands = np.stack(
        [band.column(f"band_{i}").to_numpy() for i in range(cfg.minhash_bands)],
        axis=1)

    ia, ib, exact, bkeys, n_dropped = generate_block_pairs(
        key_np, row_id, content_key, bands, band_id_np, cfg)
    if ia.size == 0:
        # (drops with zero surviving pairs are silently lost — exactly the
        # shuffle path's PairGen.__call__ behavior for an empty bucket)
        return [empty] * n_chunks
    id_a, id_b = row_id[ia], row_id[ib]
    swap = id_a > id_b
    pm = np.maximum(n_tokens[ia], n_tokens[ib]).astype(np.int32)
    order = np.argsort(-pm.astype(np.int64), kind="stable")
    id_a, id_b = id_a[order], id_b[order]
    swap = swap[order]
    exact = exact[order]
    bkeys = bkeys[order]
    pm = pm[order]
    a = np.where(swap, id_b, id_a)
    b = np.where(swap, id_a, id_b)

    # equal-COST chunking: kernel work per pair ~ padded_len² (zero for
    # exact dups, which skip the kernel); longest chunks hold few pairs,
    # short chunks many — every scoring task lands near cost/n_chunks
    cost = np.where(exact, 1.0, (pm.astype(np.float64) + 1.0) ** 2)
    cum = np.cumsum(cost)
    total = float(cum[-1])
    n_chunks = max(1, int(n_chunks))
    # tapered targets: the last ~1/6 of chunks carry HALF the cost of the
    # others, so the scoring stage's tail is filled by half-size tasks —
    # the stage's finish skew drops from one full chunk-cost to half
    tail_n = n_chunks // 6
    w = np.ones(n_chunks)
    if tail_n:
        w[-tail_n:] = 0.5
    targets = np.cumsum(w)[:-1] / w.sum() * total
    cuts = np.searchsorted(cum, targets, side="left") + 1
    bounds = np.r_[0, cuts, a.shape[0]]
    dropped_col = np.zeros(a.shape[0], dtype=np.int64)
    dropped_col[0] = n_dropped
    out = []
    for c in range(n_chunks):
        s, e = int(bounds[c]), int(bounds[c + 1])
        if e <= s:
            out.append(empty)
            continue
        out.append(pa.table({
            "id_a": pa.array(a[s:e], pa.int64()),
            "id_b": pa.array(b[s:e], pa.int64()),
            "exact": pa.array(exact[s:e], pa.bool_()),
            "block_key": pa.array(bkeys[s:e], pa.int64()),
            "bucket": pa.array(np.full(e - s, c, dtype=np.int32), pa.int32()),
            "pair_max_len": pa.array(pm[s:e], pa.int32()),
            "n_dropped_bucket": pa.array(dropped_col[s:e], pa.int64()),
        }))
    return out


class PairGen:
    """map_groups callable: one bucket of light band rows -> candidate pairs."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()

    def __call__(self, group: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = len(group)
        if n < 2:
            return PAIRGEN_SCHEMA.empty_table()
        key_np = group.column("block_key").to_numpy()
        row_id = group.column("row_id").to_numpy()
        n_tokens = group.column("n_tokens").to_numpy().astype(np.int64)
        band_id_np = group.column("band_id").to_numpy()
        content_key = group.column("content_key").to_numpy().view(np.uint64)
        bands = np.stack(
            [group.column(f"band_{i}").to_numpy() for i in range(cfg.minhash_bands)],
            axis=1)
        bucket_val = int(group.column("bucket")[0].as_py())

        ia, ib, exact, bkeys, n_dropped = generate_block_pairs(
            key_np, row_id, content_key, bands, band_id_np, cfg)
        if ia.size == 0:
            return PAIRGEN_SCHEMA.empty_table()
        id_a, id_b = row_id[ia], row_id[ib]
        swap = id_a > id_b
        pm = np.maximum(n_tokens[ia], n_tokens[ib]).astype(np.int32)
        # longest pairs FIRST: blocks are length-homogeneous (len_bucket is
        # part of the block key), so in block order the downstream scorer's
        # fixed-size batch slices come out all-long or all-short — the
        # all-long ones land anywhere in the schedule and a late one adds
        # its entire quadratic cost to the stage tail.  Descending length
        # puts each block's expensive slices at the front of the stage,
        # leaving cheap slices to fill the tail.
        order = np.argsort(-pm.astype(np.int64), kind="stable")
        ia, ib = None, None                    # invalidated by reordering
        id_a, id_b = id_a[order], id_b[order]
        swap = swap[order]
        exact = exact[order]
        bkeys = bkeys[order]
        pm = pm[order]
        # the bucket's salt-cap dropped-pair count rides on ONE row so a
        # plain Sum over the column yields the exact pipeline-wide total
        dropped_col = np.zeros(id_a.shape[0], dtype=np.int64)
        dropped_col[0] = n_dropped
        return pa.table({
            "id_a": pa.array(np.where(swap, id_b, id_a), pa.int64()),
            "id_b": pa.array(np.where(swap, id_a, id_b), pa.int64()),
            "exact": pa.array(exact, pa.bool_()),
            "block_key": pa.array(bkeys, pa.int64()),
            "bucket": pa.array(np.full(id_a.shape[0], bucket_val, dtype=np.int32), pa.int32()),
            "pair_max_len": pa.array(pm, pa.int32()),
            "n_dropped_bucket": pa.array(dropped_col, pa.int64()),
        })
