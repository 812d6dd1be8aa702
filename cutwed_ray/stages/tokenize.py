"""Tokenize stage: content string -> token-hash time series + blocking features.

The reference consumes caller-prepared dense arrays
(/root/reference/cuTWED/cuTWED.py:47-66); at web scale the series are
*derived* inside the pipeline: each file's content becomes a token-hash
sequence in [0,1) with positional timestamps 0..n-1 (BASELINE.json
north_star stage 1).  This stage is a stateless ``map_batches`` function
over zero-copy Arrow batches — all hot loops are flat-buffer NumPy
(see stages/hashing.py); the only per-row Python is sha256 (hashlib is C).

Output columns appended to the input batch:
    sha256      string   — hex digest of content (per-row invariant)
    row_id      int64    — stable row identity: hash(repo, path, commit)
                          (int64 so Ray/pandas/DuckDB aggregates stay native)
    tokens      list<float32> — token-hash series values in [0,1)
    n_tokens    int64
    len_bucket  int32    — geometric length bucket (near-equal lengths per block)
    band_0..band_{B-1} uint64 — MinHash-LSH band signatures over token shingles

Timestamps are implicitly arange(n_tokens) and are NOT materialized — the
scorer regenerates them, saving 8 bytes/token of shuffle traffic.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa

from cutwed_ray.config import PipelineConfig
from cutwed_ray.stages.hashing import (
    hash_string_array,
    minhash_bands,
    shingle_hashes,
    splitmix64,
)


#: persistent per-process scratch for the byte-level masks: the naive
#: formulation allocated ~10x the content bytes in fresh bool arrays and
#: expression temporaries PER CALL — allocator churn that costs real time
#: on lazily-backed VMs (every fresh worker re-faults the pages; measured
#: ~0.5 ms/page on this host) and trashes cache at any scale.  Ray map
#: tasks are single-threaded per worker, so one slot per name suffices.
_TOK_SCRATCH: dict = {}


def _tok_scratch(key: str, size: int, dtype=bool) -> np.ndarray:
    buf = _TOK_SCRATCH.get(key)
    if buf is None or buf.shape[0] < size:
        buf = np.empty(max(int(size * 5 // 4), 1 << 20), dtype=dtype)
        _TOK_SCRATCH[key] = buf
    return buf[:size]


def tokenize_content(content, max_tokens: int) -> tuple[np.ndarray, np.ndarray]:
    """content (Arrow string array) -> (flat uint64 token hashes, (N+1,) offsets).

    Tokens are maximal runs of non-whitespace.  Rather than materializing a
    list<string> array, we find token boundaries directly on the flat byte
    buffer with NumPy: a position starts a token iff it is non-space and the
    previous byte is a space or a document boundary.  All byte-sized masks
    live in persistent scratch (out= kernels, no temporaries).
    """
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    n_docs = len(content)
    bufs = content.buffers()
    if pa.types.is_large_string(content.type):
        doc_off = np.frombuffer(bufs[1], dtype=np.int64)
    else:
        doc_off = np.frombuffer(bufs[1], dtype=np.int32).astype(np.int64)
    doc_off = doc_off[content.offset: content.offset + n_docs + 1]
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.zeros(0, np.uint8)
    )

    base = doc_off[0]
    view = data[base: doc_off[-1]]
    doc_off = doc_off - base
    nbytes = view.shape[0]

    # whitespace mask (space, \t, \n, \r, \v, \f)
    is_ws = _tok_scratch("is_ws", nbytes)
    np.equal(view, 32, out=is_ws)
    tmp = _tok_scratch("tmp", nbytes)
    np.greater_equal(view, 9, out=tmp)
    tmp2 = _tok_scratch("tmp2", nbytes)
    np.less_equal(view, 13, out=tmp2)
    tmp &= tmp2
    is_ws |= tmp
    non_ws = np.logical_not(is_ws, out=tmp)        # aliases "tmp"

    # token starts: non-ws whose previous byte is ws, plus doc starts landing on non-ws
    prev_ws = _tok_scratch("prev_ws", nbytes)
    if nbytes:
        prev_ws[0] = True
        prev_ws[1:] = is_ws[:-1]
    starts_mask = prev_ws
    starts_mask &= non_ws
    starts_mask[doc_off[:-1][doc_off[:-1] < nbytes]] |= True  # doc boundary forces a start
    starts_mask &= non_ws
    tok_starts = np.nonzero(starts_mask)[0].astype(np.int64)

    # token ends: next ws-or-doc-boundary after each start
    next_ws = _tok_scratch("next_ws", nbytes)
    if nbytes:
        next_ws[-1] = True
        next_ws[:-1] = is_ws[1:]
    ends_mask = next_ws
    ends_mask &= non_ws
    ends_mask[np.maximum(doc_off[1:] - 1, 0)[doc_off[1:] > 0]] |= True
    ends_mask &= non_ws
    tok_ends = np.nonzero(ends_mask)[0].astype(np.int64) + 1

    # doc boundaries can split a "run" — recompute ends per start by pairing:
    # starts and ends interleave 1:1 because every maximal run within a doc
    # has exactly one start and one end (doc boundaries force both).
    if tok_starts.shape[0] != tok_ends.shape[0]:
        raise AssertionError("token start/end pairing failed")

    # per-doc token counts via searchsorted on starts
    tok_doc = np.searchsorted(doc_off[1:], tok_starts, side="right")
    counts = np.bincount(tok_doc, minlength=n_docs).astype(np.int64)

    # truncate long docs to max_tokens
    if counts.max(initial=0) > max_tokens:
        first = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(counts[:-1], out=first[1:])
        pos_in_doc = np.arange(tok_starts.shape[0]) - first[tok_doc]
        keep = pos_in_doc < max_tokens
        tok_starts, tok_ends = tok_starts[keep], tok_ends[keep]
        tok_doc = tok_doc[keep]
        counts = np.minimum(counts, max_tokens)

    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])

    from cutwed_ray.stages.hashing import hash_flat_strings

    th = hash_flat_strings(view, tok_starts, tok_ends)
    return th, offsets


def _sha256_hex(content) -> list[str]:
    """Per-row sha256 hex straight from the flat Arrow buffer (memoryview
    slices) — no per-row Python-str materialization/encode round-trip.
    Null rows hash the empty string, matching the previous behavior."""
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    bufs = content.buffers()
    off_dtype = np.int64 if pa.types.is_large_string(content.type) else np.int32
    off = np.frombuffer(bufs[1], dtype=off_dtype)[
        content.offset: content.offset + len(content) + 1
    ].astype(np.int64)
    mv = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    return [hashlib.sha256(mv[s:e]).hexdigest()
            for s, e in zip(off[:-1].tolist(), off[1:].tolist())]


def _apply_side_bit(rid: np.ndarray, batch: pa.Table) -> np.ndarray:
    """Record-linkage support: when a ``__side__`` column (0/1) is present,
    encode it in the row_id's lowest bit so cross-dataset pairs are
    recognizable anywhere from the ids alone (no lookup, no join)."""
    if "__side__" in batch.column_names:
        side = batch.column("__side__").to_numpy().astype(np.uint64)
        rid = (rid & ~np.uint64(1)) | (side & np.uint64(1))
    return rid


class AddIdsStage:
    """Light map_batches stage: append only row_id + sha256 (no tokenization).

    Used where the full TokenizeStage payload isn't needed (e.g. labelling
    the final cluster output) — preserves the per-row content-sha256
    invariant without re-shuffling token lists.
    """

    def __init__(self, id_cols=("repo", "path", "commit")):
        self.id_cols = id_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        content = batch.column("content")
        sha = _sha256_hex(content)
        rid = np.zeros(len(batch), dtype=np.uint64)
        for c in self.id_cols:
            if c in batch.column_names:
                rid = splitmix64(rid ^ hash_string_array(batch.column(c)))
        rid = _apply_side_bit(rid, batch)
        out = batch.append_column("sha256", pa.array(sha, pa.string()))
        return out.append_column("row_id", pa.array(rid.view(np.int64), pa.int64()))


class TokenizeStage:
    """Callable for ``ds.map_batches(TokenizeStage(cfg), batch_format="pyarrow")``.

    Stateless per batch; a plain class (not an actor requirement) so the
    config is serialized once.
    """

    def __init__(self, cfg: PipelineConfig | None = None, id_cols=("repo", "path", "commit")):
        self.cfg = cfg or PipelineConfig()
        self.id_cols = id_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        from cutwed_ray._taskstats import record
        return record("tokenize", self._tokenize, batch)

    def _tokenize(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        content = batch.column("content")

        # sha256 per row (hashlib is C-speed; slices come straight from the
        # Arrow buffer, no str round-trip)
        sha = _sha256_hex(content)

        # stable row id from identity columns
        rid = np.zeros(len(batch), dtype=np.uint64)
        for c in self.id_cols:
            if c in batch.column_names:
                rid = splitmix64(rid ^ hash_string_array(batch.column(c)))
        rid = _apply_side_bit(rid, batch)

        th, offsets = tokenize_content(content, cfg.max_tokens)
        n_tokens = offsets[1:] - offsets[:-1]

        lb = np.floor(
            np.log(np.maximum(n_tokens, 1).astype(np.float64))
            / math.log(cfg.length_bucket_base)
        ).astype(np.int32)

        sh, sh_off = shingle_hashes(th, offsets, cfg.shingle_k)
        bands = minhash_bands(sh, sh_off, cfg.minhash_perms, cfg.minhash_bands,
                              seed=cfg.block_salt_seed)

        # token values AFTER shingling so th (which this batch owns) can be
        # converted in place: (th >> 11) * 2^-53 rounded straight to float32
        # is bit-identical to hashes_to_unit_floats(th).astype(float32)
        # (both round the same 53-bit integer once; the power-of-two scale
        # is exact) with 2 fewer full-size temporaries
        th >>= np.uint64(11)
        values32 = th.astype(np.float32)
        values32 *= np.float32(2.0 ** -53)

        # int32 list offsets: per-batch token totals are far below 2^31 and a
        # consistent list type across batches keeps the schema stable.
        # float32 halves the blocking-shuffle payload (tokens dominate row
        # bytes); the ~1e-7 quantization is irrelevant at threshold scale
        tokens_arr = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(values32, pa.float32()),
        )

        out = batch.append_column("sha256", pa.array(sha, pa.string()))
        out = out.append_column("row_id", pa.array(rid.view(np.int64), pa.int64()))
        out = out.append_column("tokens", tokens_arr)
        out = out.append_column("n_tokens", pa.array(n_tokens, pa.int64()))
        out = out.append_column("len_bucket", pa.array(lb, pa.int32()))
        for bi in range(bands.shape[1]):
            out = out.append_column(f"band_{bi}", pa.array(bands[:, bi], pa.uint64()))
        return out
