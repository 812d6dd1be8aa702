"""Vectorized, deterministic string/token hashing used by the hot stages.

Everything here is pure NumPy on flat Arrow buffers — no per-row Python in
the hot path.  The polynomial rolling hash exploits the identity

    h(token) = sum_i (b_i + 1) * p^(L-1-i)   (mod 2^64)
             = p^(e-1) * [ S(e) - S(s) ]     with  S(j) = sum_{k<j} (b_k+1) * pinv^k

so hashing *every* token of a batch costs two cumulative products, one
cumulative sum and one gather over the concatenated byte buffer, regardless
of token boundaries.  uint64 wraparound is the modular arithmetic.
"""

from __future__ import annotations

import numpy as np

_P = np.uint64(1099511628211)               # FNV prime (odd => invertible mod 2^64)
_PINV = np.uint64(pow(1099511628211, -1, 1 << 64))
#: second independent base for 128-bit keying (exact-dedup collision safety):
#: a different odd multiplier makes simultaneous collisions of both
#: polynomial hashes ~2^-128 — effectively exact
_P2 = np.uint64(0x100000001B3 * 0x10001 | 1)
_P2INV = np.uint64(pow(int(_P2), -1, 1 << 64))

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — bijective uint64 mixer (public domain algorithm)."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= _M1
    x ^= x >> np.uint64(27)
    x *= _M2
    x ^= x >> np.uint64(31)
    return x


def splitmix64_inplace(x: np.ndarray) -> np.ndarray:
    """splitmix64 over a caller-OWNED uint64 buffer: mutates x, uses one
    persistent scratch temp instead of 4 fresh array allocations (hot-path
    variant; bit-identical to splitmix64)."""
    n = x.shape[0]
    t = _scratch("mix_tmp", n)[:n]
    np.right_shift(x, np.uint64(30), out=t)
    x ^= t
    x *= _M1
    np.right_shift(x, np.uint64(27), out=t)
    x ^= t
    x *= _M2
    np.right_shift(x, np.uint64(31), out=t)
    x ^= t
    return x


#: Chunked evaluation bounds per-call transient memory to ~3 * _CHUNK * 8
#: bytes regardless of batch size.  The naive formulation (full-buffer g, S
#: and n-sized power tables) allocated ~16x the content bytes PER CALL —
#: besides cache-hostility, on lazily-backed VMs (Firecracker et al.) every
#: fresh worker paid seconds of first-touch page faults for hundreds of MB,
#: serialized across concurrent workers (measured 16-20 s per worker at
#: 16-way on this box, ~0.3 s warm).
_CHUNK_LOG = 20
_CHUNK = 1 << _CHUNK_LOG  # content bytes per chunk (1 MiB)

#: per-process, per-variant power tables.  p^k is split two-level:
#: p^k = hi[k >> _CHUNK_LOG] * lo[k & (_CHUNK-1)]  (uint64 wraparound), so
#: the tables are O(_CHUNK + n/_CHUNK) instead of O(n).
#: entry: [p_lo, pinv_lo, p_hi, pinv_hi]
_POW_CACHE: dict = {}
#: reusable uint64 scratch (Ray map tasks are single-threaded per worker)
_SCRATCH: dict = {}


def _scratch(key: str, size: int) -> np.ndarray:
    buf = _SCRATCH.get(key)
    if buf is None or buf.shape[0] < size:
        buf = np.empty(max(size, _CHUNK + 1), dtype=np.uint64)
        _SCRATCH[key] = buf
    return buf


def _pow_tables(variant: int, n: int) -> list:
    """[p_lo, pinv_lo, p_hi, pinv_hi] covering exponents up to n."""
    p, pinv = (_P, _PINV) if variant == 0 else (_P2, _P2INV)
    cached = _POW_CACHE.get(variant)
    if cached is None:
        p_lo = np.empty(_CHUNK, dtype=np.uint64)
        p_lo[0] = np.uint64(1)
        np.multiply.accumulate(np.full(_CHUNK - 1, p, dtype=np.uint64),
                               out=p_lo[1:])
        pinv_lo = np.empty(_CHUNK, dtype=np.uint64)
        pinv_lo[0] = np.uint64(1)
        np.multiply.accumulate(np.full(_CHUNK - 1, pinv, dtype=np.uint64),
                               out=pinv_lo[1:])
        cached = [p_lo, pinv_lo,
                  np.ones(1, dtype=np.uint64), np.ones(1, dtype=np.uint64)]
        _POW_CACHE[variant] = cached
    n_hi = (max(n - 1, 0) >> _CHUNK_LOG) + 2
    if cached[2].shape[0] < n_hi:
        # hi[i] = p^(i * _CHUNK); step = p^_CHUNK = lo[-1] * p
        for slot, lo_t, base in ((2, cached[0], p), (3, cached[1], pinv)):
            step = np.uint64((int(lo_t[_CHUNK - 1]) * int(base))
                             & 0xFFFFFFFFFFFFFFFF)
            hi = np.empty(n_hi, dtype=np.uint64)
            hi[0] = np.uint64(1)
            np.multiply.accumulate(np.full(n_hi - 1, step, dtype=np.uint64),
                                   out=hi[1:])
            cached[slot] = hi
    return cached


def _sorted_view(pos: np.ndarray):
    """(sorted positions, inverse order or None) — chunk serving needs
    monotone positions; every current caller passes monotone offsets."""
    if pos.shape[0] > 1 and np.any(pos[1:] < pos[:-1]):
        order = np.argsort(pos, kind="stable")
        return pos[order], order
    return pos, None


def hash_flat_strings(data: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                      variant: int = 0) -> np.ndarray:
    """Hash N strings packed in one uint8 buffer.

    data   : (nbytes,) uint8 — concatenated string bytes
    starts : (N,) int64 byte offsets (inclusive)
    ends   : (N,) int64 byte offsets (exclusive)
    variant: 0 (default) or 1 — two independent polynomial bases; combining
             both gives an effectively-128-bit key.
    Returns (N,) uint64 hashes (mixed).  Empty strings hash to a constant.

    Evaluated in _CHUNK-byte chunks with persistent scratch: identical
    uint64 modular arithmetic to the one-shot formulation (verified
    bit-equal), but O(_CHUNK) transient memory instead of O(nbytes).
    """
    n = data.shape[0]
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    N = starts.shape[0]
    if n == 0:
        return splitmix64(np.zeros(N, dtype=np.uint64))
    p_lo, pinv_lo, p_hi, pinv_hi = _pow_tables(variant, n)

    starts_s, s_ord = _sorted_view(starts)
    ends_s, e_ord = _sorted_view(ends)
    S_s = np.empty(N, dtype=np.uint64)
    S_e = np.empty(N, dtype=np.uint64)

    g = _scratch("g", _CHUNK)
    S = _scratch("S", _CHUNK + 1)  # S[t] = sum of g over chunk[:t]
    S[0] = np.uint64(0)
    run = np.zeros(1, dtype=np.uint64)  # S_global at chunk start (wraps silently)
    for ci, c0 in enumerate(range(0, n, _CHUNK)):
        m = min(_CHUNK, n - c0)
        gb = g[:m]
        np.copyto(gb, data[c0:c0 + m], casting="unsafe")
        gb += np.uint64(1)
        gb *= pinv_lo[:m]
        gb *= pinv_hi[ci]
        np.cumsum(gb, out=S[1:m + 1])
        base = run[0]
        for pos, out, order in ((starts_s, S_s, s_ord), (ends_s, S_e, e_ord)):
            lo = np.searchsorted(pos, c0, side="left")
            hi = np.searchsorted(pos, c0 + m, side="left")
            if hi > lo:
                vals = base + S[pos[lo:hi] - c0]
                if order is None:
                    out[lo:hi] = vals
                else:
                    out[order[lo:hi]] = vals
        run += S[m:m + 1]
    # positions == n (string ending at the buffer end): S_global[n] = run
    for pos, out, order in ((starts_s, S_s, s_ord), (ends_s, S_e, e_ord)):
        lo = np.searchsorted(pos, n, side="left")
        if lo < N:
            if order is None:
                out[lo:] = run[0]
            else:
                out[order[lo:]] = run[0]

    e1 = np.maximum(ends - 1, 0)
    h = p_hi[e1 >> _CHUNK_LOG] * p_lo[e1 & np.int64(_CHUNK - 1)]
    h *= S_e - S_s
    h[ends <= starts] = np.uint64(0)
    return splitmix64_inplace(h)


def hash_string_array(arr, variant: int = 0) -> np.ndarray:
    """Hash a pyarrow StringArray (or ChunkedArray) to (N,) uint64, vectorized."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    return hash_flat_strings(data, offsets[:-1], offsets[1:], variant=variant)


def hashes_to_unit_floats(h: np.ndarray) -> np.ndarray:
    """uint64 hash -> float64 uniform in [0, 1) (53 mantissa bits)."""
    return (h >> np.uint64(11)).astype(np.float64) * (2.0 ** -53)


def shingle_hashes(tok_hashes: np.ndarray, offsets: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """k-token shingle hashes per document over a flat token-hash array.

    tok_hashes : (T,) uint64 flat token hashes of all docs
    offsets    : (N+1,) int64 doc boundaries into tok_hashes
    Returns (sh, sh_offsets): flat shingle hashes + per-doc boundaries.
    Docs with fewer than k tokens get ONE fallback shingle = hash of all
    their tokens combined (so exact duplicates still collide).
    """
    T = tok_hashes.shape[0]
    n_docs = offsets.shape[0] - 1
    lens = offsets[1:] - offsets[:-1]

    # combined rolling shingle over the flat array (cross-doc positions
    # masked below); persistent scratch, no fresh T-sized temporaries
    comb = _scratch("shingle_comb", T)[:T]
    np.copyto(comb, tok_hashes)
    for i in range(1, k):
        rot = np.uint64(i * 21 % 64)
        if T > i:
            src = tok_hashes[i:]
            t1 = _scratch("shingle_t1", T)[:T - i]
            np.left_shift(src, rot, out=t1)
            t2 = _scratch("shingle_t2", T)[:T - i]
            np.right_shift(src, np.uint64(64) - rot, out=t2)
            t1 |= t2
            comb[:T - i] ^= t1
        # positions T-i..T xor'd nothing in the old zero-padded form
    comb = splitmix64_inplace(comb)

    n_sh = np.maximum(lens - (k - 1), 0)
    has = n_sh > 0
    fallback = ~has

    sh_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(np.where(has, n_sh, 1), out=sh_offsets[1:])
    out = np.empty(sh_offsets[-1], dtype=np.uint64)

    # gather valid shingle positions: for doc d, comb[offsets[d] .. offsets[d]+n_sh[d])
    idx = _ranges(offsets[:-1][has], n_sh[has])
    pos = _ranges(sh_offsets[:-1][has], n_sh[has])
    out[pos] = comb[idx]

    if fallback.any():
        # fallback: combined hash of the doc's full token stream (empty doc -> mix(0))
        fb_docs = np.nonzero(fallback)[0]
        S = np.zeros(T + 1, dtype=np.uint64)
        np.cumsum(tok_hashes, out=S[1:])
        fb = splitmix64(S[offsets[fb_docs + 1]] - S[offsets[fb_docs]])
        out[sh_offsets[:-1][fb_docs]] = fb
    return out, sh_offsets


def _ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenate arange(s, s+c) for each (s, c) — vectorized."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(counts)
    out = np.ones(total, dtype=np.int64)
    out[0] = starts[0]
    out[ends[:-1]] = starts[1:] - (starts[:-1] + counts[:-1]) + 1
    return np.cumsum(out)


def minhash_bands(
    sh: np.ndarray, sh_offsets: np.ndarray, n_perms: int, n_bands: int, seed: int = 0x5EED
) -> np.ndarray:
    """MinHash band signatures: (N, n_bands) uint64.

    Permutation i is the affine map  a_i * x + b_i  (mod 2^64, a_i odd);
    band hash = mix of the band's row minima combined.
    """
    rng = np.random.RandomState(seed)
    a = (rng.randint(0, 2 ** 62, size=n_perms).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
    b = rng.randint(0, 2 ** 62, size=n_perms).astype(np.uint64)
    n_docs = sh_offsets.shape[0] - 1
    rows_per_band = n_perms // n_bands
    if rows_per_band * n_bands != n_perms:
        raise ValueError("n_perms must be divisible by n_bands")

    mins = np.empty((n_perms, n_docs), dtype=np.uint64)
    starts = sh_offsets[:-1]
    nonempty = sh_offsets[-1] > 0
    T_sh = sh.shape[0]
    perm = _scratch("minhash_perm", T_sh)[:T_sh]
    for i in range(n_perms):
        if nonempty:
            np.multiply(sh, a[i], out=perm)
            perm += b[i]
            np.minimum.reduceat(perm, starts, out=mins[i])
        else:
            mins[i] = 0

    bands = np.empty((n_bands, n_docs), dtype=np.uint64)
    for bi in range(n_bands):
        acc = np.full(n_docs, np.uint64(bi + 0x9E3779B9), dtype=np.uint64)
        for r in range(bi * rows_per_band, (bi + 1) * rows_per_band):
            acc = splitmix64(acc ^ mins[r])
        bands[bi] = acc
    return bands.T.copy()
