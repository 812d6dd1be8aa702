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


#: per-process cache of the geometric power sequences p^j / p^-j — they are
#: identical across calls, so recomputing them was 2 of the 4 full-buffer
#: passes in the tokenize hot path (measured ~30% of hash_flat_strings)
_POW_CACHE: dict = {}


def _pow_seqs(variant: int, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(p_pows[0..n], pinv_pows[0..n)) with amortized growth."""
    p, pinv = (_P, _PINV) if variant == 0 else (_P2, _P2INV)
    cached = _POW_CACHE.get(variant)
    if cached is None or cached[0].shape[0] < n + 1:
        size = max(n + 1, 1 << 20,
                   0 if cached is None else 2 * cached[0].shape[0])
        p_pows = np.empty(size, dtype=np.uint64)
        p_pows[0] = np.uint64(1)
        np.multiply.accumulate(np.full(size - 1, p, dtype=np.uint64),
                               out=p_pows[1:])
        pinv_pows = np.empty(size, dtype=np.uint64)
        pinv_pows[0] = np.uint64(1)
        np.multiply.accumulate(np.full(size - 1, pinv, dtype=np.uint64),
                               out=pinv_pows[1:])
        cached = (p_pows, pinv_pows)
        _POW_CACHE[variant] = cached
    return cached[0][: n + 1], cached[1][:n]


def hash_flat_strings(data: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                      variant: int = 0) -> np.ndarray:
    """Hash N strings packed in one uint8 buffer.

    data   : (nbytes,) uint8 — concatenated string bytes
    starts : (N,) int64 byte offsets (inclusive)
    ends   : (N,) int64 byte offsets (exclusive)
    variant: 0 (default) or 1 — two independent polynomial bases; combining
             both gives an effectively-128-bit key.
    Returns (N,) uint64 hashes (mixed).  Empty strings hash to a constant.
    """
    n = data.shape[0]
    if n == 0:
        return splitmix64(np.zeros(starts.shape[0], dtype=np.uint64))
    p_pows, pinv_pows = _pow_seqs(variant, n)
    # g_j = (b_j+1) * pinv^j ;  S = exclusive prefix sum (in-place, one temp)
    g = data.astype(np.uint64)
    g += np.uint64(1)
    g *= pinv_pows
    S = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(g, out=S[1:])

    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    h = p_pows[np.maximum(ends - 1, 0)] * (S[ends] - S[starts])
    h[ends <= starts] = np.uint64(0)
    return splitmix64(h)


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

    # combined rolling shingle over the flat array (cross-doc positions masked below)
    comb = tok_hashes.copy()
    for i in range(1, k):
        rot = np.uint64(i * 21 % 64)
        shifted = np.zeros(T, dtype=np.uint64)
        if T > i:
            src = tok_hashes[i:]
            shifted[:-i] = (src << rot) | (src >> (np.uint64(64) - rot))
        comb ^= shifted
    comb = splitmix64(comb)

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
    for i in range(n_perms):
        if nonempty:
            perm = a[i] * sh + b[i]
            mins[i] = np.minimum.reduceat(perm, starts)
        else:
            mins[i] = 0

    bands = np.empty((n_bands, n_docs), dtype=np.uint64)
    for bi in range(n_bands):
        acc = np.full(n_docs, np.uint64(bi + 0x9E3779B9), dtype=np.uint64)
        for r in range(bi * rows_per_band, (bi + 1) * rows_per_band):
            acc = splitmix64(acc ^ mins[r])
        bands[bi] = acc
    return bands.T.copy()
