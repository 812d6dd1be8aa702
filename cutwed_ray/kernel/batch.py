"""Linear-memory anti-diagonal TWED kernel, vectorized over a pair axis.

This is a from-scratch NumPy reimplementation of the algorithmic idea in the
cuTWED reference (/root/reference/src/cuTWED_core.h:57-363): the TWED dynamic
program depends only on the previous two anti-diagonals, so it runs in
linear memory with three rotating diagonal buffers, sweeping
``nA + nB + 1`` diagonals.  Where the reference parallelizes one diagonal
across CUDA threads and one A-row across a 2-D grid of B-series, we
vectorize with NumPy across BOTH the diagonal axis and the pair axis, and
additionally support *variable-length* pairs in one call (padded + masked)
— the shape candidate-pair scoring takes inside Ray Data ``map_batches``.

Memory: 3 diagonal buffers of (npairs, Ma+1) plus the O(n) local-cost
vectors — the linear-memory property the reference advertises
(README.rst:26-37), generalized across the pair axis.

Series pools + index indirection (``ia``/``ib``) mirror the reference's
reuse of the precomputed ``DBB`` local costs across all outer iterations
(src/cuTWED_core.h:574-578): per-series local-cost vectors are computed once
per unique series, then gathered per pair.
"""

from __future__ import annotations

import os

import numpy as np

#: scratch-memory guardrail for one sweep call.  The reference enforces
#: compile-time BATCH_LIMIT=65535 / DIMENSION_LIMIT=32 with clear errors
#: (/root/reference/src/cuTWED.cu:38-39, cuTWED_core.h:420-426); our
#: engine's real constraint is worker heap, so the cap is byte-derived:
#: the sweep allocates ~(3 + dim) * P * (M+1) elements of scratch.  A
#: pathological 4096-token bucket at 512 pairs is ~100 MB — fine; this
#: cap (default 8 GiB) catches runaway P x M combinations with an
#: actionable error instead of an OOM-kill.
MAX_SWEEP_BYTES = int(os.environ.get("CUTWED_RAY_MAX_SWEEP_BYTES", 8 << 30))

# Triangle options, mirroring the reference's TRI_OPT enum
# (/root/reference/src/cuTWED.h:24-26).  TRIL computes only strictly-lower
# entries (col < row), TRIU only strictly-upper, rest of the matrix is 0 —
# semantics pinned by the reference's tests (tests/test_batch.py:86-113:
# np.tril(Ref, -1) / np.triu(Ref, 1)).
TRIU = -2
TRIL = -1
NOPT = 0

_TRI_NAMES = {"triu": TRIU, "tril": TRIL, "nopt": NOPT, TRIU: TRIU, TRIL: TRIL, NOPT: NOPT}


def _pool_3d(x, dtype) -> np.ndarray:
    """Coerce a series pool to (S, M, dim)."""
    x = np.ascontiguousarray(x, dtype=dtype)
    if x.ndim == 2:
        x = x[:, :, None]
    if x.ndim != 3:
        raise ValueError(f"series pool must be (S, M) or (S, M, dim), got {x.shape}")
    return x


def _local_costs(X: np.ndarray, deg: int, root: bool) -> np.ndarray:
    """Per-series local edit costs D[s, 0..M]: D[:,0]=0, D[:,1]=||x0||,
    D[:,i]=||x_{i-1}-x_{i-2}|| (semantics of src/cuTWED_core.h:57-86)."""
    S, M, _ = X.shape
    D = np.zeros((S, M + 1), dtype=X.dtype)
    if M >= 1:
        D[:, 1] = _lp(X[:, 0, :], deg, root)
        if M >= 2:
            D[:, 2:] = _lp(X[:, 1:, :] - X[:, :-1, :], deg, root)
    return D


def _lp(x: np.ndarray, deg: int, root: bool) -> np.ndarray:
    s = np.abs(x) ** deg if deg != 2 else x * x
    s = s.sum(axis=-1)
    if not root:
        return s
    if deg == 2:
        return np.sqrt(s)
    return s ** (1.0 / deg)


def _sweep(
    A: np.ndarray, TA: np.ndarray, la: np.ndarray,
    B: np.ndarray, TB: np.ndarray, lb: np.ndarray,
    ia: np.ndarray, ib: np.ndarray,
    nu: float, lamb: float, degree: int,
) -> np.ndarray:
    """Core anti-diagonal sweep.

    A  : (SA, Ma, dim) padded series pool (dtype = working dtype)
    TA : (SA, Ma) timestamps; la: (SA,) true lengths
    ia : (P,) pair -> pool index; same for B side.
    Returns (P,) TWED distances.

    The per-pair arrays are expanded ONCE (A[ia] etc.); each diagonal then
    touches only contiguous / reversed *slices* of those arrays — no fancy
    indexing in the loop.  Cells outside a pair's own (la, lb) rectangle
    are computed with garbage-but-finite values; they are never read by any
    in-rectangle cell (neighbors of an in-rectangle cell are in-rectangle),
    so no masking is needed inside the loop.
    """
    if degree == 0:
        raise ValueError("degree must be nonzero")
    deg, root = abs(int(degree)), degree > 0
    dtype = A.dtype
    P = ia.shape[0]
    if A.shape[2] != B.shape[2]:
        raise ValueError("dimension mismatch between A and B pools")

    dim = A.shape[2]
    est = (3 * (A.shape[1] + 1) + dim * (A.shape[1] + B.shape[1] + 1)
           + 3 * (B.shape[1] + 1)) * max(P, 1) * dtype.itemsize
    if est > MAX_SWEEP_BYTES:
        raise ValueError(
            f"sweep scratch estimate {est >> 20} MiB exceeds MAX_SWEEP_BYTES "
            f"({MAX_SWEEP_BYTES >> 20} MiB): P={P} pairs x padded lengths "
            f"({A.shape[1]}, {B.shape[1]}) x dim={dim}. Reduce the pair batch "
            f"(cfg.score_batch_pairs), truncate series (cfg.max_tokens), or "
            f"raise CUTWED_RAY_MAX_SWEEP_BYTES.")

    # compiled fast path (float64 AND float32 twins, any dim — the twedf
    # parity surface) — same semantics, ~5-12x faster; falls through to the
    # NumPy sweep when no compiler is available
    if dtype in (np.float64, np.float32) and P > 0:
        from cutwed_ray.kernel.ckernel import twed_pairs_c

        res_c = twed_pairs_c(A, TA, la, B, TB, lb, ia, ib, nu, lamb, degree)
        if res_c is not None:
            return res_c

    DAp = _local_costs(A, deg, root)         # (SA, Ma+1) — once per unique series
    DBp = _local_costs(B, deg, root)

    la_p = la[ia].astype(np.int64)
    lb_p = lb[ib].astype(np.int64)
    res = np.full(P, np.inf, dtype=dtype)
    if P == 0:
        return res

    dim = A.shape[2]

    # expand per-pair (one gather per array, then contiguous slices only).
    # The B side is stored REVERSED along the sequence axis with one extra
    # pad column, so every anti-diagonal access below is a forward slice:
    #   value at col c-1  ->  Brev index (Mb - d + r)
    Ae, TAe, DAe = A[ia], TA[ia], DAp[ia]
    Ma = A.shape[1]
    Mb = B.shape[1]
    if dim == 1:
        Ae = np.ascontiguousarray(Ae[:, :, 0])
        Brev = np.zeros((P, Mb + 1), dtype=dtype)
        Brev[:, :Mb] = B[ib, ::-1, 0]
    else:
        Brev = np.zeros((P, Mb + 1, dim), dtype=dtype)
        Brev[:, :Mb] = B[ib, ::-1, :]
    TBrev = np.zeros((P, Mb + 1), dtype=dtype)
    TBrev[:, :Mb] = TB[ib, ::-1]
    DBrev = DBp[ib, ::-1]                      # (P, Mb+1): DBrev[:, k] = DB[:, Mb-k]
    DBrev = np.ascontiguousarray(DBrev)

    if dim == 1 and root:
        lp = np.abs                            # (|x|^p)^(1/p) == |x| in R^1
    elif dim == 1:
        def lp(x, deg=deg):
            return np.abs(x) ** deg            # no-root mode
    else:
        def lp(x, deg=deg, root=root):
            return _lp(x, deg, root)

    nu = dtype.type(nu)
    lamb = dtype.type(lamb)
    INF = dtype.type(np.inf)

    # three rotating diagonal buffers, indexed by absolute DP row
    prev2 = np.full((P, Ma + 1), INF, dtype=dtype)
    prev1 = np.full((P, Ma + 1), INF, dtype=dtype)
    cur = np.full((P, Ma + 1), INF, dtype=dtype)

    pending = int(P)
    dmax = int((la_p + lb_p).max())
    for d in range(dmax + 1):
        prev2, prev1, cur = prev1, cur, prev2
        if d == 0:
            cur[:, 0] = dtype.type(0)
        else:
            # borders of this diagonal: cell (0, d) at buffer index 0 and,
            # when d <= Ma, cell (d, 0) at buffer index d — both infinity
            # (twed.c:162-167).  Interior stale positions are provably never
            # read (any in-rectangle cell's neighbors are in-rectangle), so
            # no other clearing is needed.
            cur[:, 0] = INF
            if d <= Ma:
                cur[:, d] = INF
            lo = max(1, d - Mb)               # rows on this diagonal (col >= 1)
            hi = min(Ma, d - 1)
            if lo <= hi:
                first_r1 = lo == 1            # first position has r == 1
                last_c1 = (d - hi) == 1       # last position has c == 1
                j0 = Mb - d + lo              # Brev index of col (c-1) at r=lo

                # local match cost (src/cuTWED_core.h:137-153)
                a1 = Ae[:, lo - 1:hi]
                b1 = Brev[:, j0:j0 + hi - lo + 1]
                d1 = lp(a1 - b1)
                a2 = Ae[:, max(lo - 2, 0):hi - 1]
                if first_r1:
                    a2 = np.concatenate(
                        [np.zeros((P, 1) + Ae.shape[2:], dtype=dtype), a2], axis=1)
                b2 = Brev[:, j0 + 1:j0 + hi - lo + 2]
                d2 = lp(a2 - b2)
                if first_r1:
                    d2[:, 0] = 0
                if last_c1:
                    d2[:, -1] = 0

                ta1 = TAe[:, lo - 1:hi]
                tb1 = TBrev[:, j0:j0 + hi - lo + 1]
                ta2 = TAe[:, max(lo - 2, 0):hi - 1]
                if first_r1:
                    ta2 = np.concatenate([np.zeros((P, 1), dtype=dtype), ta2], axis=1)
                tb2 = TBrev[:, j0 + 1:j0 + hi - lo + 2]

                # case 1, keep both (src/cuTWED_core.h:169-175)
                ht2 = np.abs(ta2 - tb2)
                if first_r1:
                    ht2[:, 0] = 0
                if last_c1:
                    ht2[:, -1] = 0
                val = prev2[:, lo - 1:hi] + (d1 + d2 + nu * (np.abs(ta1 - tb1) + ht2))

                # case 2, delete point in A (src/cuTWED_core.h:177-183)
                dta = ta1 - ta2
                if first_r1:
                    dta[:, 0] = ta1[:, 0]     # r == 1 -> htrans = TA[0]
                np.minimum(
                    val,
                    DAe[:, lo:hi + 1] + prev1[:, lo - 1:hi] + (lamb + nu * dta),
                    out=val,
                )

                # case 3, delete point in B (src/cuTWED_core.h:185-191)
                dtb = tb1 - tb2
                if last_c1:
                    dtb[:, -1] = tb1[:, -1]   # c == 1 -> htrans = TB[0]
                np.minimum(
                    val,
                    DBrev[:, j0:j0 + hi - lo + 1] + prev1[:, lo:hi + 1] + (lamb + nu * dtb),
                    out=val,
                )
                cur[:, lo:hi + 1] = val

        done = (la_p + lb_p) == d
        if done.any():
            res[done] = cur[done, la_p[done]]
            pending -= int(done.sum())
            if pending == 0:
                break

    return res


def _prep_side(X, TX, dtype):
    """Normalize one equal-length stack: X (S,n) or (S,n,dim), TX (S,n)."""
    X = _pool_3d(np.atleast_2d(np.asarray(X)), dtype)
    TX = np.ascontiguousarray(np.atleast_2d(np.asarray(TX)), dtype=dtype)
    if TX.shape != X.shape[:2]:
        raise ValueError(f"timestamps shape {TX.shape} != series shape {X.shape[:2]}")
    lens = np.full(X.shape[0], X.shape[1], dtype=np.int64)
    return X, TX, lens


def twed(A, TA, B, TB, nu: float, lamb: float, degree: int = 2) -> float:
    """Single-pair TWED (parity with cuTWED/cuTWED.py:37-88 ``twed``).

    A, B: (n,) or (n, dim); TA, TB: (n,).  dtype follows the inputs
    (float32 in → float32 math, like the reference's twed/twedf split).
    """
    dtype = np.dtype(np.float32) if np.asarray(A).dtype == np.float32 else np.dtype(np.float64)
    Aa = np.asarray(A, dtype=dtype)
    Ba = np.asarray(B, dtype=dtype)
    if Aa.ndim == 1:
        Aa = Aa[:, None]
    if Ba.ndim == 1:
        Ba = Ba[:, None]
    TAa = np.asarray(TA, dtype=dtype).ravel()
    TBa = np.asarray(TB, dtype=dtype).ravel()
    if TAa.shape[0] != Aa.shape[0] or TBa.shape[0] != Ba.shape[0]:
        raise ValueError("timestamp length must match series length")
    idx = np.zeros(1, dtype=np.int64)
    out = _sweep(
        Aa[None, :, :], TAa[None, :], np.array([Aa.shape[0]]),
        Ba[None, :, :], TBa[None, :], np.array([Ba.shape[0]]),
        idx, idx, nu, lamb, degree,
    )
    return float(out[0])


def twed_batch(AA, TAA, BB, TBB, nu: float, lamb: float, degree: int = 2, tri=NOPT) -> np.ndarray:
    """All-pairs TWED matrix (parity with cuTWED/cuTWED.py:211-271).

    AA: (nAA, nA) or (nAA, nA, dim); TAA: (nAA, nA); same for B side.
    Returns (nAA, nBB) matrix in the input dtype.  ``tri``:
      NOPT/'nopt' — full matrix;
      TRIL/'tril' — only col < row computed (rest 0), requires nAA == nBB;
      TRIU/'triu' — only col > row computed (rest 0), requires nAA == nBB.
    Like the reference (src/cuTWED_core.h:583-620) we loop over A rows and
    vectorize across the whole B side; per-series local costs are computed
    once for the entire pool.
    """
    try:
        tri = _TRI_NAMES[tri if not isinstance(tri, str) else tri.lower()]
    except KeyError:
        raise ValueError(f"invalid tri option {tri!r}") from None
    AAa = np.asarray(AA)
    dtype = np.dtype(np.float32) if AAa.dtype == np.float32 else np.dtype(np.float64)
    A, TA, la = _prep_side(AA, TAA, dtype)
    B, TB, lb = _prep_side(BB, TBB, dtype)
    nAA, nBB = A.shape[0], B.shape[0]
    if tri != NOPT and nAA != nBB:
        raise ValueError("tril/triu require a square batch (nAA == nBB)")

    res = np.zeros((nAA, nBB), dtype=dtype)
    ib_all = np.arange(nBB, dtype=np.int64)
    for a in range(nAA):
        if tri == TRIL:
            ib = ib_all[:a]
        elif tri == TRIU:
            ib = ib_all[a + 1:]
        else:
            ib = ib_all
        if ib.size == 0:
            continue
        ia = np.full(ib.size, a, dtype=np.int64)
        res[a, ib] = _sweep(A, TA, la, B, TB, lb, ia, ib, nu, lamb, degree)
    return res


def twed_pairs(
    series_a, ts_a, series_b, ts_b,
    nu: float, lamb: float, degree: int = 2,
    dtype=np.float64,
    pool_a=None, pool_b=None,
) -> np.ndarray:
    """Score a list of (possibly variable-length) series pairs in one sweep.

    Two calling conventions:

    1. ``twed_pairs([a0, a1, ...], [ta0, ...], [b0, ...], [tb0, ...], ...)``
       — sequences of per-pair 1-D/2-D arrays; padded internally.
    2. ``twed_pairs(ia, None, ib, None, ..., pool_a=(A, TA, la), pool_b=...)``
       — index arrays into shared padded pools (A: (S, M, dim), TA: (S, M),
       la: (S,)); used by the scorer stage so each unique series is stored
       and preprocessed once per batch no matter how many pairs touch it.

    Returns (P,) float distances.
    """
    dtype = np.dtype(dtype)
    if pool_a is not None:
        A, TA, la = pool_a
        B, TB, lb = pool_b
        ia = np.asarray(series_a, dtype=np.int64)
        ib = np.asarray(series_b, dtype=np.int64)
        return _sweep(
            _pool_3d(A, dtype), np.ascontiguousarray(TA, dtype=dtype), np.asarray(la),
            _pool_3d(B, dtype), np.ascontiguousarray(TB, dtype=dtype), np.asarray(lb),
            ia, ib, nu, lamb, degree,
        )

    A, TA, la = pack_series(series_a, ts_a, dtype)
    B, TB, lb = pack_series(series_b, ts_b, dtype)
    idx = np.arange(A.shape[0], dtype=np.int64)
    return _sweep(A, TA, la, B, TB, lb, idx, idx, nu, lamb, degree)


def pack_series(series, ts, dtype=np.float64):
    """Pad a list of variable-length series into a (S, M, dim) pool.

    Returns (X, TX, lens); padding is zeros (masked out by the sweep).
    """
    dtype = np.dtype(dtype)
    arrs = [np.asarray(s, dtype=dtype) for s in series]
    arrs = [a[:, None] if a.ndim == 1 else a for a in arrs]
    tss = [np.asarray(t, dtype=dtype).ravel() for t in ts]
    S = len(arrs)
    if S == 0:
        return (np.zeros((0, 0, 1), dtype=dtype), np.zeros((0, 0), dtype=dtype),
                np.zeros(0, dtype=np.int64))
    dim = arrs[0].shape[1]
    lens = np.array([a.shape[0] for a in arrs], dtype=np.int64)
    M = int(lens.max()) if S else 0
    X = np.zeros((S, M, dim), dtype=dtype)
    TX = np.zeros((S, M), dtype=dtype)
    for i, (a, t) in enumerate(zip(arrs, tss)):
        if a.shape[0] != t.shape[0]:
            raise ValueError("timestamp length must match series length")
        X[i, : a.shape[0], :] = a
        TX[i, : t.shape[0]] = t
    return X, TX, lens
