"""Optional CuPy drop-in backend (SURVEY.md §2.2 #11), LINEAR memory.

The reference IS a GPU library (/root/reference/src/cuTWED_core.h:407-690:
one CUDA thread per anti-diagonal cell, a 2-D grid over the batch) and its
headline feature is the linear-memory sweep — the TWED dynamic program
depends only on the previous two anti-diagonals, so three rotating
diagonal buffers replace the O(n^2) DP matrix (README.rst:26-37,
src/cuTWED_core.h:210-226).  This module is that same algorithm expressed
with generic array-module (``xp``) kernels: each anti-diagonal step is a
handful of fused element-wise ops over a (P, diag) slab — vectorized
across BOTH the diagonal axis and the pair axis, the shape GPUs want —
and peak scratch is O(P * (Ma + Mb)), never O(P * Ma * Mb).  At the
reference's own benchmark shape (20,000-point series) the full DP cube
would be ~3.2 GB *per pair*; this sweep needs a few MB.

The sweep body is written against a generic array module ``xp`` so the
IDENTICAL code runs under NumPy (tested in CI against the production
kernel — this sandbox has no GPU) and under CuPy when available.

Usage::

    from cutwed_ray.kernel.gpu import twed_pairs_gpu, gpu_available
    if gpu_available():
        d = twed_pairs_gpu(ia, ib, pool_a=(A, TA, la), pool_b=(B, TB, lb),
                           nu=1.0, lamb=1.0, degree=2)

Scoring stages can swap this in for ``_sweep`` per actor/worker (the
"one GPU actor per device" pattern: ``map_batches(..., num_gpus=1)``).
"""

from __future__ import annotations

import numpy as np

from cutwed_ray.kernel.batch import MAX_SWEEP_BYTES


def gpu_available() -> bool:
    try:
        import cupy  # noqa: F401

        return cupy.cuda.runtime.getDeviceCount() > 0
    except Exception:
        return False


def sweep_scratch_elements(P: int, Ma: int, Mb: int, SA: int, SB: int) -> int:
    """Persistent scratch (in dtype elements) allocated by ``_sweep_xp``:
    3 rotating diagonal buffers of (P, Ma+1) plus per-SERIES local-cost
    and deletion-cost pools — linear in Ma + Mb, independent of Ma * Mb.
    (Transient per-diagonal temporaries add a few additional
    O(P * min(Ma, Mb)) slabs.)"""
    return 3 * P * (Ma + 1) + SA * (2 * Ma + 1) + SB * (2 * Mb + 1)


def _sweep_xp(xp, A, TA, la, B, TB, lb, ia, ib, nu, lamb, degree):
    """Generic LINEAR-MEMORY anti-diagonal TWED sweep over array module
    ``xp`` (numpy or cupy).  Shapes as in ``batch._sweep``: A (SA, Ma, dim),
    TA (SA, Ma), la (SA,), index arrays ia/ib (P,).  Returns (P,) xp array.

    Three rotating (P, Ma+1) diagonal buffers indexed by DP row replace the
    full (P, Ma+1, Mb+1) cube (the reference's 3-buffer rotation,
    src/cuTWED_core.h:210-226); per-diagonal inputs are gathered straight
    from the series POOLS (2-D fancy index over (pair, position)) so no
    per-pair O(M) expansion is materialized either.  Border cells (row 0 /
    col 0 beyond the origin) are +inf exactly like the reference
    (twed.c:162-167); stale interior buffer cells are never read by any
    in-rectangle cell.  A pair's result is read off the buffer on diagonal
    ``la + lb``, with early exit once every pair is done.
    """
    deg, root = abs(int(degree)), degree > 0
    if degree == 0:
        raise ValueError("degree must be nonzero")
    dtype = A.dtype
    P = int(ia.shape[0])
    INF = dtype.type(np.inf) if xp is np else xp.asarray(np.inf, dtype=dtype)

    def lp(x):
        s = xp.abs(x) ** deg if deg != 2 else x * x
        s = s.sum(axis=-1)
        if not root:
            return s
        return xp.sqrt(s) if deg == 2 else s ** (1.0 / deg)

    Ma, Mb = int(A.shape[1]), int(B.shape[1])
    la_p = la[ia].astype(xp.int64)
    lb_p = lb[ib].astype(xp.int64)

    # per-SERIES local edit costs D*(i): ||x_0|| at i=1, ||x_{i-1}-x_{i-2}||
    # beyond (src/cuTWED_core.h:57-86) — once per unique series, O(S * M)
    SA, SB = int(A.shape[0]), int(B.shape[0])
    DA = xp.zeros((SA, Ma + 1), dtype=dtype)
    if Ma >= 1:
        DA[:, 1] = lp(A[:, 0, :])
        if Ma >= 2:
            DA[:, 2:] = lp(A[:, 1:, :] - A[:, :-1, :])
    DB = xp.zeros((SB, Mb + 1), dtype=dtype)
    if Mb >= 1:
        DB[:, 1] = lp(B[:, 0, :])
        if Mb >= 2:
            DB[:, 2:] = lp(B[:, 1:, :] - B[:, :-1, :])

    # per-SERIES deletion costs, indexed by (row i)-1 / (col j)-1:
    # delA[s, i-1] = DA[s, i] + lamb + nu * (TA[i-1] - TA[i-2]), with
    # htrans = TA[0] at i == 1 (src/cuTWED_core.h:177-191)
    dta = TA.copy()
    dta[:, 1:] = TA[:, 1:] - TA[:, :-1]
    delA = DA[:, 1:] + lamb + nu * dta                            # (SA, Ma)
    dtb = TB.copy()
    dtb[:, 1:] = TB[:, 1:] - TB[:, :-1]
    delB = DB[:, 1:] + lamb + nu * dtb                            # (SB, Mb)

    ia_c = ia[:, None]
    ib_c = ib[:, None]

    # three rotating diagonal buffers, indexed by absolute DP row
    prev2 = xp.full((P, Ma + 1), INF, dtype=dtype)
    prev1 = xp.full((P, Ma + 1), INF, dtype=dtype)
    cur = xp.full((P, Ma + 1), INF, dtype=dtype)
    res = xp.full((P,), INF, dtype=dtype)

    pending = P
    dmax = int((la_p + lb_p).max()) if P else -1
    for d in range(dmax + 1):
        prev2, prev1, cur = prev1, cur, prev2
        if d == 0:
            cur[:, 0] = 0
        else:
            cur[:, 0] = INF                   # cell (0, d)
            if d <= Ma:
                cur[:, d] = INF               # cell (d, 0)
            i_lo, i_hi = max(1, d - Mb), min(Ma, d - 1)
            if i_lo <= i_hi:
                i_idx = xp.arange(i_lo, i_hi + 1)
                j_idx = d - i_idx
                first_r1 = i_lo == 1          # position 0 has row == 1
                last_c1 = (d - i_hi) == 1     # last position has col == 1
                i1, j1 = i_idx - 1, j_idx - 1
                i2 = xp.maximum(i_idx - 2, 0)
                j2 = xp.maximum(j_idx - 2, 0)

                # match cost (src/cuTWED_core.h:137-175): d(a_i, b_j) +
                # d(a_{i-1}, b_{j-1}) + nu * (|ta_i - tb_j| + |ta_{i-1} -
                # tb_{j-1}|), the second terms dropping out at row/col 1
                d1 = lp(A[ia_c, i1[None, :]] - B[ib_c, j1[None, :]])
                d2 = lp(A[ia_c, i2[None, :]] - B[ib_c, j2[None, :]])
                ta1 = TA[ia_c, i1[None, :]]
                tb1 = TB[ib_c, j1[None, :]]
                ht2 = xp.abs(TA[ia_c, i2[None, :]] - TB[ib_c, j2[None, :]])
                # the (a_{i-1}, b_{j-1}) terms drop out at row == 1 (only
                # position 0 of the diagonal) and col == 1 (only the last)
                if first_r1:
                    d2[:, 0] = 0
                    ht2[:, 0] = 0
                if last_c1:
                    d2[:, -1] = 0
                    ht2[:, -1] = 0
                val = prev2[:, i1] + (d1 + d2 + nu * (xp.abs(ta1 - tb1) + ht2))
                val = xp.minimum(val, prev1[:, i1] + delA[ia_c, i1[None, :]])
                val = xp.minimum(val, prev1[:, i_idx] + delB[ib_c, j1[None, :]])
                cur[:, i_idx] = val

        done = (la_p + lb_p) == d
        if bool(done.any()):
            res[done] = cur[done, la_p[done]]
            pending -= int(done.sum())
            if pending == 0:
                break

    return res


def twed_pairs_gpu(ia, ib, pool_a, pool_b, nu, lamb, degree=2, xp=None,
                   max_scratch_bytes: int | None = None):
    """CuPy-backed pair scoring (drop-in for the pool form of
    ``twed_pairs``).  ``xp=None`` selects cupy when a device is present,
    else numpy (so the call is always safe — CPU fallback is the tested
    path in this GPU-less sandbox).

    Scratch is byte-guarded like ``batch.MAX_SWEEP_BYTES``: if the
    estimated sweep scratch for the whole pair batch exceeds
    ``max_scratch_bytes`` (default MAX_SWEEP_BYTES), the pair axis is
    CHUNKED — each chunk sweeps independently, results concatenate — so a
    batch the CPU path accepts can never OOM the device."""
    from cutwed_ray.kernel.batch import _pool_3d

    if xp is None:
        if gpu_available():
            import cupy as xp  # type: ignore
        else:
            xp = np
    A, TA, la = pool_a
    B, TB, lb = pool_b
    A = xp.asarray(_pool_3d(np.asarray(A), np.float64))
    B = xp.asarray(_pool_3d(np.asarray(B), np.float64))
    TA = xp.asarray(np.ascontiguousarray(TA, dtype=np.float64))
    TB = xp.asarray(np.ascontiguousarray(TB, dtype=np.float64))
    la = xp.asarray(np.asarray(la, dtype=np.int64))
    lb = xp.asarray(np.asarray(lb, dtype=np.int64))
    ia = xp.asarray(np.asarray(ia, dtype=np.int64))
    ib = xp.asarray(np.asarray(ib, dtype=np.int64))

    P = int(ia.shape[0])
    Ma, Mb = int(A.shape[1]), int(B.shape[1])
    budget = MAX_SWEEP_BYTES if max_scratch_bytes is None else max_scratch_bytes
    # persistent + ~10 transient (P, min(Ma,Mb)) slabs per diagonal step
    per_pair = (3 * (Ma + 1) + 10 * min(Ma, Mb)) * 8
    fixed = (int(A.shape[0]) * (2 * Ma + 1) + int(B.shape[0]) * (2 * Mb + 1)) * 8
    chunk = max(1, int((budget - fixed) // per_pair)) if per_pair else P
    if P <= chunk:
        out = _sweep_xp(xp, A, TA, la, B, TB, lb, ia, ib, nu, lamb, degree)
    else:
        parts = [_sweep_xp(xp, A, TA, la, B, TB, lb, ia[s:s + chunk],
                           ib[s:s + chunk], nu, lamb, degree)
                 for s in range(0, P, chunk)]
        out = xp.concatenate(parts)
    return np.asarray(out.get()) if hasattr(out, "get") else out
