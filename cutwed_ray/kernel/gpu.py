"""Optional CuPy drop-in backend (SURVEY.md §2.2 #11).

The reference IS a GPU library (/root/reference/src/cuTWED_core.h:407-690:
one CUDA thread per anti-diagonal cell, a 2-D grid over the batch); this
module is the same parallelization expressed with CuPy array kernels: the
anti-diagonal sweep vectorizes across BOTH the diagonal axis and the pair
axis, so every step is one fused element-wise kernel over a (P, diag)
slab — exactly the shape GPUs want.

The sweep body is written against a generic array module ``xp`` so the
IDENTICAL code runs under NumPy (tested in CI against the production
kernel — this sandbox has no GPU) and under CuPy when available.  Unlike
``batch._sweep`` (which uses reversed-slice tricks and a compiled C fast
path), this implementation favors simplicity: padded rectangles, masked
cells, no early exit — the GPU hides the wasted lanes.

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


def gpu_available() -> bool:
    try:
        import cupy  # noqa: F401

        return cupy.cuda.runtime.getDeviceCount() > 0
    except Exception:
        return False


def _sweep_xp(xp, A, TA, la, B, TB, lb, ia, ib, nu, lamb, degree):
    """Generic anti-diagonal TWED sweep over array module ``xp``
    (numpy or cupy).  Shapes as in ``batch._sweep``: A (SA, Ma, dim),
    TA (SA, Ma), la (SA,), index arrays ia/ib (P,).  Returns (P,) xp array.

    Cells outside a pair's (la, lb) rectangle are masked to +inf on the
    borders exactly like the reference (twed.c:162-167); interior garbage
    cells are never read by in-rectangle cells.
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

    # per-pair padded arrays (P, M, dim) / (P, M)
    Ae, TAe = A[ia], TA[ia]
    Be, TBe = B[ib], TB[ib]
    la_p = la[ia].astype(xp.int64)
    lb_p = lb[ib].astype(xp.int64)
    Ma, Mb = int(A.shape[1]), int(B.shape[1])

    # local edit costs D*(i): ||x_0|| at i=1, ||x_{i-1}-x_{i-2}|| beyond
    DA = xp.zeros((P, Ma + 1), dtype=dtype)
    if Ma >= 1:
        DA[:, 1] = lp(Ae[:, 0, :])
        if Ma >= 2:
            DA[:, 2:] = lp(Ae[:, 1:, :] - Ae[:, :-1, :])
    DB = xp.zeros((P, Mb + 1), dtype=dtype)
    if Mb >= 1:
        DB[:, 1] = lp(Be[:, 0, :])
        if Mb >= 2:
            DB[:, 2:] = lp(Be[:, 1:, :] - Be[:, :-1, :])

    # full DP matrix (P, Ma+1, Mb+1) — simple-and-parallel beats clever on
    # a GPU at these sizes; the linear-memory variant is batch._sweep
    D = xp.full((P, Ma + 1, Mb + 1), INF, dtype=dtype)
    D[:, 0, 0] = 0

    rows = xp.arange(1, Ma + 1)
    cols = xp.arange(1, Mb + 1)

    # precompute (P, Ma, Mb) local costs once — element-wise, GPU-friendly
    d1 = lp(Ae[:, :, None, :] - Be[:, None, :, :])                # (P,Ma,Mb)
    a2 = xp.zeros_like(Ae)
    a2[:, 1:] = Ae[:, :-1]
    b2 = xp.zeros_like(Be)
    b2[:, 1:] = Be[:, :-1]
    d2 = lp(a2[:, :, None, :] - b2[:, None, :, :])
    ht1 = xp.abs(TAe[:, :, None] - TBe[:, None, :])
    ta2 = xp.zeros_like(TAe)
    ta2[:, 1:] = TAe[:, :-1]
    tb2 = xp.zeros_like(TBe)
    tb2[:, 1:] = TBe[:, :-1]
    ht2 = xp.abs(ta2[:, :, None] - tb2[:, None, :])
    both_first = (rows[:, None] == 1) | (cols[None, :] == 1)
    d2 = xp.where(both_first[None, :, :], 0.0, d2)
    ht2 = xp.where(both_first[None, :, :], 0.0, ht2)
    match_cost = d1 + d2 + nu * (ht1 + ht2)

    dta = TAe.copy()
    dta[:, 1:] = TAe[:, 1:] - TAe[:, :-1]
    delA_cost = DA[:, 1:] + lamb + nu * dta                       # (P, Ma)
    dtb = TBe.copy()
    dtb[:, 1:] = TBe[:, 1:] - TBe[:, :-1]
    delB_cost = DB[:, 1:] + lamb + nu * dtb                       # (P, Mb)

    # anti-diagonal wavefront: all cells with i+j == d update at once
    for d in range(2, Ma + Mb + 1):
        i_lo, i_hi = max(1, d - Mb), min(Ma, d - 1)
        if i_lo > i_hi:
            continue
        i_idx = xp.arange(i_lo, i_hi + 1)
        j_idx = d - i_idx
        keep = D[:, i_idx - 1, j_idx - 1] + match_cost[:, i_idx - 1, j_idx - 1]
        delA = D[:, i_idx - 1, j_idx] + delA_cost[:, i_idx - 1]
        delB = D[:, i_idx, j_idx - 1] + delB_cost[:, j_idx - 1]
        D[:, i_idx, j_idx] = xp.minimum(keep, xp.minimum(delA, delB))

    p_idx = xp.arange(P)
    return D[p_idx, la_p, lb_p]


def twed_pairs_gpu(ia, ib, pool_a, pool_b, nu, lamb, degree=2, xp=None):
    """CuPy-backed pair scoring (drop-in for the pool form of
    ``twed_pairs``).  ``xp=None`` selects cupy when a device is present,
    else numpy (so the call is always safe — CPU fallback is the tested
    path in this GPU-less sandbox)."""
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
    out = _sweep_xp(xp, A, TA, la, B, TB, lb, ia, ib, nu, lamb, degree)
    return np.asarray(out.get()) if hasattr(out, "get") else out
