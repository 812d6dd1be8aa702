"""O(n²)-memory reference TWED — the conformance oracle.

Reimplements the *semantics* of the reference CPU implementation
(/root/reference/reference_implementation/twed.c:74-210, Marteau 2009
"Time Warp Edit Distance with Stiffness Adjustment", TPAMI 31(2)) in pure
NumPy.  This is deliberately the slow, obviously-correct full-DP-matrix
version used only in tests and property checks; the production scorer is
the linear-memory anti-diagonal kernel in ``cutwed_ray.kernel.batch``.

Semantics (all array indices 0-based; DP matrix is (la+1) x (lb+1)):

  local edit costs
      Di1[i] = ||a_{i-1} - a_{i-2}||_p  for i > 1,  ||a_0||_p for i == 1
      Dj1[j] symmetric for B                          (twed.c:103-137)
  match cost
      M[i][j] = ||a_{i-1} - b_{j-1}||_p
              + ||a_{i-2} - b_{j-2}||_p if i>1 and j>1 else 0   (twed.c:139-159)
  borders    D[0][0] = 0; D[i][0] = D[0][j] = inf    (twed.c:162-167)
  recurrence (twed.c:170-199)
      keep  = D[i-1][j-1] + M[i][j] + nu*(|ta_{i-1}-tb_{j-1}|
                                          + |ta_{i-2}-tb_{j-2}| if i>1 and j>1)
      delA  = Di1[i] + D[i-1][j] + lambda + nu*(ta_{i-1}-ta_{i-2} if i>1 else ta_0)
      delB  = Dj1[j] + D[i][j-1] + lambda + nu*(tb_{j-1}-tb_{j-2} if j>1 else tb_0)
      D[i][j] = min(keep, delA, delB)
  result     D[la][lb]

A negative ``degree`` reproduces the original author's "no p-th root" mode
(twed.c:113-119) — |.|^|p| sums without the root.  Note the deletion-case
time deltas are *signed* (monotone timestamps are assumed), while the match
case uses absolute differences — both faithful to the reference.
"""

from __future__ import annotations

import numpy as np


def _as_2d(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2:
        raise ValueError(f"series must be 1-D or 2-D, got shape {x.shape}")
    return x


def _lp(x: np.ndarray, deg: int, root: bool) -> np.ndarray:
    """Lp 'norm' along the last axis; no root when root=False (negative-degree mode)."""
    s = np.sum(np.abs(x) ** deg, axis=-1)
    if not root:
        return s
    if deg == 2:
        return np.sqrt(s)
    return s ** (1.0 / deg)


def twed_ref(A, TA, B, TB, nu: float, lamb: float, degree: int = 2) -> float:
    """Reference O(n²) TWED distance between series A and B.

    A, B   : (n,) or (n, dim) float arrays
    TA, TB : (n,) monotone timestamps
    """
    if degree == 0:
        raise ValueError("degree must be nonzero")
    deg, root = abs(int(degree)), degree > 0

    A, B = _as_2d(A), _as_2d(B)
    TA = np.asarray(TA, dtype=np.float64).ravel()
    TB = np.asarray(TB, dtype=np.float64).ravel()
    la, lb = A.shape[0], B.shape[0]
    if TA.shape[0] != la or TB.shape[0] != lb:
        raise ValueError("timestamp length must match series length")
    if A.shape[1] != B.shape[1]:
        raise ValueError("series dimensionality mismatch")

    # Local edit costs (twed.c:103-137): D*1[0] unused, D*1[1] = ||x0||,
    # D*1[i] = ||x_{i-1} - x_{i-2}||.
    Di1 = np.empty(la + 1)
    Dj1 = np.empty(lb + 1)
    Di1[0] = Dj1[0] = 0.0
    if la:
        Di1[1] = _lp(A[0], deg, root)
        Di1[2:] = _lp(A[1:] - A[:-1], deg, root)
    if lb:
        Dj1[1] = _lp(B[0], deg, root)
        Dj1[2:] = _lp(B[1:] - B[:-1], deg, root)

    # Match-cost matrix (twed.c:139-159): vectorized; M[i, j] for i,j >= 1.
    d1 = _lp(A[:, None, :] - B[None, :, :], deg, root)       # (la, lb)
    M = np.zeros((la + 1, lb + 1))
    M[1:, 1:] = d1
    if la > 1 and lb > 1:
        M[2:, 2:] += _lp(A[:-1, None, :] - B[None, :-1, :], deg, root)

    D = np.full((la + 1, lb + 1), np.inf)
    D[0, 0] = 0.0

    for i in range(1, la + 1):
        dta = TA[i - 1] - TA[i - 2] if i > 1 else TA[0]
        for j in range(1, lb + 1):
            htrans = abs(TA[i - 1] - TB[j - 1])
            if i > 1 and j > 1:
                htrans += abs(TA[i - 2] - TB[j - 2])
            keep = D[i - 1, j - 1] + M[i, j] + nu * htrans

            cost = Di1[i] + D[i - 1, j] + lamb + nu * dta
            if cost < keep:
                keep = cost

            dtb = TB[j - 1] - TB[j - 2] if j > 1 else TB[0]
            cost = Dj1[j] + D[i, j - 1] + lamb + nu * dtb
            if cost < keep:
                keep = cost
            D[i, j] = keep

    return float(D[la, lb])
