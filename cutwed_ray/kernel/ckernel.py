"""Optional compiled TWED kernel (dim=1 fast path) with pure-NumPy fallback.

The reference ships a native kernel behind a thin Python wrapper
(/root/reference/src/cuTWED_core.h + cffi); we do the same for CPU: a ~60
line C routine — the classic two-rolling-row TWED DP per pair — compiled
once per machine with the system compiler into a cached shared object and
loaded via ctypes.  If no compiler is available the vectorized NumPy
anti-diagonal sweep in ``batch.py`` is used instead (same semantics,
~5-8x slower); set ``CUTWED_RAY_NO_CKERNEL=1`` to force the fallback.

Semantics are identical to ``kernel.reference.twed_ref`` (twed.c:74-210);
conformance is pinned by tests/test_kernel_golden.py which runs the golden
fixtures through BOTH backends.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = r"""
#include <math.h>
#include <stdint.h>

#define HUGE_SENTINEL 1e300

/* Lp "norm" of a scalar: with root it is |x| for every p; without (the
   reference's negative-degree repro mode) it is |x|^p. */
static inline double lp1(double x, int deg, int root) {
    double a = fabs(x);
    if (root || deg == 1) return a;
    if (deg == 2) return a * a;
    return pow(a, (double)deg);
}

/* One pair, values in R^1.  A,TA of length la; B,TB of length lb.
   rowbuf: scratch of 2*(lb+1); dbc: scratch of (lb+1). */
static double twed_one(const double* A, const double* TA, int64_t la,
                       const double* B, const double* TB, int64_t lb,
                       double nu, double lamb, int deg, int root,
                       double* rowbuf, double* dbc) {
    if (la == 0 && lb == 0) return 0.0;
    double* prev = rowbuf;
    double* curr = rowbuf + (lb + 1);

    /* per-B local delete costs + time penalties, hoisted out of the i loop
       (the analogue of the reference's precomputed DBB,
       src/cuTWED_core.h:574-578) */
    for (int64_t j = 1; j <= lb; j++) {
        double dbj = (j > 1) ? lp1(B[j-1] - B[j-2], deg, root) : lp1(B[j-1], deg, root);
        double dtb = (j > 1) ? (TB[j-1] - TB[j-2]) : TB[0];
        dbc[j] = dbj + lamb + nu * dtb;
    }

    prev[0] = 0.0;
    for (int64_t j = 1; j <= lb; j++) prev[j] = HUGE_SENTINEL;

    for (int64_t i = 1; i <= la; i++) {
        curr[0] = HUGE_SENTINEL;
        const double ai1 = A[i-1];
        const double tai1 = TA[i-1];
        const double dai = (i > 1) ? lp1(ai1 - A[i-2], deg, root) : lp1(ai1, deg, root);
        const double dta = (i > 1) ? (tai1 - TA[i-2]) : TA[0];
        const double dac = dai + lamb + nu * dta;
        const double ai2 = (i > 1) ? A[i-2] : 0.0;
        const double tai2 = (i > 1) ? TA[i-2] : 0.0;

        /* j == 1 cell (no two-term cost unless i>1 as well — and j==1 never has it) */
        {
            double d1 = lp1(ai1 - B[0], deg, root);
            double ht = fabs(tai1 - TB[0]);
            double keep = prev[0] + d1 + nu * ht;
            double delA = dac + prev[1];
            double delB = dbc[1] + curr[0];
            double m = keep < delA ? keep : delA;
            curr[1] = m < delB ? m : delB;
        }
        if (i == 1) {
            for (int64_t j = 2; j <= lb; j++) {
                double d1 = lp1(ai1 - B[j-1], deg, root);
                double ht = fabs(tai1 - TB[j-1]);
                double keep = prev[j-1] + d1 + nu * ht;
                double delA = dac + prev[j];
                double delB = dbc[j] + curr[j-1];
                double m = keep < delA ? keep : delA;
                curr[j] = m < delB ? m : delB;
            }
        } else {
            for (int64_t j = 2; j <= lb; j++) {
                double d = lp1(ai1 - B[j-1], deg, root) + lp1(ai2 - B[j-2], deg, root);
                double ht = fabs(tai1 - TB[j-1]) + fabs(tai2 - TB[j-2]);
                double keep = prev[j-1] + d + nu * ht;
                double delA = dac + prev[j];
                double delB = dbc[j] + curr[j-1];
                double m = keep < delA ? keep : delA;
                curr[j] = m < delB ? m : delB;
            }
        }
        double* t = prev; prev = curr; curr = t;
    }
    double r = prev[lb];
    return r >= HUGE_SENTINEL ? INFINITY : r;
}

/* Batch over index pairs into a shared padded pool (X,TX row-major (S, M)). */
void twed_pairs_pool(const double* XA, const double* TXA, const int64_t* la,
                     int64_t Ma,
                     const double* XB, const double* TXB, const int64_t* lb,
                     int64_t Mb,
                     const int64_t* ia, const int64_t* ib, int64_t P,
                     double nu, double lamb, int deg, int root,
                     double* rowbuf, double* dbc, double* out) {
    for (int64_t p = 0; p < P; p++) {
        const int64_t a = ia[p], b = ib[p];
        out[p] = twed_one(XA + a * Ma, TXA + a * Ma, la[a],
                          XB + b * Mb, TXB + b * Mb, lb[b],
                          nu, lamb, deg, root, rowbuf, dbc);
    }
}

/* ---- R^dim variant (semantics of src/cuTWED_core.h lpnorm + twed.c) ---- */
static inline double lpd(const double* x, const double* y, int dim, int deg, int root) {
    double s = 0.0;
    for (int d = 0; d < dim; d++) {
        double a = fabs(x[d] - (y ? y[d] : 0.0));
        s += (deg == 2) ? a * a : pow(a, (double)deg);
    }
    if (!root) return s;
    if (deg == 2) return sqrt(s);
    return pow(s, 1.0 / (double)deg);
}

static double twed_one_nd(const double* A, const double* TA, int64_t la,
                          const double* B, const double* TB, int64_t lb,
                          int dim, double nu, double lamb, int deg, int root,
                          double* rowbuf, double* dbc) {
    if (la == 0 && lb == 0) return 0.0;
    double* prev = rowbuf;
    double* curr = rowbuf + (lb + 1);

    for (int64_t j = 1; j <= lb; j++) {
        double dbj = (j > 1) ? lpd(B + (j-1)*dim, B + (j-2)*dim, dim, deg, root)
                             : lpd(B, 0, dim, deg, root);
        double dtb = (j > 1) ? (TB[j-1] - TB[j-2]) : TB[0];
        dbc[j] = dbj + lamb + nu * dtb;
    }

    prev[0] = 0.0;
    for (int64_t j = 1; j <= lb; j++) prev[j] = HUGE_SENTINEL;

    for (int64_t i = 1; i <= la; i++) {
        curr[0] = HUGE_SENTINEL;
        const double* ai1 = A + (i-1)*dim;
        const double tai1 = TA[i-1];
        const double dai = (i > 1) ? lpd(ai1, A + (i-2)*dim, dim, deg, root)
                                   : lpd(ai1, 0, dim, deg, root);
        const double dta = (i > 1) ? (tai1 - TA[i-2]) : TA[0];
        const double dac = dai + lamb + nu * dta;
        const double* ai2 = (i > 1) ? A + (i-2)*dim : 0;

        for (int64_t j = 1; j <= lb; j++) {
            double d = lpd(ai1, B + (j-1)*dim, dim, deg, root);
            double ht = fabs(tai1 - TB[j-1]);
            if (i > 1 && j > 1) {
                d += lpd(ai2, B + (j-2)*dim, dim, deg, root);
                ht += fabs(TA[i-2] - TB[j-2]);
            }
            double keep = prev[j-1] + d + nu * ht;
            double delA = dac + prev[j];
            double delB = dbc[j] + curr[j-1];
            double m = keep < delA ? keep : delA;
            curr[j] = m < delB ? m : delB;
        }
        double* t = prev; prev = curr; curr = t;
    }
    double r = prev[lb];
    return r >= HUGE_SENTINEL ? INFINITY : r;
}

void twed_pairs_pool_nd(const double* XA, const double* TXA, const int64_t* la,
                        int64_t Ma,
                        const double* XB, const double* TXB, const int64_t* lb,
                        int64_t Mb, int dim,
                        const int64_t* ia, const int64_t* ib, int64_t P,
                        double nu, double lamb, int deg, int root,
                        double* rowbuf, double* dbc, double* out) {
    for (int64_t p = 0; p < P; p++) {
        const int64_t a = ia[p], b = ib[p];
        out[p] = twed_one_nd(XA + a * Ma * dim, TXA + a * Ma, la[a],
                             XB + b * Mb * dim, TXB + b * Mb, lb[b],
                             dim, nu, lamb, deg, root, rowbuf, dbc);
    }
}
"""


def _build() -> ctypes.CDLL | None:
    if os.environ.get("CUTWED_RAY_NO_CKERNEL"):
        return None
    tag = hashlib.sha256(_SRC.encode()).hexdigest()[:16]
    cache_dir = os.path.join(tempfile.gettempdir(), "cutwed_ray_ck")
    so_path = os.path.join(cache_dir, f"ck_{tag}.so")
    if not os.path.exists(so_path):
        try:
            os.makedirs(cache_dir, exist_ok=True)
            c_path = os.path.join(cache_dir, f"ck_{tag}.c")
            with open(c_path, "w") as f:
                f.write(_SRC)
            tmp_so = so_path + f".tmp{os.getpid()}"
            subprocess.run(
                ["cc", "-O3", "-fPIC", "-shared", "-fno-math-errno",
                 c_path, "-o", tmp_so, "-lm"],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp_so, so_path)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    d = ctypes.POINTER(ctypes.c_double)
    i64 = ctypes.POINTER(ctypes.c_int64)
    lib.twed_pairs_pool.restype = None
    lib.twed_pairs_pool.argtypes = [
        d, d, i64, ctypes.c_int64,
        d, d, i64, ctypes.c_int64,
        i64, i64, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int,
        d, d, d,
    ]
    lib.twed_pairs_pool_nd.restype = None
    lib.twed_pairs_pool_nd.argtypes = [
        d, d, i64, ctypes.c_int64,
        d, d, i64, ctypes.c_int64, ctypes.c_int,
        i64, i64, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int,
        d, d, d,
    ]
    return lib


_LIB: ctypes.CDLL | None | bool = False   # False = not yet probed


def get_lib() -> ctypes.CDLL | None:
    global _LIB
    if _LIB is False:
        _LIB = _build()
    return _LIB


def _p(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _pi(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def twed_pairs_c(
    A: np.ndarray, TA: np.ndarray, la: np.ndarray,
    B: np.ndarray, TB: np.ndarray, lb: np.ndarray,
    ia: np.ndarray, ib: np.ndarray,
    nu: float, lamb: float, degree: int,
) -> np.ndarray | None:
    """C fast path for float64 pools (any dim); returns None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    dim = 1
    if A.ndim == 3:
        dim = A.shape[2]
        if dim == 1:
            A = A[:, :, 0]
    if B.ndim == 3 and B.shape[2] == 1:
        B = B[:, :, 0]
    A = np.ascontiguousarray(A, dtype=np.float64)
    B = np.ascontiguousarray(B, dtype=np.float64)
    TA = np.ascontiguousarray(TA, dtype=np.float64)
    TB = np.ascontiguousarray(TB, dtype=np.float64)
    la = np.ascontiguousarray(la, dtype=np.int64)
    lb = np.ascontiguousarray(lb, dtype=np.int64)
    ia = np.ascontiguousarray(ia, dtype=np.int64)
    ib = np.ascontiguousarray(ib, dtype=np.int64)
    P = ia.shape[0]
    out = np.empty(P, dtype=np.float64)
    if P == 0:
        return out
    Mb = B.shape[1]
    rowbuf = np.empty(2 * (Mb + 1), dtype=np.float64)
    dbc = np.empty(Mb + 1, dtype=np.float64)
    deg = abs(int(degree))
    root = 1 if degree > 0 else 0
    if dim == 1:
        lib.twed_pairs_pool(
            _p(A), _p(TA), _pi(la), np.int64(A.shape[1]),
            _p(B), _p(TB), _pi(lb), np.int64(Mb),
            _pi(ia), _pi(ib), np.int64(P),
            float(nu), float(lamb), int(deg), int(root),
            _p(rowbuf), _p(dbc), _p(out),
        )
    else:
        lib.twed_pairs_pool_nd(
            _p(A), _p(TA), _pi(la), np.int64(A.shape[1]),
            _p(B), _p(TB), _pi(lb), np.int64(Mb), int(dim),
            _pi(ia), _pi(ib), np.int64(P),
            float(nu), float(lamb), int(deg), int(root),
            _p(rowbuf), _p(dbc), _p(out),
        )
    return out
