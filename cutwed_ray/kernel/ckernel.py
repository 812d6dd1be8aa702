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

# The kernel body is templated over the scalar type (REAL) and instantiated
# for double AND float — the float twins mirror the reference's twed/twedf
# split (/root/reference/src/cuTWED.h:42-53): float32 inputs compute in
# genuine float32 arithmetic, not a cast-through-double.
_BODY = r"""
/* Lp "norm" of a scalar: with root it is |x| for every p; without (the
   reference's negative-degree repro mode) it is |x|^p. */
static inline {R} lp1_{S}({R} x, int deg, int root) {{
    {R} a = {FABS}(x);
    if (root || deg == 1) return a;
    if (deg == 2) return a * a;
    return {POW}(a, ({R})deg);
}}

/* One pair, values in R^1.  A,TA of length la; B,TB of length lb.
   rowbuf: scratch of 2*(lb+1); dbc: scratch of (lb+1). */
static {R} twed_one_{S}(const {R}* A, const {R}* TA, int64_t la,
                       const {R}* B, const {R}* TB, int64_t lb,
                       {R} nu, {R} lamb, int deg, int root,
                       {R}* rowbuf, {R}* dbc) {{
    if (la == 0 && lb == 0) return 0.0;
    {R}* prev = rowbuf;
    {R}* curr = rowbuf + (lb + 1);

    /* per-B local delete costs + time penalties, hoisted out of the i loop
       (the analogue of the reference's precomputed DBB,
       src/cuTWED_core.h:574-578) */
    for (int64_t j = 1; j <= lb; j++) {{
        {R} dbj = (j > 1) ? lp1_{S}(B[j-1] - B[j-2], deg, root) : lp1_{S}(B[j-1], deg, root);
        {R} dtb = (j > 1) ? (TB[j-1] - TB[j-2]) : TB[0];
        dbc[j] = dbj + lamb + nu * dtb;
    }}

    prev[0] = 0.0;
    for (int64_t j = 1; j <= lb; j++) prev[j] = {SENT};

    for (int64_t i = 1; i <= la; i++) {{
        curr[0] = {SENT};
        const {R} ai1 = A[i-1];
        const {R} tai1 = TA[i-1];
        const {R} dai = (i > 1) ? lp1_{S}(ai1 - A[i-2], deg, root) : lp1_{S}(ai1, deg, root);
        const {R} dta = (i > 1) ? (tai1 - TA[i-2]) : TA[0];
        const {R} dac = dai + lamb + nu * dta;
        const {R} ai2 = (i > 1) ? A[i-2] : 0.0;
        const {R} tai2 = (i > 1) ? TA[i-2] : 0.0;

        /* j == 1 cell (no two-term cost unless i>1 as well — and j==1 never has it) */
        {{
            {R} d1 = lp1_{S}(ai1 - B[0], deg, root);
            {R} ht = {FABS}(tai1 - TB[0]);
            {R} keep = prev[0] + d1 + nu * ht;
            {R} delA = dac + prev[1];
            {R} delB = dbc[1] + curr[0];
            {R} m = keep < delA ? keep : delA;
            curr[1] = m < delB ? m : delB;
        }}
        if (i == 1) {{
            for (int64_t j = 2; j <= lb; j++) {{
                {R} d1 = lp1_{S}(ai1 - B[j-1], deg, root);
                {R} ht = {FABS}(tai1 - TB[j-1]);
                {R} keep = prev[j-1] + d1 + nu * ht;
                {R} delA = dac + prev[j];
                {R} delB = dbc[j] + curr[j-1];
                {R} m = keep < delA ? keep : delA;
                curr[j] = m < delB ? m : delB;
            }}
        }} else {{
            for (int64_t j = 2; j <= lb; j++) {{
                {R} d = lp1_{S}(ai1 - B[j-1], deg, root) + lp1_{S}(ai2 - B[j-2], deg, root);
                {R} ht = {FABS}(tai1 - TB[j-1]) + {FABS}(tai2 - TB[j-2]);
                {R} keep = prev[j-1] + d + nu * ht;
                {R} delA = dac + prev[j];
                {R} delB = dbc[j] + curr[j-1];
                {R} m = keep < delA ? keep : delA;
                curr[j] = m < delB ? m : delB;
            }}
        }}
        {R}* t = prev; prev = curr; curr = t;
    }}
    {R} r = prev[lb];
    return r >= {SENT} ? INFINITY : r;
}}

/* Batch over index pairs into a shared padded pool (X,TX row-major (S, M)). */
void twed_pairs_pool{PUB}(const {R}* XA, const {R}* TXA, const int64_t* la,
                     int64_t Ma,
                     const {R}* XB, const {R}* TXB, const int64_t* lb,
                     int64_t Mb,
                     const int64_t* ia, const int64_t* ib, int64_t P,
                     {R} nu, {R} lamb, int deg, int root,
                     {R}* rowbuf, {R}* dbc, {R}* out) {{
    for (int64_t p = 0; p < P; p++) {{
        const int64_t a = ia[p], b = ib[p];
        out[p] = twed_one_{S}(XA + a * Ma, TXA + a * Ma, la[a],
                          XB + b * Mb, TXB + b * Mb, lb[b],
                          nu, lamb, deg, root, rowbuf, dbc);
    }}
}}

/* ---- R^dim variant (semantics of src/cuTWED_core.h lpnorm + twed.c) ---- */
static inline {R} lpd_{S}(const {R}* x, const {R}* y, int dim, int deg, int root) {{
    {R} s = 0.0;
    for (int d = 0; d < dim; d++) {{
        {R} a = {FABS}(x[d] - (y ? y[d] : 0.0));
        s += (deg == 2) ? a * a : {POW}(a, ({R})deg);
    }}
    if (!root) return s;
    if (deg == 2) return {SQRT}(s);
    return {POW}(s, ({R})1.0 / ({R})deg);
}}

static {R} twed_one_nd_{S}(const {R}* A, const {R}* TA, int64_t la,
                          const {R}* B, const {R}* TB, int64_t lb,
                          int dim, {R} nu, {R} lamb, int deg, int root,
                          {R}* rowbuf, {R}* dbc) {{
    if (la == 0 && lb == 0) return 0.0;
    {R}* prev = rowbuf;
    {R}* curr = rowbuf + (lb + 1);

    for (int64_t j = 1; j <= lb; j++) {{
        {R} dbj = (j > 1) ? lpd_{S}(B + (j-1)*dim, B + (j-2)*dim, dim, deg, root)
                             : lpd_{S}(B, 0, dim, deg, root);
        {R} dtb = (j > 1) ? (TB[j-1] - TB[j-2]) : TB[0];
        dbc[j] = dbj + lamb + nu * dtb;
    }}

    prev[0] = 0.0;
    for (int64_t j = 1; j <= lb; j++) prev[j] = {SENT};

    for (int64_t i = 1; i <= la; i++) {{
        curr[0] = {SENT};
        const {R}* ai1 = A + (i-1)*dim;
        const {R} tai1 = TA[i-1];
        const {R} dai = (i > 1) ? lpd_{S}(ai1, A + (i-2)*dim, dim, deg, root)
                                   : lpd_{S}(ai1, 0, dim, deg, root);
        const {R} dta = (i > 1) ? (tai1 - TA[i-2]) : TA[0];
        const {R} dac = dai + lamb + nu * dta;
        const {R}* ai2 = (i > 1) ? A + (i-2)*dim : 0;

        for (int64_t j = 1; j <= lb; j++) {{
            {R} d = lpd_{S}(ai1, B + (j-1)*dim, dim, deg, root);
            {R} ht = {FABS}(tai1 - TB[j-1]);
            if (i > 1 && j > 1) {{
                d += lpd_{S}(ai2, B + (j-2)*dim, dim, deg, root);
                ht += {FABS}(TA[i-2] - TB[j-2]);
            }}
            {R} keep = prev[j-1] + d + nu * ht;
            {R} delA = dac + prev[j];
            {R} delB = dbc[j] + curr[j-1];
            {R} m = keep < delA ? keep : delA;
            curr[j] = m < delB ? m : delB;
        }}
        {R}* t = prev; prev = curr; curr = t;
    }}
    {R} r = prev[lb];
    return r >= {SENT} ? INFINITY : r;
}}

void twed_pairs_pool_nd{PUB}(const {R}* XA, const {R}* TXA, const int64_t* la,
                        int64_t Ma,
                        const {R}* XB, const {R}* TXB, const int64_t* lb,
                        int64_t Mb, int dim,
                        const int64_t* ia, const int64_t* ib, int64_t P,
                        {R} nu, {R} lamb, int deg, int root,
                        {R}* rowbuf, {R}* dbc, {R}* out) {{
    for (int64_t p = 0; p < P; p++) {{
        const int64_t a = ia[p], b = ib[p];
        out[p] = twed_one_nd_{S}(XA + a * Ma * dim, TXA + a * Ma, la[a],
                             XB + b * Mb * dim, TXB + b * Mb, lb[b],
                             dim, nu, lamb, deg, root, rowbuf, dbc);
    }}
}}
"""

_SRC = (
    "#include <math.h>\n#include <stdint.h>\n"
    + _BODY.format(R="double", S="d", PUB="", FABS="fabs", POW="pow",
                   SQRT="sqrt", SENT="1e300")
    + _BODY.format(R="float", S="f", PUB="_f", FABS="fabsf", POW="powf",
                   SQRT="sqrtf", SENT="1e30f")
)


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
    i64 = ctypes.POINTER(ctypes.c_int64)
    for suffix, scalar in (("", ctypes.c_double), ("_f", ctypes.c_float)):
        d = ctypes.POINTER(scalar)
        fn = getattr(lib, f"twed_pairs_pool{suffix}")
        fn.restype = None
        fn.argtypes = [
            d, d, i64, ctypes.c_int64,
            d, d, i64, ctypes.c_int64,
            i64, i64, ctypes.c_int64,
            scalar, scalar, ctypes.c_int, ctypes.c_int,
            d, d, d,
        ]
        fn_nd = getattr(lib, f"twed_pairs_pool_nd{suffix}")
        fn_nd.restype = None
        fn_nd.argtypes = [
            d, d, i64, ctypes.c_int64,
            d, d, i64, ctypes.c_int64, ctypes.c_int,
            i64, i64, ctypes.c_int64,
            scalar, scalar, ctypes.c_int, ctypes.c_int,
            d, d, d,
        ]
    return lib


_LIB: ctypes.CDLL | None | bool = False   # False = not yet probed


def get_lib() -> ctypes.CDLL | None:
    global _LIB
    if _LIB is False:
        _LIB = _build()
    return _LIB


def _pi(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def twed_pairs_c(
    A: np.ndarray, TA: np.ndarray, la: np.ndarray,
    B: np.ndarray, TB: np.ndarray, lb: np.ndarray,
    ia: np.ndarray, ib: np.ndarray,
    nu: float, lamb: float, degree: int,
) -> np.ndarray | None:
    """C fast path (any dim); returns None when unavailable.

    float32 pools run through the genuine float twins (twed_pairs_pool_f /
    _nd_f — the reference's twedf surface); everything else through the
    double variants.
    """
    lib = get_lib()
    if lib is None:
        return None
    use_f32 = np.asarray(A).dtype == np.float32
    real = np.float32 if use_f32 else np.float64
    scalar = ctypes.c_float if use_f32 else ctypes.c_double
    suffix = "_f" if use_f32 else ""

    def _p(x: np.ndarray):
        return x.ctypes.data_as(ctypes.POINTER(scalar))

    dim = 1
    if A.ndim == 3:
        dim = A.shape[2]
        if dim == 1:
            A = A[:, :, 0]
    if B.ndim == 3 and B.shape[2] == 1:
        B = B[:, :, 0]
    A = np.ascontiguousarray(A, dtype=real)
    B = np.ascontiguousarray(B, dtype=real)
    TA = np.ascontiguousarray(TA, dtype=real)
    TB = np.ascontiguousarray(TB, dtype=real)
    la = np.ascontiguousarray(la, dtype=np.int64)
    lb = np.ascontiguousarray(lb, dtype=np.int64)
    ia = np.ascontiguousarray(ia, dtype=np.int64)
    ib = np.ascontiguousarray(ib, dtype=np.int64)
    P = ia.shape[0]
    out = np.empty(P, dtype=real)
    if P == 0:
        return out
    Mb = B.shape[1]
    rowbuf = np.empty(2 * (Mb + 1), dtype=real)
    dbc = np.empty(Mb + 1, dtype=real)
    deg = abs(int(degree))
    root = 1 if degree > 0 else 0
    if dim == 1:
        getattr(lib, f"twed_pairs_pool{suffix}")(
            _p(A), _p(TA), _pi(la), np.int64(A.shape[1]),
            _p(B), _p(TB), _pi(lb), np.int64(Mb),
            _pi(ia), _pi(ib), np.int64(P),
            scalar(nu), scalar(lamb), int(deg), int(root),
            _p(rowbuf), _p(dbc), _p(out),
        )
    else:
        getattr(lib, f"twed_pairs_pool_nd{suffix}")(
            _p(A), _p(TA), _pi(la), np.int64(A.shape[1]),
            _p(B), _p(TB), _pi(lb), np.int64(Mb), int(dim),
            _pi(ia), _pi(ib), np.int64(P),
            scalar(nu), scalar(lamb), int(deg), int(root),
            _p(rowbuf), _p(dbc), _p(out),
        )
    return out
