"""glibc malloc tuning for lazily-backed hosts.

Per-batch transient allocations (numpy scratch, arrow buffers) larger than
glibc's mmap threshold (<= 32 MiB with the dynamic default) are served by
fresh ``mmap`` regions and handed back to the kernel on ``free``.  On this
class of host, guest memory is lazily backed and a first-touch minor fault
costs ~0.5 ms/page when faulted concurrently (vs ~1 us sequentially), so
every batch re-pays a multi-millisecond-per-MiB SYSTEM-time storm that
*serializes across workers* — measured 16 processes alloc/free-touching
64 MiB each: 178 ms/iteration default vs 2.9 ms tuned (63x).

The fix: raise ``M_MMAP_THRESHOLD`` to 1 GiB so ordinary transients are
served from the brk heap, whose pages stay faulted across batches, and set
``M_TRIM_THRESHOLD`` to 512 MiB so top-of-heap retention is bounded.
Rare giant allocations (kernel sweeps near ``MAX_SWEEP_BYTES``) still go
through mmap and are returned to the OS on free (verified: 2 GiB alloc ->
33 MiB RSS after free).

Arrow gets the same treatment: its default jemalloc pool unmaps every
"oversize" (>8 MiB) buffer immediately on free regardless of decay
settings, so per-batch Arrow OUTPUT buffers re-fault every batch (probe:
64 MiB alloc/touch/free loop = 16384 faults and ~50 ms sys per iteration
forever under jemalloc; 0 faults and 0.5 ms steady-state under the system
pool once the brk heap converges).  We therefore point Arrow's default
pool at the system allocator, which inherits the mallopt tunables.

Applied once at ``cutwed_ray`` import so every Ray worker that unpickles
one of our stage functions gets it, regardless of who owns the Ray session
(bench.py, pytest, or the external driver).  Opt out with
``CUTWED_RAY_NO_MALLOC_TUNE=1``.  No-op on non-glibc platforms.
"""
from __future__ import annotations

import os

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_applied = False


def tune_malloc() -> bool:
    """Apply the tunables once per process; returns True if applied."""
    global _applied
    if _applied or os.environ.get("CUTWED_RAY_NO_MALLOC_TUNE"):
        return _applied
    try:
        import ctypes

        libc = ctypes.CDLL(None)
        ok1 = libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)
        ok2 = libc.mallopt(_M_TRIM_THRESHOLD, 512 << 20)
        _applied = bool(ok1 and ok2)
    except Exception:  # pragma: no cover - non-glibc / restricted platforms
        _applied = False
    if _applied:
        try:
            import pyarrow as pa

            pa.set_memory_pool(pa.system_memory_pool())
        except Exception:  # pragma: no cover
            pass
    return _applied
