"""Opt-in per-task rusage tracing for scaling-inflation attribution.

Set ``CUTWED_RAY_TASK_STATS=<dir>`` before ``ray.init`` to make
instrumented stages (broadcast scoring, tokenize) append one JSON line
per map call to ``<dir>/<stage>_<pid>.jsonl`` with wall / user / system
cpu seconds and minor-fault deltas.  Zero overhead when unset (one env
lookup at import).  Diagnostic only — never enabled by the pipelines
themselves.
"""

from __future__ import annotations

import json
import os
import resource
import time

_DIR = os.environ.get("CUTWED_RAY_TASK_STATS")


def task_stats_enabled() -> bool:
    return _DIR is not None


def record(stage: str, fn, *args, **kwargs):
    """Run ``fn(*args, **kwargs)``; if tracing is on, log rusage deltas."""
    if _DIR is None:
        return fn(*args, **kwargs)
    r0 = resource.getrusage(resource.RUSAGE_SELF)
    t0 = time.time()
    out = fn(*args, **kwargs)
    t1 = time.time()
    r1 = resource.getrusage(resource.RUSAGE_SELF)
    line = json.dumps({
        "stage": stage, "pid": os.getpid(),
        "wall": round(t1 - t0, 4),
        "usr": round(r1.ru_utime - r0.ru_utime, 4),
        "sys": round(r1.ru_stime - r0.ru_stime, 4),
        "minflt": r1.ru_minflt - r0.ru_minflt,
        "ts": round(t0, 3),
    })
    try:
        with open(os.path.join(_DIR, f"{stage}_{os.getpid()}.jsonl"), "a") as f:
            f.write(line + "\n")
    except OSError:
        pass
    return out
