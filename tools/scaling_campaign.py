#!/usr/bin/env python
"""Load-gated scaling / headline-bench campaign (BASELINE.md protocol).

This host's throughput oscillates through ~10-minute phases (other
tenants on the shared box), so single measurements lie in either
direction.  The campaign loop encodes the measurement etiquette that
round 2/3 established by hand (CLAUDE.md "scaling-campaign etiquette"):

* ADMISSION GATE: a run starts only when 1-min load < 0.7 AND 5-min
  load < 1.2 (the 1-min gate alone admits runs while the previous
  leg's Ray session is still draining).
* HEADLINE GATE (``--headline``): absolute walls are additionally
  admitted only when the memcpy probe reads >= 11 GB/s (a healthy host
  phase; ``fault_gbps`` idles low on a cold box even in healthy phases,
  so it is recorded but never gated on).
* MUTUAL EXCLUSION: ``/tmp/scaling_RUNNING`` is touched for the
  duration of each run — anything compute-heavy (pytest, probes) must
  check it before starting, and this loop never runs two at once.
* ONE PAIR PER ADMISSION (scaling mode): each admitted run measures a
  single back-to-back lo/hi pair (GRAFT_SCALE_PAIRS=1) so every pair
  re-passes the gate — pairs land in distinct host phases and the
  campaign median is over independent phase samples.

Results append as JSON lines (one per admitted run, with the admission
probe) to the log; summarize with ``--summary``.

Usage:
  python tools/scaling_campaign.py [--runs N] [--hours H] [--headline]
                                   [--log PATH] [--summary [PATH]]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAG = "/tmp/scaling_RUNNING"
DEFAULT_LOG = "/tmp/scaling_campaign.jsonl"


def _load_ok() -> bool:
    l1, l5, _ = os.getloadavg()
    return l1 < 0.7 and l5 < 1.2


def _probe() -> dict:
    sys.path.insert(0, REPO)
    import bench

    return bench._host_probe()


def _summary(path: str) -> None:
    recs = [json.loads(ln) for ln in open(path) if ln.strip()]
    sca = [r for r in recs if r.get("metric") == "scaling_efficiency"]
    head = [r for r in recs if r.get("metric") == "er_synthetic_wall_sec"]
    if sca:
        effs = sorted(p["eff"] for r in sca for p in r["pairs_detail"])
        med = effs[len(effs) // 2] if len(effs) % 2 else \
            (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2
        lo, hi = sca[0]["cpus_lo"], sca[0]["cpus_hi"]
        print(f"scaling {lo}->{hi}: {len(effs)} pairs, "
              f"median {med:.3f}, best {max(effs):.3f}, "
              f">=0.8: {sum(e >= 0.8 for e in effs)}/{len(effs)}")
        print("  pairs:", " ".join(f"{e:.3f}" for e in effs))
    if head:
        walls = sorted(r["value"] for r in head)
        print(f"headline: {len(walls)} runs, best {walls[0]:.2f} s, "
              f"median {walls[len(walls) // 2]:.2f} s")


def main() -> None:
    args = sys.argv[1:]
    if "--summary" in args:
        i = args.index("--summary")
        path = args[i + 1] if len(args) > i + 1 and not args[i + 1].startswith("--") \
            else DEFAULT_LOG
        _summary(path)
        return

    def opt(name: str, default: str) -> str:
        return args[args.index(name) + 1] if name in args else default

    runs = int(opt("--runs", "8"))
    deadline = time.time() + float(opt("--hours", "4")) * 3600
    headline = "--headline" in args
    log = opt("--log", DEFAULT_LOG)

    done = 0
    while done < runs and time.time() < deadline:
        if os.path.exists(FLAG) or not _load_ok():
            time.sleep(30)
            continue
        pr = _probe()
        if headline and pr["mem_gbps"] < 11:
            time.sleep(60)
            continue
        with open(FLAG, "w") as f:
            f.write(str(os.getpid()))
        try:
            cmd = [sys.executable, os.path.join(REPO, "bench.py")]
            env = dict(os.environ)
            if not headline:
                cmd.append("--scaling")
                env["GRAFT_SCALE_PAIRS"] = "1"
            out = subprocess.run(cmd, env=env, capture_output=True,
                                 text=True, cwd=REPO)
            if out.returncode == 0:
                rec = json.loads(out.stdout.strip().splitlines()[-1])
                rec["admit_probe"] = pr
                rec["t_unix"] = round(time.time(), 1)
                with open(log, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                done += 1
                print(f"[{done}/{runs}] {rec['metric']}={rec['value']}",
                      flush=True)
            else:
                print(f"run failed rc={out.returncode}: "
                      f"{out.stderr.strip().splitlines()[-1:]}", flush=True)
        finally:
            os.remove(FLAG)
        time.sleep(60)        # drain before re-gating


if __name__ == "__main__":
    main()
