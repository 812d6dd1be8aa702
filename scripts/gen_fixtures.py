#!/usr/bin/env python
"""Generate pinned-fixture oracle parquet for the deterministic rows-only
queries (VERDICT r2 item 7, extended in round 3 to every rows-only query
whose result is a deterministic function of the input).

These operators are deterministic but not practically expressible in ANSI
SQL (custom 64-bit token hashing, TWED scoring, LSH banding, seeded
k-means).  The oracle is therefore a PINNED FIXTURE: this script computes
each query once over /root/testdata/sf0.01 and freezes the result as a
single parquet file under fixtures/; ORACLE then reads it back with
DuckDB's read_parquet.  That converts the driver's rows-only check into a
full row+schema+hash comparison — it verifies determinism and freedom from
regression, not independent re-derivation (tests/test_fixture_oracles.py
re-computes and compares on every test run, so silent drift fails CI
before it fails the driver).

Determinism across parallelism is a registration requirement: run
`python scripts/gen_fixtures.py --check NCPU` to recompute every fixture
query in a fresh Ray session at NCPU cpus and diff bit-exactly against the
frozen files before trusting a new registration.

Usage: python scripts/gen_fixtures.py [--check NCPU]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("GRAFT_FIXTURE_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "fixtures")


def compute(name: str) -> pa.Table:
    """Run one fixture query and return its canonically-sorted result."""
    from cutwed_ray.pipelines.queries import FIXTURE_ORACLES, QUERIES

    sort_keys = FIXTURE_ORACLES[name]
    df = QUERIES[name](SF_DIR).to_pandas()
    df = df.sort_values(sort_keys, kind="stable").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def main() -> None:
    import ray

    ncpu = 4
    check = "--check" in sys.argv
    if check:
        ncpu = int(sys.argv[sys.argv.index("--check") + 1])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")
    from cutwed_ray.pipelines.queries import FIXTURE_ORACLES

    os.makedirs(OUT_DIR, exist_ok=True)
    failures = []
    for name in FIXTURE_ORACLES:
        t = compute(name)
        out = os.path.join(OUT_DIR, f"{name}_sf0.01.parquet")
        if check:
            want = pq.read_table(out)
            same = t.schema == want.schema and t.equals(want)
            print(f"{name}: {'OK bit-identical' if same else 'MISMATCH'} "
                  f"({t.num_rows} rows, ncpu={ncpu})")
            if not same:
                failures.append(name)
        else:
            pq.write_table(t, out)
            print(f"{name}: {t.num_rows} rows -> {out}")
    ray.shutdown()
    if failures:
        sys.exit(f"non-deterministic fixture queries: {failures}")


if __name__ == "__main__":
    main()
