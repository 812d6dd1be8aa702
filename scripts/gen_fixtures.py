#!/usr/bin/env python
"""Generate pinned-fixture oracle parquet for the deterministic rows-only
text ops (VERDICT r2 item 7): langid and fingerprint.

These two operators are deterministic functions of the input text but not
practically expressible in ANSI SQL (custom 64-bit token hashing).  The
oracle is therefore a PINNED FIXTURE: this script computes each query once
over /root/testdata/sf0.01 and freezes the result as a single parquet file
under fixtures/; ORACLE then reads it back with DuckDB's read_parquet.
That converts the driver's rows-only check into a full row+schema+hash
comparison — it verifies determinism and freedom from regression, not
independent re-derivation (tests/test_fixture_oracles.py re-computes and
compares on every test run, so silent drift fails CI before it fails the
driver).

Usage: python scripts/gen_fixtures.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("GRAFT_FIXTURE_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "fixtures")


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
    from cutwed_ray.pipelines.queries import q_fingerprint, q_langid

    os.makedirs(OUT_DIR, exist_ok=True)
    for name, fn in (("langid", q_langid), ("fingerprint", q_fingerprint)):
        t = pa.Table.from_pandas(fn(SF_DIR).to_pandas().sort_values("doc_id")
                                 .reset_index(drop=True), preserve_index=False)
        out = os.path.join(OUT_DIR, f"{name}_sf0.01.parquet")
        pq.write_table(t, out)
        print(f"{name}: {t.num_rows} rows -> {out}")
    ray.shutdown()


if __name__ == "__main__":
    main()
