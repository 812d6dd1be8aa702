"""Strict driver-style oracle check: per-query rows / schema / value-hash.

Mimics the graft driver's CORRECTNESS gate more strictly than the pytest
parity test: exact Arrow types (integer widths, timestamp units) and a
value hash over columns sorted by name — not an atol comparison.

Usage: python tools/strict_oracle_check.py [sf_dir] [query ...]
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_arrow(res) -> pa.Table:
    if isinstance(res, pa.Table):
        return res
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    return pa.concat_tables(
        [b for b in res.iter_batches(batch_format="pyarrow", batch_size=1 << 16)]
    ) if hasattr(res, "iter_batches") else pa.table(res)


def canon(t: pa.Table) -> pd.DataFrame:
    df = t.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        a = df[c].to_numpy()
        if a.dtype == object:
            h.update("\x00".join(map(str, a.tolist())).encode())
        else:
            h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("GRAFT_CHECK_CPUS", "8")),
                 include_dashboard=False)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    import __ray_entry__ as e
    queries, oracle = e.queries(), e.oracle_sql()

    n_fail = 0
    for name, sql in oracle.items():
        if only and name not in only:
            continue
        got_t = to_arrow(queries[name](sf_dir))
        want_t = con.sql(sql).arrow()
        got_schema = {f.name: str(f.type) for f in got_t.schema}
        want_schema = {f.name: str(f.type) for f in want_t.schema}
        rows_ok = got_t.num_rows == want_t.num_rows
        schema_ok = got_schema == want_schema
        g, w = canon(got_t), canon(want_t)
        hash_ok = rows_ok and schema_ok and value_hash(g) == value_hash(w)
        status = "OK  " if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            n_fail += 1
        print(f"{status} {name}: rows={rows_ok} ({got_t.num_rows}/{want_t.num_rows}) "
              f"schema={schema_ok} hash={hash_ok}")
        if not schema_ok:
            for k in sorted(set(got_schema) | set(want_schema)):
                a, b = got_schema.get(k), want_schema.get(k)
                if a != b:
                    print(f"      {k}: engine={a} oracle={b}")
    print(f"{'ALL GREEN' if n_fail == 0 else f'{n_fail} FAILURES'}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
