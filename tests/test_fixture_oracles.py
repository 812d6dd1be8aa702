"""Drift guards for the pinned-fixture oracles (scripts/gen_fixtures.py).

Every query in FIXTURE_ORACLES is deterministic but not SQL-expressible;
its driver oracle is a frozen parquet snapshot of the sf0.01 result.
These tests recompute each query against the live testdata and compare to
the fixture bit-exactly — so any change to tokenization, hashing, scoring,
or the ops themselves fails here (with a regenerate hint) before it fails
the driver's hash gate.
"""

import os

import pytest

SF_DIR = "/root/testdata/sf0.01"
FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "fixtures")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="sf0.01 testdata not present")

_HINT = "fixture drift — regenerate with: python scripts/gen_fixtures.py"


def _names():
    from cutwed_ray.pipelines.queries import FIXTURE_ORACLES

    return sorted(FIXTURE_ORACLES)


@pytest.mark.parametrize("name", _names())
def test_fixture_matches_recompute(ray_session, name):
    import pyarrow.parquet as pq

    import scripts.gen_fixtures as gf

    got = gf.compute(name)
    want = pq.read_table(os.path.join(FIXTURE_DIR, f"{name}_sf0.01.parquet"))
    assert got.schema == want.schema, f"{name}: schema drift — {_HINT}"
    assert got.equals(want), f"{name}: value drift — {_HINT}"


def test_fixture_oracle_sql_runs_in_duckdb():
    """The ORACLE strings must be valid DuckDB SQL returning the same
    column names the Ray queries froze (the driver's comparison premise)."""
    import duckdb
    import pyarrow.parquet as pq

    from cutwed_ray.pipelines.queries import FIXTURE_ORACLES, fixture_sql

    for name in FIXTURE_ORACLES:
        df = duckdb.sql(fixture_sql(name)).df()
        want = pq.read_table(
            os.path.join(FIXTURE_DIR, f"{name}_sf0.01.parquet"))
        assert list(df.columns) == want.column_names, name
        assert len(df) == want.num_rows, name
