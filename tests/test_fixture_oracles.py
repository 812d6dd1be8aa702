"""Drift guards for the pinned-fixture oracles (scripts/gen_fixtures.py).

langid / fingerprint are deterministic but not SQL-expressible; their
driver oracle is a frozen parquet snapshot of the sf0.01 result.  These
tests recompute both queries against the live testdata and compare to the
fixture — so any change to tokenization, hashing, or the ops themselves
fails here (with a regenerate hint) before it fails the driver's hash gate.
"""

import os

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.01"
FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "fixtures")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="sf0.01 testdata not present")

_HINT = "fixture drift — regenerate with: python scripts/gen_fixtures.py"


def _fixture(name):
    import pyarrow.parquet as pq

    return pq.read_table(
        os.path.join(FIXTURE_DIR, f"{name}_sf0.01.parquet")).to_pandas()


def test_langid_fixture_matches_recompute(ray_session):
    from cutwed_ray.pipelines.queries import q_langid

    got = q_langid(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = _fixture("langid")
    assert list(got.columns) == list(want.columns), _HINT
    assert (got.doc_id.values == want.doc_id.values).all(), _HINT
    assert (got.lang_pred.values == want.lang_pred.values).all(), _HINT
    # bit-exact: the fixture was written from this same computation
    assert (got.lang_score.values == want.lang_score.values).all(), _HINT


def test_fingerprint_fixture_matches_recompute(ray_session):
    from cutwed_ray.pipelines.queries import q_fingerprint

    got = q_fingerprint(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = _fixture("fingerprint")
    assert (got.doc_id.values == want.doc_id.values).all(), _HINT
    assert (got.fingerprint.values == want.fingerprint.values).all(), _HINT


def test_fixture_oracle_sql_runs_in_duckdb():
    """The ORACLE strings must be valid DuckDB SQL returning the same
    schema the Ray queries produce (the driver's comparison premise)."""
    import duckdb

    from cutwed_ray.pipelines.queries import (
        SQL_FINGERPRINT_FIXTURE,
        SQL_LANGID_FIXTURE,
    )

    li = duckdb.sql(SQL_LANGID_FIXTURE).df()
    assert list(li.columns) == ["doc_id", "lang", "lang_pred", "lang_score"]
    assert len(li) == 500
    fp = duckdb.sql(SQL_FINGERPRINT_FIXTURE).df()
    assert list(fp.columns) == ["doc_id", "fingerprint"]
    assert len(fp) == 500
    assert fp.fingerprint.dtype == np.int64
