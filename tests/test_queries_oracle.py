"""Driver-contract conformance: every SQL-expressible query matches DuckDB.

Simulates the driver's check at sf0.001 (fast): run the Ray pipeline and
the oracle SQL over the same parquet tables, compare row count, column
names, and order-insensitive values.  Rows-only queries are smoke-checked
for execution + stable schema.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()          # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


def _compare(name, q, sql, con):
    got = _canon(_to_pandas(q(SF_DIR)))
    want = _canon(con.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}")
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if np.issubdtype(np.asarray(a).dtype, np.floating) or np.issubdtype(np.asarray(b).dtype, np.floating):
            assert np.allclose(a.astype(float), b.astype(float), rtol=0, atol=1e-9), f"{name}.{c}"
        else:
            assert (a == b).all(), f"{name}.{c}"


SQL_CHECKED = ["exact_dedup", "exact_cluster", "block_counts", "token_counts",
               "token_counts_bpe",
               "text_quality", "lang_doc_stats", "top_docs_by_chars",
               "lineitem_pricing", "orders_by_segment", "order_priority_revenue",
               "docs_quality_filter", "orders_topk_per_cust",
               "event_type_users", "supplier_region_revenue",
               "events_hourly", "events_hopping", "events_type_stats",
               "events_sessions", "events_asof_order", "events_prev_hour",
               "events_lag_delta", "events_user_cumsum",
               "events_value_quantiles", "lang_mode_chars", "top_tokens",
               "customers_no_orders", "repetition_signals",
               "docs_redacted", "docs_contamination", "docs_tfidf_top3",
               "docs_stratified_sample", "docs_top_decile_chars",
               "parts_never_ordered",
               "knn_bruteforce", "ngram_jaccard", "embedding_near_dup_exact",
               "lineitem_corr", "region_nation_rollup", "events_funnel",
               "events_props_stats", "docs_pack_stats", "events_type_pivot",
               "events_value_outliers", "events_latest_per_user",
               "cust_spend_rank", "cust_profile", "order_ship_90d",
               "events_debounced", "events_value_share",
               "docs_chunk_stats", "events_contract"]


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_oracle_parity(contract, oracle_con, name):
    queries, oracle = contract
    assert name in queries and name in oracle
    _compare(name, queries[name], oracle[name], oracle_con)


ROWS_ONLY = ["minhash_near_dup", "minhash_dup_clusters",
             "simhash_near_dup", "embedding_near_dup",
             "langid", "fingerprint", "knn_lsh", "knn_ivf",
             "approx_user_counts", "docs_split_counts",
             "twed_pairs_documents", "twed_topk_neighbors",
             "er_clusters_documents", "link_documents", "media_features",
             "media_audio_energy",
             "embedding_pca2", "approx_token_freq"]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(contract, name):
    queries, _ = contract
    df = _to_pandas(queries[name](SF_DIR))
    assert df is not None
    assert len(df.columns) > 0


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    df = _to_pandas(res)
    assert len(df) >= 0 and "cluster_id" in df.columns


def test_langid_on_real_language_samples(ray_session):
    """The testdata documents use one synthetic vocabulary for every lang
    label, so accuracy vs that column is meaningless; validate the heuristic
    on stopword-bearing samples instead."""
    import pyarrow as pa

    from cutwed_ray.ops.text import LangIdStage

    samples = {
        "en": "the cat and the dog sat in a house that was of no size to it",
        "de": "der hund und die katze ist ein tier mit dem haus von hier zu da",
        "fr": "le chien et la maison est une chose dans les champs que pour toi",
        "es": "el perro y la casa es que una cosa por los campos con para ti",
    }
    t = pa.table({"doc_id": list(range(4)),
                  "text": list(samples.values()),
                  "lang": list(samples.keys())})
    out = LangIdStage()(t)
    pred = out.column("lang_pred").to_pylist()
    assert pred == list(samples.keys()), pred
