"""Driver-contract query catalog: Ray Data pipelines + DuckDB oracle SQL.

Each entry in ``QUERIES`` is a callable ``(sf_dir) -> Dataset | pa.Table``;
``ORACLE`` holds the equivalent ANSI SQL for DuckDB over the same parquet
tables (views: region nation customer supplier part orders lineitem events
documents embeddings).  Column names and integer widths match the SQL
exactly (the driver hash-compares values after sorting columns by name).

Floating-point aggregates are rounded to a fixed number of decimals on
BOTH sides — summation order differs between engines, so raw double sums
can differ in the last bits.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _strip_meta(t: pa.Table) -> pa.Table:
    """Zero-copy removal of file-level pandas schema metadata: the testdata
    parquet carries a pandas dict in its schema, which makes blocks
    unhashable in Ray's reduce-side schema dedup (warning spam)."""
    return t.replace_schema_metadata(None)


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns) \
        .map_batches(_strip_meta, batch_format="pyarrow")


def _key_bucket(keys: np.ndarray) -> np.ndarray:
    """Coarse int32 hash bucket of an int key column for per-key map_groups
    shuffles; bucket count tracks cluster CPUs (stages.cluster.coarse_buckets)
    so per-group size scales with the cluster, not the corpus."""
    from cutwed_ray.stages.cluster import coarse_buckets

    nb = np.uint64(coarse_buckets())
    return ((keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % nb
            ).astype(np.int32)


def _pt(df: "pd.DataFrame") -> pa.Table:
    """pandas -> Arrow with the pandas schema metadata stripped: the dict
    metadata makes block schemas unhashable in Ray's reduce-side dedup
    ("Failed to hash the schemas" warning spam in shuffle stages)."""
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


# --------------------------------------------------------------------- dedup
def q_exact_dedup(sf_dir: str):
    from cutwed_ray.ops.dedup import exact_dedup

    return exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"]))


SQL_EXACT_DEDUP = """
SELECT text, min(doc_id) AS doc_id, count(*) AS n_dups
FROM documents GROUP BY text
"""


def q_exact_cluster(sf_dir: str):
    from cutwed_ray.ops.dedup import exact_cluster

    return exact_cluster(_read(sf_dir, "documents", ["doc_id", "text"]))


SQL_EXACT_CLUSTER = """
SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS cluster_id
FROM documents
"""


# ------------------------------------------------------------------ blocking
def q_block_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def add_bucket(t: pa.Table) -> pa.Table:
        n = np.maximum(t.column("n_chars").to_numpy(), 1).astype(np.float64)
        lb = np.floor(np.log(n) / np.log(1.35)).astype(np.int64)
        return pa.table({"lang": t.column("lang"),
                         "len_bucket": pa.array(lb, pa.int64())})

    from ray.data.aggregate import Count

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby(["lang", "len_bucket"])
              .aggregate(Count(alias_name="n_docs")))


SQL_BLOCK_COUNTS = """
SELECT lang, CAST(FLOOR(LN(GREATEST(n_chars, 1)) / LN(1.35)) AS BIGINT) AS len_bucket,
       count(*) AS n_docs
FROM documents GROUP BY 1, 2
"""


# ---------------------------------------------------------------------- text
def q_token_counts(sf_dir: str):
    from cutwed_ray.ops.text import token_count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: token_count(t).select(["doc_id", "n_tokens"]),
        batch_format="pyarrow",
    )


SQL_TOKEN_COUNTS = r"""
SELECT doc_id,
       CASE WHEN regexp_replace(text, '^\s+|\s+$', '', 'g') = '' THEN 0
            ELSE length(regexp_split_to_array(
                   regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'))
       END AS n_tokens
FROM documents
"""


#: BPE-ish pretokenizer regex (GPT-2-style contractions / letter runs /
#: digit runs / punctuation runs, ASCII classes, no lookahead so RE2 —
#: used by BOTH Arrow's count_substring_regex and DuckDB — accepts it)
BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s"


def q_token_counts_bpe(sf_dir: str):
    """BPE-ish regex token counts: one vectorized RE2 kernel per batch
    (pyarrow count_substring_regex) — the 'compiled regex inside
    map_batches' pattern; both sides run RE2 so the counts hash-match."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def count(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(t.column("text"), BPE_PAT),
                    pa.int64())
        return pa.table({"doc_id": t.column("doc_id"), "n_bpe_tokens": n})

    return ds.map_batches(count, batch_format="pyarrow")


SQL_TOKEN_COUNTS_BPE = (
    "SELECT doc_id, CAST(len(regexp_extract_all(text, '"
    + BPE_PAT.replace("'", "''")
    + "')) AS BIGINT) AS n_bpe_tokens FROM documents"
)


def q_text_quality(sf_dir: str):
    from cutwed_ray.ops.text import text_quality

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def fmt(t: pa.Table) -> pa.Table:
        t = text_quality(t)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": t.column("n_tokens"),
            "punct_ratio": pc.round(t.column("punct_ratio"), 8),
            "upper_ratio": pc.round(t.column("upper_ratio"), 8),
            "digit_ratio": pc.round(t.column("digit_ratio"), 8),
        })

    return ds.map_batches(fmt, batch_format="pyarrow")


SQL_TEXT_QUALITY = r"""
SELECT doc_id,
       CASE WHEN regexp_replace(text, '^\s+|\s+$', '', 'g') = '' THEN 0
            ELSE length(regexp_split_to_array(
                   regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'))
       END AS n_tokens,
       round(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE
             / GREATEST(n_chars, 1), 8) AS punct_ratio,
       round(length(regexp_replace(text, '[^A-Z]', '', 'g'))::DOUBLE
             / GREATEST(n_chars, 1), 8) AS upper_ratio,
       round(length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
             / GREATEST(n_chars, 1), 8) AS digit_ratio
FROM documents
"""


def q_repetition_signals(sf_dir: str):
    """Gopher-style repetition quality signals (duplicate-bigram and
    top-word counts) — the all-integer output keeps the DuckDB oracle
    exact (no FP rounding convention needed)."""
    from cutwed_ray.ops.text import repetition_signals

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: repetition_signals(t).select(
            ["doc_id", "n_words", "n_bigrams", "n_distinct_bigrams",
             "top_word_count"]),
        batch_format="pyarrow",
    )


SQL_REPETITION_SIGNALS = r"""
WITH w AS (
  SELECT doc_id,
         CASE WHEN regexp_replace(text, '^\s+|\s+$', '', 'g') = ''
              THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(
                     regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')
         END AS ws
  FROM documents
),
g AS (
  SELECT doc_id, len(ws) AS nw,
         list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
                        i -> ws[i] || ' ' || ws[i + 1]) AS grams
  FROM w
),
d AS (
  SELECT doc_id, CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct_bigrams
  FROM (SELECT doc_id, unnest(grams) AS gram FROM g) GROUP BY doc_id
),
tw AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_word_count
  FROM (SELECT doc_id, word, count(*) AS c
        FROM (SELECT doc_id, unnest(ws) AS word FROM w)
        GROUP BY doc_id, word)
  GROUP BY doc_id
)
SELECT g.doc_id,
       CAST(g.nw AS BIGINT) AS n_words,
       CAST(greatest(g.nw - 1, 0) AS BIGINT) AS n_bigrams,
       COALESCE(d.n_distinct_bigrams, 0) AS n_distinct_bigrams,
       COALESCE(tw.top_word_count, 0) AS top_word_count
FROM g LEFT JOIN d USING (doc_id) LEFT JOIN tw USING (doc_id)
"""


#: ordered redaction rules for q_docs_redacted (RE2 on both sides)
REDACT_RULES = [
    (r"\bcustomer\b", "<NAME>"),
    (r"\b(?:key|value)\b", "<ID>"),
]


def q_docs_redacted(sf_dir: str):
    """Sequential vectorized regex redaction (the PII-scrub primitive):
    the full redacted text ships in the output, so the driver value-hash
    compares every redacted string byte-for-byte against DuckDB's nested
    regexp_replace — both engines run RE2."""
    from cutwed_ray.ops.text import regex_redact

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: regex_redact(t, REDACT_RULES).select(
            ["doc_id", "text_clean", "n_redactions"]),
        batch_format="pyarrow",
    )


SQL_DOCS_REDACTED = r"""
SELECT doc_id,
       regexp_replace(regexp_replace(text, '\bcustomer\b', '<NAME>', 'g'),
                      '\b(?:key|value)\b', '<ID>', 'g') AS text_clean,
       CAST(len(regexp_extract_all(text, '\bcustomer\b'))
            + len(regexp_extract_all(
                    regexp_replace(text, '\bcustomer\b', '<NAME>', 'g'),
                    '\b(?:key|value)\b')) AS BIGINT) AS n_redactions
FROM documents
"""


def q_docs_tfidf_top3(sf_dir: str):
    """Top-3 distinctive words per doc by TF-IDF — the global-statistic
    broadcast pattern: vocabulary-sized DF table computed by partial
    aggregates + one tiny groupby, collected and ray.put once, then every
    batch scores vectorized.  Scores round to 6 decimals on BOTH sides
    (including the ranking key) so mathematically-equal products tie and
    break deterministically by word."""
    from cutwed_ray.ops.text import tfidf_topk

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tfidf_topk(ds, k=3)


SQL_DOCS_TFIDF_TOP3 = r"""
WITH w AS (
  SELECT doc_id,
         CASE WHEN regexp_replace(text, '^\s+|\s+$', '', 'g') = ''
              THEN []::VARCHAR[]
              ELSE regexp_split_to_array(
                     regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')
         END AS ws
  FROM documents
), toks AS (
  SELECT doc_id, unnest(ws) AS word FROM w
), tf AS (
  SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word
), df AS (
  SELECT word, count(DISTINCT doc_id) AS df FROM toks GROUP BY word
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.word,
         round(tf.tf * ln(n.n_docs::DOUBLE / df.df), 6) AS tfidf
  FROM tf JOIN df USING (word), n
), ranked AS (
  SELECT doc_id, word, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, word) AS rnk
  FROM scored
)
SELECT doc_id, word, tfidf, CAST(rnk AS BIGINT) AS rank
FROM ranked WHERE rnk <= 3
"""


def q_docs_contamination(sf_dir: str):
    """Benchmark decontamination: docs with doc_id % 20 == 0 stand in for
    the held-out benchmark set; every other doc is flagged if it shares a
    3-token shingle with any benchmark doc.  Broadcast membership — the
    benchmark's distinct gram hashes are reduced per batch, collected
    once, ray.put once; the corpus side streams (no shuffle, no join).
    In real use corpus and benchmark are different tables; synthesizing
    both from one table costs a second column-pruned scan of the small
    filtered side."""
    from cutwed_ray.ops.decontam import decontaminate

    def test_side(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t.column("doc_id").to_numpy() % 20 == 0))

    def train_side(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t.column("doc_id").to_numpy() % 20 != 0))

    cols = ["doc_id", "text"]
    bench = _read(sf_dir, "documents", cols).map_batches(
        test_side, batch_format="pyarrow")
    corpus = _read(sf_dir, "documents", cols).map_batches(
        train_side, batch_format="pyarrow")
    return decontaminate(corpus, bench, k=3)


SQL_DOCS_CONTAMINATION = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN regexp_replace(text, '^\s+|\s+$', '', 'g') = ''
              THEN []::VARCHAR[]
              ELSE regexp_split_to_array(
                     regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')
         END AS t
  FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN list_distinct([ t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                   FOR i IN range(1, len(t) - 1) ])
              ELSE [ array_to_string(list_sort(t), ' ') ] END AS s
  FROM toks
), bench AS (
  SELECT DISTINCT unnest(s) AS gram FROM sh WHERE doc_id % 20 = 0
), hits AS (
  SELECT c.doc_id, count(*) AS n_hits
  FROM (SELECT doc_id, unnest(s) AS gram FROM sh WHERE doc_id % 20 <> 0) c
  JOIN bench USING (gram) GROUP BY c.doc_id
)
SELECT s.doc_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_contaminated_grams,
       CAST(len(s.s) AS BIGINT) AS n_grams,
       CAST(CASE WHEN COALESCE(h.n_hits, 0) >= 1 THEN 1 ELSE 0 END
            AS BIGINT) AS contaminated
FROM sh s LEFT JOIN hits h USING (doc_id)
WHERE s.doc_id % 20 <> 0
"""


def q_lang_doc_stats(sf_dir: str):
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    # partial aggregation inside map_batches, then a tiny groupby
    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("lang", as_index=False).agg(
            n_docs=("n_chars", "size"), total_chars=("n_chars", "sum"))
        return _pt(df)

    from ray.data.aggregate import Sum

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("lang")
             .aggregate(Sum("n_docs", alias_name="n_docs"),
                        Sum("total_chars", alias_name="total_chars")))

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n_docs").to_numpy().astype(np.int64)
        tot = t.column("total_chars").to_numpy().astype(np.int64)
        return pa.table({
            "lang": t.column("lang"),
            "n_docs": pa.array(n, pa.int64()),
            "total_chars": pa.array(tot, pa.int64()),
            "avg_chars": pa.array(np.round(tot / n, 6), pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_LANG_DOC_STATS = """
SELECT lang, count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       round(SUM(n_chars)::DOUBLE / count(*), 6) AS avg_chars
FROM documents GROUP BY lang
"""


def q_top_docs_by_chars(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(10)


SQL_TOP_DOCS = """
SELECT doc_id, n_chars FROM documents
ORDER BY n_chars DESC, doc_id ASC LIMIT 10
"""


# ----------------------------------------------------------------- relational
def q_lineitem_pricing(sf_dir: str):
    """TPC-H Q1-shaped aggregate: pruned read, vectorized filter, partial
    per-batch pre-aggregation before the (tiny) global groupby."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate"])
    cutoff = np.datetime64("1998-09-01")

    def partial(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate").to_numpy()
        t = t.filter(pa.array(ship <= cutoff))
        df = t.to_pandas()
        # exact integer cents: floor(x*100 + 0.5) is bit-identical across
        # engines (same double product in, same floor out) and integer sums
        # are order-independent — no FP summation-order hazard
        df["disc_cents"] = np.floor(
            df.l_extendedprice * (1 - df.l_discount) * 100 + 0.5).astype(np.int64)
        df["base_cents"] = np.floor(df.l_extendedprice * 100 + 0.5).astype(np.int64)
        df["qty_i"] = np.floor(df.l_quantity + 0.5).astype(np.int64)
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty_i", "sum"),
            sum_base_cents=("base_cents", "sum"),
            sum_disc_cents=("disc_cents", "sum"),
            count_order=("qty_i", "size"),
        )
        return _pt(g)

    from ray.data.aggregate import Sum

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["l_returnflag", "l_linestatus"])
             .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                        Sum("sum_base_cents", alias_name="sum_base_cents"),
                        Sum("sum_disc_cents", alias_name="sum_disc_cents"),
                        Sum("count_order", alias_name="count_order")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "sum_qty": pa.array(t.column("sum_qty").to_numpy().astype(np.int64),
                                pa.int64()),
            "sum_base_cents": pa.array(
                t.column("sum_base_cents").to_numpy().astype(np.int64), pa.int64()),
            "sum_disc_cents": pa.array(
                t.column("sum_disc_cents").to_numpy().astype(np.int64), pa.int64()),
            "count_order": pa.array(
                t.column("count_order").to_numpy().astype(np.int64), pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_LINEITEM_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def _orders_by_segment_shuffle(sf_dir: str):
    """Over-budget path for q_orders_by_segment: customer no longer
    qualifies as a broadcast side, so take the big-big distributed hash
    join (q_order_priority_revenue shape)."""
    from ray.data.aggregate import Sum

    from cutwed_ray.stages.cluster import join_partitions

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    import pyarrow.parquet as pq
    n_o = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
    parts = max(2, min(join_partitions(), n_o // 50_000 + 1))
    joined = orders.join(cust, join_type="inner", num_partitions=parts,
                         on=("o_custkey",), right_on=("c_custkey",))

    def partial(t: pa.Table) -> pa.Table:
        cents = np.floor(t.column("o_totalprice").to_numpy() * 100
                         + 0.5).astype(np.int64)
        df = pa.table({"c_mktsegment": t.column("c_mktsegment"),
                       "price_cents": pa.array(cents, pa.int64())}).to_pandas()
        g = df.groupby("c_mktsegment", as_index=False).agg(
            n_orders=("price_cents", "size"),
            revenue_cents=("price_cents", "sum"))
        return _pt(g)

    return (joined.map_batches(partial, batch_format="pyarrow")
                  .groupby("c_mktsegment")
                  .aggregate(Sum("n_orders", alias_name="n_orders"),
                             Sum("revenue_cents", alias_name="revenue_cents")))


def q_orders_by_segment(sf_dir: str):
    """Broadcast hash join with NO driver-side table pull: one remote task
    builds the customer dimension into (sorted c_custkey, int32 segment
    codes, tiny category list) — the driver ships only the parquet path —
    and every orders batch resolves segments with a single vectorized
    ``searchsorted`` + ``bincount`` partial (ops/broadcast.py).  No pandas
    ``.map``, no Python dict anywhere.  Budget-guarded: past
    ``DEFAULT_MAX_ROWS`` the customer side stops qualifying as small and
    the query falls back to the distributed hash join."""
    from cutwed_ray.ops.broadcast import (DEFAULT_MAX_ROWS, build_lookup_async,
                                          grouped_sum_count, parquet_rows,
                                          probe_codes)

    cust_path = f"{sf_dir}/customer.parquet"
    if parquet_rows(cust_path) > DEFAULT_MAX_ROWS:
        agg = _orders_by_segment_shuffle(sf_dir)
    else:
        def build(path):
            import pyarrow.parquet as pq
            t = pq.read_table(path, columns=["c_custkey", "c_mktsegment"])
            return t.column("c_custkey").to_numpy(), t.column("c_mktsegment")

        ref = build_lookup_async(build, cust_path)
        ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

        def partial(t: pa.Table) -> pa.Table:
            codes, found, cats = probe_codes(
                ref, t.column("o_custkey").to_numpy())
            cents = np.floor(t.column("o_totalprice").to_numpy() * 100
                             + 0.5).astype(np.int64)
            cnt, sm = grouped_sum_count(codes, found, cents, len(cats))
            nz = np.flatnonzero(cnt)
            return pa.table({
                "c_mktsegment": cats.take(pa.array(nz)),
                "n_orders": pa.array(cnt[nz], pa.int64()),
                "revenue_cents": pa.array(sm[nz], pa.int64()),
            })

        from ray.data.aggregate import Sum

        agg = (ds.map_batches(partial, batch_format="pyarrow")
                 .groupby("c_mktsegment")
                 .aggregate(Sum("n_orders", alias_name="n_orders"),
                            Sum("revenue_cents", alias_name="revenue_cents")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_mktsegment": t.column("c_mktsegment"),
            "n_orders": pa.array(t.column("n_orders").to_numpy().astype(np.int64),
                                 pa.int64()),
            "revenue_cents": pa.array(
                t.column("revenue_cents").to_numpy().astype(np.int64), pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_ORDERS_BY_SEGMENT = """
SELECT c.c_mktsegment, count(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


def _sup_region_lookup_build(sup_p: str, nat_p: str, reg_p: str):
    """Remote-task body: compose supplier -> nation -> region into one
    (s_suppkey, r_name) lookup with two vectorized searchsorted probes
    (nation=25 / region=5 rows are fixed dims; supplier is the
    SF-proportional side that stays inside the task)."""
    import pyarrow.parquet as pq

    sup = pq.read_table(sup_p, columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(nat_p, columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(reg_p, columns=["r_regionkey", "r_name"])

    nk = nat.column("n_nationkey").to_numpy().astype(np.int64)
    o_n = np.argsort(nk, kind="stable")
    nk, n2r = nk[o_n], nat.column("n_regionkey").to_numpy().astype(np.int64)[o_n]
    rk = reg.column("r_regionkey").to_numpy().astype(np.int64)
    o_r = np.argsort(rk, kind="stable")
    rk = rk[o_r]
    rname = reg.column("r_name").combine_chunks().take(pa.array(o_r))

    s_nat = sup.column("s_nationkey").to_numpy().astype(np.int64)
    reg_of_sup = n2r[np.searchsorted(nk, s_nat)]
    return (sup.column("s_suppkey").to_numpy(),
            rname.take(pa.array(np.searchsorted(rk, reg_of_sup))))


def _supplier_region_revenue_shuffle(sf_dir: str):
    """Over-budget path: supplier no longer broadcastable — distributed
    hash join lineitem x (supplier pre-labeled with r_name via the fixed
    25/5-row nation/region dims), then the tiny per-region rollup."""
    import ray
    from ray.data.aggregate import Sum

    from cutwed_ray.stages.cluster import join_partitions

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    nk = nat.n_nationkey.to_numpy().astype(np.int64)
    o_n = np.argsort(nk, kind="stable")
    dims_ref = ray.put((nk[o_n], nat.n_regionkey.to_numpy().astype(np.int64)[o_n],
                        np.sort(reg.r_regionkey.to_numpy().astype(np.int64)),
                        reg.r_name.to_numpy()[
                            np.argsort(reg.r_regionkey.to_numpy(), kind="stable")]))

    def label_sup(t: pa.Table) -> pa.Table:
        nk_s, n2r, rk_s, rname = ray.get(dims_ref)
        s_nat = t.column("s_nationkey").to_numpy().astype(np.int64)
        r_of_s = n2r[np.searchsorted(nk_s, s_nat)]
        return pa.table({
            "s_suppkey": t.column("s_suppkey"),
            "r_name": pa.array(rname[np.searchsorted(rk_s, r_of_s)]),
        })

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(label_sup, batch_format="pyarrow")
    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])

    import pyarrow.parquet as pq
    n_li = pq.ParquetFile(f"{sf_dir}/lineitem.parquet").metadata.num_rows
    parts = max(2, min(join_partitions(), n_li // 50_000 + 1))
    joined = li.join(sup, join_type="inner", num_partitions=parts,
                     on=("l_suppkey",), right_on=("s_suppkey",))

    def partial(t: pa.Table) -> pa.Table:
        rev = np.floor(t.column("l_extendedprice").to_numpy()
                       * (1 - t.column("l_discount").to_numpy()) * 100
                       + 0.5).astype(np.int64)
        df = pa.table({"r_name": t.column("r_name"),
                       "rev_cents": pa.array(rev, pa.int64())}).to_pandas()
        g = df.groupby("r_name", as_index=False).agg(
            revenue_cents=("rev_cents", "sum"), n_items=("rev_cents", "size"))
        return _pt(g)

    return (joined.map_batches(partial, batch_format="pyarrow")
                  .groupby("r_name")
                  .aggregate(Sum("revenue_cents", alias_name="revenue_cents"),
                             Sum("n_items", alias_name="n_items")))


def q_supplier_region_revenue(sf_dir: str):
    """Multi-way star join lineitem -> supplier -> nation -> region as ONE
    broadcast lookup: a remote task composes the three dimension tables
    into (sorted s_suppkey, region-name codes) — the SF-proportional
    supplier table never lands on the driver — and the lineitem stream
    probes it with one searchsorted + bincount per batch
    (ops/broadcast.py).  Budget-guarded with the distributed hash-join
    fallback past DEFAULT_MAX_ROWS supplier rows."""
    from cutwed_ray.ops.broadcast import (DEFAULT_MAX_ROWS, build_lookup_async,
                                          grouped_sum_count, parquet_rows,
                                          probe_codes)

    sup_path = f"{sf_dir}/supplier.parquet"
    if parquet_rows(sup_path) > DEFAULT_MAX_ROWS:
        agg = _supplier_region_revenue_shuffle(sf_dir)
    else:
        ref = build_lookup_async(_sup_region_lookup_build, sup_path,
                                 f"{sf_dir}/nation.parquet",
                                 f"{sf_dir}/region.parquet")
        ds = _read(sf_dir, "lineitem",
                   ["l_suppkey", "l_extendedprice", "l_discount"])

        def partial(t: pa.Table) -> pa.Table:
            codes, found, cats = probe_codes(
                ref, t.column("l_suppkey").to_numpy())
            rev = np.floor(t.column("l_extendedprice").to_numpy()
                           * (1 - t.column("l_discount").to_numpy()) * 100
                           + 0.5).astype(np.int64)
            cnt, sm = grouped_sum_count(codes, found, rev, len(cats))
            nz = np.flatnonzero(cnt)
            return pa.table({
                "r_name": cats.take(pa.array(nz)),
                "revenue_cents": pa.array(sm[nz], pa.int64()),
                "n_items": pa.array(cnt[nz], pa.int64()),
            })

        from ray.data.aggregate import Sum

        agg = (ds.map_batches(partial, batch_format="pyarrow")
                 .groupby("r_name")
                 .aggregate(Sum("revenue_cents", alias_name="revenue_cents"),
                            Sum("n_items", alias_name="n_items")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "r_name": t.column("r_name"),
            "revenue_cents": pa.array(
                t.column("revenue_cents").to_numpy().astype(np.int64), pa.int64()),
            "n_items": pa.array(t.column("n_items").to_numpy().astype(np.int64),
                                pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_SUPPLIER_REGION_REVENUE = """
SELECT r.r_name,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
       count(*) AS n_items
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


def q_order_priority_revenue(sf_dir: str):
    """BIG-BIG distributed hash join: lineitem JOIN orders on the order key
    (neither side broadcast — both shuffle on the join key), then a tiny
    per-priority rollup.  Partition count tracks cluster CPUs
    (join_partitions); revenue in exact integer cents."""
    from ray.data.aggregate import Sum

    from cutwed_ray.stages.cluster import join_partitions

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def li_cents(t: pa.Table) -> pa.Table:
        rev = np.floor(t.column("l_extendedprice").to_numpy()
                       * (1 - t.column("l_discount").to_numpy()) * 100 + 0.5)
        return pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "rev_cents": pa.array(rev.astype(np.int64), pa.int64()),
        })

    # partition count sized by DATA as well as CPUs: each hash-join
    # partition is an aggregator actor whose startup dominates tiny joins.
    # Row count straight from the parquet footer — an earlier version ran
    # a Dataset count() here, which executed a full single-column scan
    import pyarrow.parquet as pq

    n_li = pq.ParquetFile(f"{sf_dir}/lineitem.parquet").metadata.num_rows
    parts = max(2, min(join_partitions(), n_li // 50_000 + 1))
    joined = li.map_batches(li_cents, batch_format="pyarrow").join(
        orders, join_type="inner", num_partitions=parts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("o_orderpriority", as_index=False).agg(
            n_items=("rev_cents", "size"), revenue_cents=("rev_cents", "sum"))
        return _pt(df)

    agg = (joined.map_batches(partial, batch_format="pyarrow")
                 .groupby("o_orderpriority")
                 .aggregate(Sum("n_items", alias_name="n_items"),
                            Sum("revenue_cents", alias_name="revenue_cents")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderpriority": t.column("o_orderpriority"),
            "n_items": pa.array(t.column("n_items").to_numpy().astype(np.int64),
                                pa.int64()),
            "revenue_cents": pa.array(
                t.column("revenue_cents").to_numpy().astype(np.int64), pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_ORDER_PRIORITY_REVENUE = """
SELECT o.o_orderpriority, count(*) AS n_items,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


def q_docs_quality_filter(sf_dir: str):
    """Composed quality-filter pipeline (the C4-style filtering shape):
    keep documents passing vectorized quality thresholds — the building
    block of a training-data cleaning pass, expressed as one streaming
    map_batches filter over the quality features."""
    from cutwed_ray.ops.text import text_quality

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def keep(t: pa.Table) -> pa.Table:
        q = text_quality(t)
        n_tok = q.column("n_tokens").to_numpy()
        punct = q.column("punct_ratio").to_numpy()
        digit = q.column("digit_ratio").to_numpy()
        mean_tok = q.column("mean_token_len").to_numpy()
        mask = (n_tok >= 20) & (punct <= 0.1) & (digit <= 0.2) \
            & (mean_tok >= 4.0) & (mean_tok <= 12.0)
        out = t.filter(pa.array(mask))
        return pa.table({"doc_id": out.column("doc_id")})

    return ds.map_batches(keep, batch_format="pyarrow")


# NOTE: the punct class matches SQL_TEXT_QUALITY's proven simplification
# (the synthetic documents contain no punctuation outside .,;:!?)
SQL_DOCS_QUALITY_FILTER = r"""
WITH q AS (
  SELECT doc_id,
         CASE WHEN regexp_replace(text, '^\s+|\s+$', '', 'g') = '' THEN 0
              ELSE length(regexp_split_to_array(
                     regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'))
         END AS n_tokens,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE
           / GREATEST(n_chars, 1) AS punct_ratio,
         length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
           / GREATEST(n_chars, 1) AS digit_ratio,
         length(regexp_replace(text, '\s', '', 'g'))::DOUBLE AS non_ws_chars
  FROM documents
)
SELECT doc_id FROM q
WHERE n_tokens >= 20 AND punct_ratio <= 0.1 AND digit_ratio <= 0.2
  AND non_ws_chars / GREATEST(n_tokens, 1) >= 4.0
  AND non_ws_chars / GREATEST(n_tokens, 1) <= 12.0
"""


def q_orders_topk_per_cust(sf_dir: str):
    """Window-function shape: top-3 orders by price per customer.

    Shuffle key is a COARSE hash bucket of the customer (not the customer
    itself): each map_groups call processes ~1/64 of all customers with
    one vectorized pandas sort + groupby.head — no per-customer
    micro-groups (one Python call per distinct key kills throughput at
    scale).  Deterministic tie-break on order key."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def bucketize(t: pa.Table) -> pa.Table:
        b = _key_bucket(t.column("o_custkey").to_numpy())
        return t.append_column("cbkt", pa.array(b, pa.int32()))

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["price_cents"] = np.floor(g.o_totalprice * 100 + 0.5).astype(np.int64)
        g = g.sort_values(["o_custkey", "price_cents", "o_orderkey"],
                          ascending=[True, False, True], kind="stable")
        g = g.groupby("o_custkey", as_index=False, sort=False).head(3)
        g["rk"] = g.groupby("o_custkey", sort=False).cumcount().to_numpy() + 1
        g["rk"] = g["rk"].astype(np.int64)
        return g[["o_custkey", "o_orderkey", "price_cents", "rk"]]

    return (ds.map_batches(bucketize, batch_format="pyarrow")
              .groupby("cbkt")
              .map_groups(topk_bucket, batch_format="pandas"))


SQL_ORDERS_TOPK = """
SELECT o_custkey, o_orderkey,
       CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) DESC,
                                        o_orderkey ASC) AS BIGINT) AS rk
FROM orders
QUALIFY rk <= 3
"""


def q_event_type_users(sf_dir: str):
    """Distinct-count aggregate: unique users per event_type.

    Fully vectorized (no per-group callables — one pandas call per distinct
    (type, user) pair is a micro-group scale-killer): per-batch
    drop_duplicates -> groupby aggregate Count() collapses each distinct
    pair to one row -> per-batch partial counts per type -> tiny Sum."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    from ray.data.aggregate import Count, Sum

    def partial(t: pa.Table) -> pa.Table:
        return _pt(t.to_pandas().drop_duplicates())

    distinct = (ds.map_batches(partial, batch_format="pyarrow")
                  .groupby(["event_type", "user_id"])
                  .aggregate(Count(alias_name="_c")))

    def count_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("event_type", as_index=False).agg(
            n_part=("user_id", "size"))
        return _pt(df)

    agg = (distinct.map_batches(count_partial, batch_format="pyarrow")
                   .groupby("event_type")
                   .aggregate(Sum("n_part", alias_name="n_users")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t.column("event_type"),
            "n_users": pa.array(t.column("n_users").to_numpy().astype(np.int64),
                                pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENT_TYPE_USERS = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users FROM events GROUP BY event_type
"""


# -------------------------------------------------------------------- events
def q_events_hourly(sf_dir: str):
    """Tumbling 1-hour event-time windows per user (streaming-shaped op:
    window = truncated timestamp key, no watermark needed for batch)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["hour"] = df.ts.dt.floor("h")
        df["value_u"] = np.floor(df.value * 1e6 + 0.5).astype(np.int64)
        g = df.groupby(["user_id", "hour"], as_index=False).agg(
            n_events=("value_u", "size"), sum_value_u=("value_u", "sum"))
        return _pt(g)

    from ray.data.aggregate import Sum

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["user_id", "hour"])
             .aggregate(Sum("n_events", alias_name="n_events"),
                        Sum("sum_value_u", alias_name="sum_value_u")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id"),
            # DuckDB date_trunc emits timestamp[us]; pandas dt.floor gives ns
            "hour": pc.cast(t.column("hour"), pa.timestamp("us")),
            "n_events": pa.array(t.column("n_events").to_numpy().astype(np.int64),
                                 pa.int64()),
            "sum_value_u": pa.array(
                t.column("sum_value_u").to_numpy().astype(np.int64), pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_HOURLY = """
SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_u
FROM events GROUP BY 1, 2
"""


def q_events_hopping(sf_dir: str):
    """HOPPING event-time windows (1-hour length, 30-minute hop): every
    event lands in exactly two windows, emitted per batch as two rows
    (vectorized), then the usual partial-agg -> tiny global groupby.  The
    overlap factor is the window/hop ratio — bounded amplification, no
    per-window state."""
    ds = _read(sf_dir, "events", ["ts", "value"])
    HOP_US = 1_800_000_000        # 30 min in microseconds

    def partial(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t.column("ts"), pa.timestamp("us")).to_numpy().astype(
            "datetime64[us]").view(np.int64)
        bucket = (ts_us // HOP_US) * HOP_US
        val = t.column("value").to_numpy()
        vu = np.floor(val * 1e6 + 0.5).astype(np.int64)
        starts = np.r_[bucket, bucket - HOP_US]
        vus = np.r_[vu, vu]
        df = pd.DataFrame({"window_start": starts, "value_u": vus}).groupby(
            "window_start", as_index=False).agg(
            n_events=("value_u", "size"), sum_value_u=("value_u", "sum"))
        return _pt(df)

    from ray.data.aggregate import Sum

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("window_start")
             .aggregate(Sum("n_events", alias_name="n_events"),
                        Sum("sum_value_u", alias_name="sum_value_u")))

    def finish(t: pa.Table) -> pa.Table:
        ws = t.column("window_start").to_numpy().astype(np.int64)
        return pa.table({
            "window_start": pa.array(ws.view("datetime64[us]"), pa.timestamp("us")),
            "n_events": pa.array(t.column("n_events").to_numpy().astype(np.int64),
                                 pa.int64()),
            "sum_value_u": pa.array(
                t.column("sum_value_u").to_numpy().astype(np.int64), pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_HOPPING = """
WITH ex AS (
  SELECT CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800 - w * 1800)
              AS TIMESTAMP) AS window_start,
         CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS value_u
  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS w)
)
SELECT window_start, count(*) AS n_events,
       CAST(SUM(value_u) AS BIGINT) AS sum_value_u
FROM ex GROUP BY window_start
"""


def q_events_type_stats(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["value_u"] = np.floor(df.value * 1e6 + 0.5).astype(np.int64)
        g = df.groupby("event_type", as_index=False).agg(
            n=("value_u", "size"), sum_value_u=("value_u", "sum"),
            max_value=("value", "max"), min_value=("value", "min"))
        return _pt(g)

    from ray.data.aggregate import Max, Min, Sum

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("event_type")
             .aggregate(Sum("n", alias_name="n"),
                        Sum("sum_value_u", alias_name="sum_value_u"),
                        Max("max_value", alias_name="max_value"),
                        Min("min_value", alias_name="min_value")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t.column("event_type"),
            "n": pa.array(t.column("n").to_numpy().astype(np.int64), pa.int64()),
            "sum_value_u": pa.array(
                t.column("sum_value_u").to_numpy().astype(np.int64), pa.int64()),
            "max_value": t.column("max_value"),
            "min_value": t.column("min_value"),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_TYPE_STATS = """
SELECT event_type, count(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_u,
       MAX(value) AS max_value, MIN(value) AS min_value
FROM events GROUP BY event_type
"""


def q_events_sessions(sf_dir: str):
    """Session windows (30-minute inactivity gap) per user — the
    streaming-shaped sessionization op (Ray Data has no watermarks; event
    time is handled by sorting within the shuffle partition).

    Shuffle key is a COARSE user hash bucket: each map_groups call
    sessionizes ~1/64 of all users in one vectorized pass (sort by
    (user, ts); a session break is a user change OR a >30-min gap; session
    ids by cumsum; one pandas groupby) — no per-user micro-groups."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def bucketize(t: pa.Table) -> pa.Table:
        b = _key_bucket(t.column("user_id").to_numpy())
        return t.append_column("ubkt", pa.array(b, pa.int32()))

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        new_user = g.user_id.ne(g.user_id.shift())
        gap = g.ts.diff() > pd.Timedelta(minutes=30)
        sess = (new_user | gap).cumsum()
        out = g.groupby(sess, as_index=False, sort=False).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"), n_events=("ts", "size"))
        out["n_events"] = out["n_events"].astype(np.int64)
        return out[["user_id", "session_start", "n_events"]]

    return (ds.map_batches(bucketize, batch_format="pyarrow")
              .groupby("ubkt")
              .map_groups(sessions_bucket, batch_format="pandas"))


SQL_EVENTS_SESSIONS = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM marked
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM sess GROUP BY user_id, sess_id
"""


def q_events_asof_order(sf_dir: str):
    """As-of join: for each event, the customer's most recent order at or
    before the event time (ops/joins.asof_join — the point-in-time
    primitive a plain equi-join can't express).  Ties on order date break
    to the highest order key; inner semantics (every sf0.01 event has a
    prior order, verified).  Prices in exact integer cents."""
    from cutwed_ray.ops.joins import asof_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])

    def cents(t: pa.Table) -> pa.Table:
        pcents = np.floor(t.column("o_totalprice").to_numpy() * 100 + 0.5
                          ).astype(np.int64)
        return (t.drop_columns(["o_totalprice"])
                 .append_column("price_cents", pa.array(pcents, pa.int64())))

    return asof_join(
        ev, orders.map_batches(cents, batch_format="pyarrow"),
        left_key="user_id", left_time="ts",
        right_key="o_custkey", right_time="o_orderdate",
        left_cols=["event_id", "user_id"],
        right_cols=["o_orderkey", "price_cents"],
        right_tie="o_orderkey")


SQL_EVENTS_ASOF_ORDER = """
WITH j AS (
  SELECT e.event_id, e.user_id, o.o_orderkey,
         CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC)
           AS rn
  FROM events e
  JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
SELECT event_id, user_id, o_orderkey, price_cents FROM j WHERE rn = 1
"""


def q_events_prev_hour(sf_dir: str):
    """Trailing-window range join (ops/joins.range_agg_join): per event,
    count + exact-micros value sum of the SAME user's events in the
    preceding hour ``[ts - 1h, ts)`` — the streaming 'trailing window
    feature' shape, computed as one coarse-bucketed vectorized merge (no
    per-key loops, no row-pair blowup like the SQL LEFT JOIN oracle)."""
    from cutwed_ray.ops.joins import range_agg_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def micros(t: pa.Table) -> pa.Table:
        vm = np.floor(t.column("value").to_numpy() * 1_000_000 + 0.5
                      ).astype(np.int64)
        return (t.drop_columns(["value"])
                 .append_column("value_micros", pa.array(vm, pa.int64())))

    evm = ev.map_batches(micros, batch_format="pyarrow")
    out = range_agg_join(
        evm, evm, left_key="user_id", left_time="ts",
        right_key="user_id", right_time="ts",
        left_cols=["event_id", "user_id"],
        window_lo=-3_600_000_000, window_hi=0, value_col="value_micros")

    def semantic_names(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["event_id", "user_id", "n_prev_1h", "prev_value_micros"])

    return out.map_batches(semantic_names, batch_format="pyarrow")


SQL_EVENTS_PREV_HOUR = """
SELECT a.event_id, a.user_id,
       count(b.event_id) AS n_prev_1h,
       CAST(COALESCE(SUM(CAST(FLOOR(b.value * 1000000 + 0.5) AS BIGINT)), 0)
            AS BIGINT) AS prev_value_micros
FROM events a
LEFT JOIN events b
  ON b.user_id = a.user_id
 AND b.ts >= a.ts - INTERVAL 1 HOUR AND b.ts < a.ts
GROUP BY a.event_id, a.user_id
"""


def q_events_lag_delta(sf_dir: str):
    """Per-key LAG window (ops/window.lag_delta): for each event with a
    predecessor, the exact-microsecond gap to the SAME user's previous
    event in (ts, event_id) order — the inter-arrival-time feature.
    Inner semantics (each user's first event dropped) keep the output
    all-int64 non-null."""
    from cutwed_ray.ops.window import lag_delta

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    return lag_delta(ev, key="user_id", time="ts", tiebreak="event_id",
                     cols=["event_id", "user_id"], out_col="gap_micros")


SQL_EVENTS_LAG_DELTA = """
WITH lagged AS (
  SELECT event_id, user_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id)) AS gap
  FROM events)
SELECT event_id, user_id, CAST(gap AS BIGINT) AS gap_micros
FROM lagged WHERE gap IS NOT NULL
"""


def q_events_user_cumsum(sf_dir: str):
    """Per-key running total (ops/window.running_sum): each event's
    cumulative value (exact integer micros) over the SAME user's events up
    to and including it, in (ts, event_id) order — the
    ``ROWS UNBOUNDED PRECEDING`` window every feature store needs."""
    from cutwed_ray.ops.window import running_sum

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def micros(t: pa.Table) -> pa.Table:
        vm = np.floor(t.column("value").to_numpy() * 1_000_000 + 0.5
                      ).astype(np.int64)
        return (t.drop_columns(["value"])
                 .append_column("value_micros", pa.array(vm, pa.int64())))

    return running_sum(
        ev.map_batches(micros, batch_format="pyarrow"),
        key="user_id", time="ts", tiebreak="event_id",
        value="value_micros", cols=["event_id", "user_id"],
        out_col="run_value_micros")


SQL_EVENTS_USER_CUMSUM = """
SELECT event_id, user_id,
       CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_value_micros
FROM events
"""


# ----------------------------------------------------------------------- ANN
KNN_QUERY_IDS = list(range(8))
KNN_K = 5


def q_knn_bruteforce(sf_dir: str):
    from cutwed_ray.ops.ann import knn_bruteforce

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = knn_bruteforce(ds, KNN_QUERY_IDS, k=KNN_K)

    # only the (query, neighbor) id sets are compared against the oracle:
    # DuckDB evaluates list_cosine_similarity in float32 while numpy works
    # in float64, so the cosine VALUES differ in low bits (the top-k SETS
    # agree — rank-boundary gaps are far larger than the precision delta)
    def fmt(t: pa.Table) -> pa.Table:
        return pa.table({
            "query_id": pa.array(t.column("query_id").to_numpy().astype(np.int64),
                                 pa.int64()),
            "neighbor_id": pa.array(t.column("neighbor_id").to_numpy().astype(np.int64),
                                    pa.int64()),
        })

    return out.map_batches(fmt, batch_format="pyarrow")


SQL_KNN_BRUTEFORCE = f"""
WITH sims AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding, n.embedding) AS cos
  FROM embeddings q CROSS JOIN embeddings n
  WHERE q.vec_id < {max(KNN_QUERY_IDS) + 1} AND n.vec_id != q.vec_id
)
SELECT query_id, neighbor_id FROM sims
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY cos DESC, neighbor_id ASC) <= {KNN_K}
"""


def q_ngram_jaccard(sf_dir: str):
    """EXACT k-token-shingle Jaccard near-dup (complete inverted-index
    candidates + broadcast-set verification) — unlike the LSH variants this
    is SQL-expressible, so it carries a DuckDB oracle."""
    from cutwed_ray.ops.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_read(sf_dir, "documents", ["doc_id", "text"]),
                               k=3, threshold=0.5)


SQL_NGRAM_JACCARD = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN regexp_replace(text, '^\s+|\s+$', '', 'g') = ''
              THEN []::VARCHAR[]
              ELSE regexp_split_to_array(
                     regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')
         END AS t
  FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN list_distinct([ t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                   FOR i IN range(1, len(t) - 1) ])
              ELSE [ array_to_string(list_sort(t), ' ') ] END AS s
  FROM toks
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.s, b.s)) AS inter,
         len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS un
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, round(inter::DOUBLE / GREATEST(un, 1), 8) AS jaccard
FROM pairs WHERE inter::DOUBLE / GREATEST(un, 1) >= 0.5
"""


def q_embedding_near_dup_exact(sf_dir: str):
    """Exact (all-pairs) embedding-cosine near-dup — the oracle-comparable
    twin of the LSH-bucketed ``embedding_near_dup`` (same pattern as
    knn_bruteforce vs knn_lsh).  Only the id pair SET is compared: DuckDB
    evaluates list_cosine_similarity in float32 vs numpy's float64, and at
    threshold 0.4 the closest pair margin in the testdata is >=1.3e-4 —
    three orders above the f32 error."""
    from cutwed_ray.ops.dedup import embedding_near_dup_pairs

    out = embedding_near_dup_pairs(_read(sf_dir, "embeddings"), threshold=0.4,
                                   exhaustive=True)

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table({
            "id_a": pa.array(t.column("id_a").to_numpy().astype(np.int64), pa.int64()),
            "id_b": pa.array(t.column("id_b").to_numpy().astype(np.int64), pa.int64()),
        })

    return out.map_batches(fmt, batch_format="pyarrow")


SQL_EMBEDDING_NEAR_DUP_EXACT = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
"""


# ------------------------------------------------- non-SQL-expressible (rows-only)
def q_minhash_near_dup(sf_dir: str):
    from cutwed_ray.ops.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_read(sf_dir, "documents", ["doc_id", "text"]),
                             verify_jaccard=0.5)


def q_minhash_dup_clusters(sf_dir: str):
    """Transitive near-dup clusters (``ops.dedup.dup_clusters``): the
    MinHash-LSH pair set closed under connectivity, every doc labeled
    with its component's min id and ``is_canonical`` marking the single
    representative to keep — the dedup ACTION, end to end.  Deterministic
    (pairs are the fixture-oracled minhash set; components of a fixed
    edge set are unique) -> pinned-fixture oracle."""
    from cutwed_ray.ops.dedup import dup_clusters, minhash_lsh_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs, verify_jaccard=0.5)
    return dup_clusters(_read(sf_dir, "documents", ["doc_id"]), pairs)


def q_simhash_near_dup(sf_dir: str):
    from cutwed_ray.ops.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(_read(sf_dir, "documents", ["doc_id", "text"]),
                                  max_hamming=6)


def q_embedding_near_dup(sf_dir: str):
    from cutwed_ray.ops.dedup import embedding_near_dup_pairs

    # testdata embeddings are random (max pairwise cosine ~0.48); 0.35 keeps
    # a non-empty near-dup set to exercise the operator end-to-end
    return embedding_near_dup_pairs(_read(sf_dir, "embeddings"), threshold=0.35)


_LANGID_SLOT: list = [None]


def _langid_batch(t: pa.Table) -> pa.Table:
    # per-worker lazy singleton (tables built once per process): a
    # task-pool stage with cached state — no actor pool to ramp up.  A
    # REAL model (fasttext-sized) would justify the actor-pool form
    # instead; see DecodeImageStage for that pattern.
    from cutwed_ray.ops.text import LangIdStage

    if _LANGID_SLOT[0] is None:
        _LANGID_SLOT[0] = LangIdStage()
    return _LANGID_SLOT[0](t)


def q_langid(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return ds.map_batches(_langid_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "lang", "lang_pred", "lang_score"])


def q_fingerprint(sf_dir: str):
    from cutwed_ray.ops.text import fingerprint

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(lambda t: fingerprint(t).select(["doc_id", "fingerprint"]),
                          batch_format="pyarrow")


def q_knn_lsh(sf_dir: str):
    from cutwed_ray.ops.ann import knn_lsh

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return knn_lsh(ds, KNN_QUERY_IDS, k=KNN_K)


def q_knn_ivf(sf_dir: str):
    """IVF-flat ANN scale path (coarse k-means cells, n_probe scan)."""
    from cutwed_ray.ops.ann import knn_ivf

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return knn_ivf(ds, KNN_QUERY_IDS, k=KNN_K, n_centroids=16, n_probe=6)


def q_twed_pairs_documents(sf_dir: str):
    """Flagship scorer over the documents table: text -> token series ->
    blocked TWED candidate pairs (not SQL-expressible)."""
    from cutwed_ray.pipelines.entity_resolution import default_config, score_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def to_files(t: pa.Table) -> pa.Table:
        return pa.table({
            "repo": pa.array(["docs"] * len(t), pa.string()),
            "path": pc.cast(t.column("doc_id"), pa.string()),
            "commit": pa.array([""] * len(t), pa.string()),
            "lang": t.column("lang"),
            "content": t.column("text"),
        })

    cfg = default_config(threshold=0.35)
    pairs = score_pairs(ds.map_batches(to_files, batch_format="pyarrow"), cfg,
                        n_buckets=16)
    # Semantic columns only: `bucket`/`n_dropped_bucket` are scheduling
    # internals (the long-bucket placement heuristic changes them without
    # changing the pair set), and the pinned-fixture oracle must not pin
    # the scheduler.
    return pairs.select_columns(["id_a", "id_b", "twed", "twed_norm",
                                 "exact", "block_key"])


def q_twed_topk_neighbors(sf_dir: str):
    """Top-k TWED neighbors per document from the scored pair table
    (SURVEY §2.6 'top-k nearest neighbors per file'; not SQL-expressible —
    depends on the TWED scorer)."""
    from cutwed_ray.pipelines.entity_resolution import topk_twed_neighbors

    return topk_twed_neighbors(q_twed_pairs_documents(sf_dir), k=3)


def q_er_clusters_documents(sf_dir: str):
    """Full flagship pipeline over documents: clusters with sha256 invariant."""
    from cutwed_ray.pipelines.entity_resolution import default_config, run_er

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def to_files(t: pa.Table) -> pa.Table:
        return pa.table({
            "repo": pa.array(["docs"] * len(t), pa.string()),
            "path": pc.cast(t.column("doc_id"), pa.string()),
            "commit": pa.array([""] * len(t), pa.string()),
            "lang": t.column("lang"),
            "content": t.column("text"),
        })

    res = run_er(ds.map_batches(to_files, batch_format="pyarrow"),
                 default_config(threshold=0.35), n_buckets=16)
    return res.clusters.select_columns(["path", "sha256", "cluster_id"])


def q_link_documents(sf_dir: str):
    """Cross-dataset record linkage demo: even-doc_id documents vs odd
    (two 'tables'), TWED-scored cross pairs only (not SQL-expressible)."""
    from cutwed_ray.pipelines.entity_resolution import default_config, link_er

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def to_files(parity: int):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy()
            t = t.filter(pa.array(ids % 2 == parity))
            return pa.table({
                "repo": pa.array(["docs"] * len(t), pa.string()),
                "path": pc.cast(t.column("doc_id"), pa.string()),
                "commit": pa.array([""] * len(t), pa.string()),
                "lang": t.column("lang"),
                "content": t.column("text"),
            })
        return f

    a = ds.map_batches(to_files(0), batch_format="pyarrow")
    b = ds.map_batches(to_files(1), batch_format="pyarrow")
    linked = link_er(a, b, default_config(threshold=0.35), n_buckets=8)
    # Drop scheduling internals (see q_twed_pairs_documents).
    return linked.select_columns(["id_a", "id_b", "twed", "twed_norm",
                                  "exact", "block_key", "side_a", "side_b"])


def q_embedding_kmeans(sf_dir: str):
    """Distributed Lloyd k-means over the embeddings table (semantic
    clustering for dedup/curation): iterative map_batches partial-sum
    passes, fixed-point int64 accumulation so the assignment is
    bit-deterministic across CPU counts and block layouts (the fixture
    oracle's requirement); nothing corpus-sized reaches the driver."""
    from cutwed_ray.ops.kmeans import kmeans_assign

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans_assign(ds, k=8, iters=4, seed=17)


def q_media_features(sf_dir: str):
    """Multimodal plumbing: synthetic binary media table -> actor-pool
    decode-stub -> feature vectors (sf_dir sets the table size).

    The STUB decode path is pinned EXPLICITLY (``real_decode=False``, the
    second constructor arg): the frozen fixture oracle covers the stub
    only, so a container that later gains PIL must not silently flip this
    query onto the real-decode path ('auto' would).  Features are emitted
    as ``f00..f15`` scalar columns — the driver's canonical sort/hash
    cannot order list cells — via a zero-copy flatten of the fixed-size
    list."""
    import ray.data as rd

    from cutwed_ray.ops.multimodal import BINARY_BATCH_KWARGS, DecodeImageStage, synth_media_table

    n = 256 if "0.001" in sf_dir else 1024
    ds = rd.from_arrow(synth_media_table(n, seed=42))
    out = ds.map_batches(DecodeImageStage, fn_constructor_args=(16, False),
                         concurrency=(1, 2), **BINARY_BATCH_KWARGS)
    return out.map_batches(_flatten_feature_cols, batch_format="pyarrow")


def _flatten_feature_cols(t: pa.Table) -> pa.Table:
    """fixed_size_list features -> f00..fNN scalar columns (the driver's
    canonical sort/hash cannot order list cells) + decode_ok."""
    f = t.column("features")
    if isinstance(f, pa.ChunkedArray):
        f = f.combine_chunks()
    m = f.flatten().to_numpy(zero_copy_only=False).reshape(len(t), -1)
    cols = {"media_id": t.column("media_id")}
    for j in range(m.shape[1]):
        cols[f"f{j:02d}"] = pa.array(m[:, j], pa.float64())
    cols["decode_ok"] = t.column("decode_ok")
    return pa.table(cols)


def q_media_image_real(sf_dir: str):
    """REAL multimodal image decode (``ops.multimodal.decode_ppm``): the
    synthetic table carries genuine binary P6 PPM images (header + RGB
    raster) and the actor-pool stage decodes them with the numpy-only
    netpbm decoder — header parse, zero-copy raster reshape, exact
    integer block sums -> float64 grid features.  No codec library, no
    hash stub; row 0 is deliberately corrupt to pin the per-row
    ``decode_ok=False`` path.  Fixture-oracled (bit-deterministic
    integer pixel synthesis + one IEEE division per feature)."""
    import ray.data as rd

    from cutwed_ray.ops.multimodal import (BINARY_BATCH_KWARGS,
                                           DecodeImageStage, synth_ppm_table)

    n = 256 if "0.001" in sf_dir else 1024
    ds = rd.from_arrow(synth_ppm_table(n, seed=42))
    out = ds.map_batches(DecodeImageStage, fn_constructor_args=(16, "ppm"),
                         concurrency=(1, 2), **BINARY_BATCH_KWARGS)
    return out.map_batches(_flatten_feature_cols, batch_format="pyarrow")


def q_events_value_quantiles(sf_dir: str):
    """Exact per-type discrete quantiles (p25/p50/p75/p90/p99) of the
    event value in integer micros — the distributed-histogram quantile
    operator (``ops.agg.grouped_quantiles``): duplicate (type, value)
    pairs collapse per batch, the global groupby shuffles DISTINCT pairs
    only, and each type walks its histogram with one cumsum."""
    from cutwed_ray.ops.agg import grouped_quantiles

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def micros(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy()
        vu = np.floor(v * 1e6 + 0.5).astype(np.int64)
        return pa.table({"event_type": t.column("event_type"),
                         "value_u": pa.array(vu, pa.int64())})

    return grouped_quantiles(
        ds.map_batches(micros, batch_format="pyarrow"),
        "event_type", "value_u", qs=(0.25, 0.5, 0.75, 0.9, 0.99))


SQL_EVENTS_VALUE_QUANTILES = """
WITH vu AS (
  SELECT event_type, CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS value_u
  FROM events
)
SELECT event_type, count(*) AS n_rows,
       CAST(quantile_disc(value_u, 0.25) AS BIGINT) AS q25,
       CAST(quantile_disc(value_u, 0.5)  AS BIGINT) AS q50,
       CAST(quantile_disc(value_u, 0.75) AS BIGINT) AS q75,
       CAST(quantile_disc(value_u, 0.9)  AS BIGINT) AS q90,
       CAST(quantile_disc(value_u, 0.99) AS BIGINT) AS q99
FROM vu GROUP BY event_type
"""


def q_docs_split_counts(sf_dir: str):
    """Deterministic train/val/test split assignment (hash of doc_id, no
    RNG — ``ops.sampling.hash_split``) summarized as per-(lang, split)
    counts + char sums.  Fixture-oracled: the splitmix64 hash is not
    ANSI-SQL-expressible, but the assignment is a pure function of the
    input ids, invariant to parallelism and block layout."""
    from ray.data.aggregate import Sum

    from cutwed_ray.ops.sampling import hash_split

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby(["lang", "split"], as_index=False).agg(
            n_docs=("doc_id", "size"), sum_chars=("n_chars", "sum"))
        df["n_docs"] = df.n_docs.astype(np.int64)
        df["sum_chars"] = df.sum_chars.astype(np.int64)
        return _pt(df)

    return (hash_split(ds, "doc_id")
            .map_batches(partial, batch_format="pyarrow")
            .groupby(["lang", "split"])
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("sum_chars", alias_name="sum_chars"))
            .map_batches(lambda t: pa.table({
                "lang": t.column("lang"),
                "split": t.column("split"),
                "n_docs": pa.array(
                    t.column("n_docs").to_numpy().astype(np.int64), pa.int64()),
                "sum_chars": pa.array(
                    t.column("sum_chars").to_numpy().astype(np.int64), pa.int64()),
            }), batch_format="pyarrow"))


def q_top_tokens(sf_dir: str):
    """Corpus-wide heavy hitters: top-25 whitespace tokens by count —
    the canonical wide-shuffle wordcount.  Per-batch Arrow split +
    value_counts collapses each batch to its distinct tokens (the
    combiner; shuffle rows = distinct tokens per batch, not token
    occurrences), a distributed groupby sums, and sort+limit takes the
    head.  Deterministic tie-break: count DESC, token ASC."""
    ds = _read(sf_dir, "documents", ["text"])

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.utf8_split_whitespace(pc.utf8_trim_whitespace(t.column("text"))))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = toks.value_counts()
        return pa.table({
            "token": vc.field("values"),
            "cnt": pc.cast(vc.field("counts"), pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("token")
             .aggregate(Sum("cnt", alias_name="n_occurrences")))

    def local_head(t: pa.Table) -> pa.Table:
        # counts are GLOBAL after the groupby, so a per-block top-25 is a
        # correct pre-filter: the final sort sees <= 25 x n_blocks rows,
        # never the whole vocabulary
        c = t.column("n_occurrences").to_numpy().astype(np.int64)
        tok = t.column("token").to_numpy(zero_copy_only=False)
        order = np.lexsort((tok, -c))[:25]
        sel = pa.array(np.sort(order), pa.int64())
        return pa.table({
            "token": t.column("token").take(sel),
            "n_occurrences": pa.array(c[np.sort(order)], pa.int64()),
        })

    return (agg.map_batches(local_head, batch_format="pyarrow")
               .sort(["n_occurrences", "token"], descending=[True, False])
               .limit(25))


SQL_TOP_TOKENS = r"""
SELECT tok AS token, count(*) AS n_occurrences FROM (
  SELECT unnest(regexp_split_to_array(
           regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS tok
  FROM documents
  WHERE regexp_replace(text, '^\s+|\s+$', '', 'g') <> ''
)
GROUP BY tok ORDER BY n_occurrences DESC, token ASC LIMIT 25
"""


def q_lang_mode_chars(sf_dir: str):
    """Exact per-language MODE of document length (``ops.agg.grouped_mode``:
    distributed histogram + one lexsort per group over distinct values;
    deterministic tie-break highest-count-then-lowest-value)."""
    from cutwed_ray.ops.agg import grouped_mode

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "lang": t.column("lang"),
            "n_chars": pa.array(
                t.column("n_chars").to_numpy().astype(np.int64), pa.int64()),
        })

    return grouped_mode(ds.map_batches(prep, batch_format="pyarrow"),
                        "lang", "n_chars")


SQL_LANG_MODE_CHARS = """
WITH h AS (
  SELECT lang, CAST(n_chars AS BIGINT) AS n_chars, count(*) AS cnt
  FROM documents GROUP BY 1, 2
)
SELECT lang, n_chars AS mode_value, cnt AS mode_count FROM h
QUALIFY row_number() OVER (PARTITION BY lang
                           ORDER BY cnt DESC, n_chars ASC) = 1
"""


def q_customers_no_orders(sf_dir: str):
    """ANTI join: customers that never placed a 1-URGENT order
    (``ops.joins.key_filter_join`` — the right side is FILTERED then
    reduced to per-batch distinct keys at the read, so only matching
    int64 keys ride the shuffle; coarse co-partition, one sorted isin
    per group).  The priority filter keeps the result non-degenerate
    (every customer in this testdata has SOME order)."""
    from cutwed_ray.ops.joins import key_filter_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def urgent(t: pa.Table) -> pa.Table:
        mask = pc.equal(t.column("o_orderpriority"), "1-URGENT")
        return t.filter(mask).select(["o_custkey"])

    return key_filter_join(cust,
                           orders.map_batches(urgent, batch_format="pyarrow"),
                           left_key="c_custkey", right_key="o_custkey",
                           left_cols=["c_custkey", "c_mktsegment"],
                           anti=True)


SQL_CUSTOMERS_NO_ORDERS = """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""


def q_parts_never_ordered(sf_dir: str):
    """Bloom-prefiltered distributed ANTI join (ops/joins.key_filter_join
    with bloom_bits): parts never ordered in bulk (no lineitem with
    quantity >= 45).  The Bloom filter of the (filtered) right keys is
    built distributed (fixed-size mergeable blobs, one remote OR-reduce)
    and broadcast once; left rows whose key definitely isn't on the right
    skip the exact probe — result bit-identical to the plain path
    (tests/test_agg_ops.py)."""
    import pyarrow.compute as pc

    from cutwed_ray.ops.joins import key_filter_join

    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])

    def bulk(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("l_quantity"), 45.0)) \
                .select(["l_partkey"])

    return key_filter_join(part, li.map_batches(bulk, batch_format="pyarrow"),
                           left_key="p_partkey", right_key="l_partkey",
                           left_cols=["p_partkey", "p_type"],
                           anti=True, bloom_bits=1 << 20)


SQL_PARTS_NEVER_ORDERED = """
SELECT p_partkey, p_type FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45)
"""


def q_approx_user_counts(sf_dir: str):
    """HyperLogLog approximate distinct users per event type
    (``ops.agg.hll_distinct``): one 4-KiB mergeable sketch per (batch,
    type) rides the shuffle instead of every distinct id — THE
    cardinality primitive at 100 TB.  Deterministic (splitmix64-seeded,
    no RNG), so the oracle is a pinned fixture; accuracy vs the exact
    count is asserted in tests/test_agg_ops.py (~1.6% rse at p=12)."""
    from cutwed_ray.ops.agg import hll_distinct

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return hll_distinct(ds, "event_type", "user_id", p=12)


def q_docs_top_decile_chars(sf_dir: str):
    """Percentile-gated quality filter (ops/agg.quantile_threshold_filter):
    documents in the top decile by length — phase 1 computes the exact
    global quantile_disc(0.9) threshold from a distributed value
    histogram (driver pulls the histogram, bounded by the value domain),
    phase 2 streams the corpus through a broadcast-threshold filter."""
    from cutwed_ray.ops.agg import quantile_threshold_filter

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return quantile_threshold_filter(ds, "n_chars", 0.9,
                                     ["doc_id", "n_chars"])


SQL_DOCS_TOP_DECILE_CHARS = """
SELECT doc_id, n_chars FROM documents
WHERE n_chars >= (SELECT quantile_disc(n_chars, 0.9) FROM documents)
"""


def q_docs_stratified_sample(sf_dir: str):
    """Deterministic stratified sample (ops/sampling.stratified_sample):
    10 pseudo-random documents per language — k smallest
    ``(knuth_hash(doc_id), doc_id)`` per group, reproducible at every
    parallelism and replicable by the ANSI-SQL oracle.  Per-block partial
    top-k keeps the shuffle at <= k x langs x blocks light rows."""
    from cutwed_ray.ops.sampling import stratified_sample

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return stratified_sample(ds, "lang", "doc_id", k=10)


SQL_DOCS_STRATIFIED_SAMPLE = """
SELECT lang, doc_id, CAST(rn AS BIGINT) AS rank FROM (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
             ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
  FROM documents)
WHERE rn <= 10
"""


def q_lineitem_corr(sf_dir: str):
    """Per-returnflag Pearson correlation of quantity vs whole-dollar
    price via exact integer sufficient statistics
    (``ops.agg.grouped_corr``): the engine and the oracle evaluate the
    SAME closed form from the same exact integer sums, so the double
    output is bit-identical — no rounding tolerance."""
    from cutwed_ray.ops.agg import grouped_corr

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])

    def units(t: pa.Table) -> pa.Table:
        x = np.floor(t.column("l_quantity").to_numpy() + 0.5).astype(np.int64)
        y = np.floor(t.column("l_extendedprice").to_numpy()).astype(np.int64)
        return pa.table({"l_returnflag": t.column("l_returnflag"),
                         "x": pa.array(x, pa.int64()),
                         "y": pa.array(y, pa.int64())})

    return grouped_corr(ds.map_batches(units, batch_format="pyarrow"),
                        "l_returnflag", "x", "y")


SQL_LINEITEM_CORR = """
WITH u AS (
  SELECT l_returnflag,
         CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS x,
         CAST(FLOOR(l_extendedprice) AS BIGINT) AS y
  FROM lineitem),
s AS (
  SELECT l_returnflag, count(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
  FROM u GROUP BY l_returnflag)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_rows,
       CAST(sx AS BIGINT) AS sum_x,
       CAST(sy AS BIGINT) AS sum_y,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr
FROM s
"""


def q_region_nation_rollup(sf_dir: str):
    """ROLLUP revenue totals by (region, nation): broadcast dim lookup +
    per-batch map-side combine, ONE distributed finest-level groupby,
    subtotal levels derived from the small aggregate
    (``ops.agg.rollup_sum``).  Rolled-up slots carry the 'ALL' sentinel
    (oracle: GROUP BY ROLLUP + COALESCE)."""
    from cutwed_ray.ops.agg import rollup_sum
    from cutwed_ray.ops.broadcast import (build_lookup_async,
                                          grouped_sum_count, probe_codes)

    # supplier -> "r_name\x1fn_name" lookup built in ONE remote task (the
    # SF-proportional supplier table never lands on the driver — the same
    # ops/broadcast shape as supplier_region_revenue); the composite value
    # dictionary-encodes to <= |nations| categories
    def build(sup_p, nat_p, reg_p):
        import pyarrow.parquet as pq

        sup = pq.read_table(sup_p, columns=["s_suppkey", "s_nationkey"])
        nat = pq.read_table(nat_p,
                            columns=["n_nationkey", "n_name", "n_regionkey"])
        reg = pq.read_table(reg_p, columns=["r_regionkey", "r_name"])
        nk = nat.column("n_nationkey").to_numpy().astype(np.int64)
        o_n = np.argsort(nk, kind="stable")
        nk = nk[o_n]
        n2r = nat.column("n_regionkey").to_numpy().astype(np.int64)[o_n]
        n_names = np.asarray(nat.column("n_name").to_pylist(),
                             dtype=object)[o_n]
        rk = reg.column("r_regionkey").to_numpy().astype(np.int64)
        o_r = np.argsort(rk, kind="stable")
        rk = rk[o_r]
        r_names = np.asarray(reg.column("r_name").to_pylist(),
                             dtype=object)[o_r]
        s_nat_pos = np.searchsorted(nk, sup.column("s_nationkey")
                                    .to_numpy().astype(np.int64))
        combo = np.char.add(
            np.char.add(r_names[np.searchsorted(
                rk, n2r[s_nat_pos])].astype(str), "\x1f"),
            n_names[s_nat_pos].astype(str))
        return sup.column("s_suppkey").to_numpy(), pa.array(combo)

    ref = build_lookup_async(build, f"{sf_dir}/supplier.parquet",
                             f"{sf_dir}/nation.parquet",
                             f"{sf_dir}/region.parquet")
    ds = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        codes, found, cats = probe_codes(ref, t.column("l_suppkey").to_numpy())
        rev = np.floor(t.column("l_extendedprice").to_numpy()
                       * (1 - t.column("l_discount").to_numpy()) * 100
                       + 0.5).astype(np.int64)
        cnt, sm = grouped_sum_count(codes, found, rev, len(cats))
        nz = np.flatnonzero(cnt)
        pairs = [c.split("\x1f") for c in cats.take(pa.array(nz)).to_pylist()]
        return pa.table({
            "r_name": pa.array([p[0] for p in pairs], pa.string()),
            "n_name": pa.array([p[1] for p in pairs], pa.string()),
            "revenue_cents": pa.array(sm[nz], pa.int64()),
            "n_rows": pa.array(cnt[nz], pa.int64()),
        })

    pre = ds.map_batches(partial, batch_format="pyarrow")
    return rollup_sum(pre, ["r_name", "n_name"], "revenue_cents",
                      precombined=True)


SQL_REGION_NATION_ROLLUP = """
SELECT COALESCE(r.r_name, 'ALL') AS r_name,
       COALESCE(n.n_name, 'ALL') AS n_name,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
       count(*) AS n_rows
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP(r.r_name, n.n_name)
"""


def q_events_funnel(sf_dir: str):
    """Ordered view -> click -> purchase funnel: per-user strictly-after
    stage progression resolved in one coarse user-bucket shuffle
    (``ops.window.funnel_counts``), counts summed by a tiny groupby."""
    from cutwed_ray.ops.window import funnel_counts

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    return funnel_counts(ds, key="user_id", type_col="event_type",
                         time="ts", stages=["view", "click", "purchase"])


SQL_EVENTS_FUNNEL = """
WITH s0 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id),
s1 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN s0 ON e.user_id = s0.user_id
  WHERE e.event_type = 'click' AND e.ts > s0.t GROUP BY e.user_id),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s1.t GROUP BY e.user_id)
SELECT '1_view' AS funnel_stage, count(*) AS n_keys FROM s0
UNION ALL SELECT '2_click', count(*) FROM s1
UNION ALL SELECT '3_purchase', count(*) FROM s2
"""


def q_events_props_stats(sf_dir: str):
    """Schema-on-read over the semi-structured ``props`` JSON payload:
    vectorized RE2 integer-field extraction (``ops.text.json_int_field``,
    one compiled kernel per batch — no per-row JSON parse), then a
    per-batch map-side combine and a tiny per-type groupby."""
    from ray.data.aggregate import Max, Min, Sum

    from cutwed_ray.ops.text import json_int_field

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        t = json_int_field(t, "k")
        df = t.select(["event_type", "k"]).to_pandas().dropna(subset=["k"])
        g = df.groupby("event_type", as_index=False).agg(
            n_with_k=("k", "size"), sum_k=("k", "sum"),
            min_k=("k", "min"), max_k=("k", "max"))
        for c in ("n_with_k", "sum_k", "min_k", "max_k"):
            g[c] = g[c].astype(np.int64)
        return _pt(g)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("event_type")
             .aggregate(Sum("n_with_k", alias_name="n_with_k"),
                        Sum("sum_k", alias_name="sum_k"),
                        Min("min_k", alias_name="min_k"),
                        Max("max_k", alias_name="max_k")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t.column("event_type"),
            **{c: pa.array(t.column(c).to_numpy().astype(np.int64), pa.int64())
               for c in ("n_with_k", "sum_k", "min_k", "max_k")},
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_PROPS_STATS = r"""
WITH x AS (
  SELECT event_type,
         TRY_CAST(NULLIF(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1), '')
                  AS BIGINT) AS k
  FROM events)
SELECT event_type,
       count(k) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM x WHERE k IS NOT NULL GROUP BY event_type
"""


#: fixed candidate list for the CMS frequency query (drawn from the
#: synthetic documents vocabulary; the estimate is defined for ANY token,
#: absent ones estimate near 0)
CMS_CANDIDATES = ["table", "value", "key", "row", "hash",
                  "merge", "scan", "sort", "batch", "join"]


def q_approx_token_freq(sf_dir: str):
    """Count-min-sketch token-frequency estimates for a fixed candidate
    list (``ops.agg.cms_token_counts``): one mergeable depth x width blob
    per batch, two-level tree merge, min-over-rows estimate.  Deterministic
    (polynomial string hashes) -> fixture-oracled; the unit test
    sandwiches the estimate against exact counts (est >= exact,
    est <= exact + eps*N)."""
    from cutwed_ray.ops.agg import cms_token_counts

    ds = _read(sf_dir, "documents", ["text"])
    return cms_token_counts(ds, "text", CMS_CANDIDATES)


def q_media_audio_energy(sf_dir: str):
    """REAL multimodal decode path (``ops.multimodal.AudioEnergyStage``):
    int16 PCM payloads viewed zero-copy from the Arrow binary buffer,
    per-1024-sample window EXACT int64 energy (sum of squares) + peak —
    one vectorized reduceat over the whole batch, no codec library, no
    per-row loop.  Integer-deterministic synthetic audio table ->
    pinned-fixture oracle."""
    import ray.data as rd

    from cutwed_ray.ops.multimodal import (BINARY_BATCH_KWARGS,
                                           AudioEnergyStage,
                                           synth_audio_table)

    n = 64 if "0.001" in sf_dir else 256
    ds = rd.from_arrow(synth_audio_table(n))
    return ds.map_batches(AudioEnergyStage, fn_constructor_args=(1024,),
                          concurrency=(1, 2), **BINARY_BATCH_KWARGS)


def q_embedding_pca2(sf_dir: str):
    """Distributed 2-component PCA projection of the embedding table
    (``ops.pca.pca_project``): exact int64 moment accumulation (layout-
    and parallelism-invariant), driver eigh of the 16x16 covariance,
    broadcast components, streaming vectorized projection.  Fixture-
    oracled: the quantized-moment pipeline is deterministic but not
    ANSI-SQL-expressible."""
    from cutwed_ray.ops.pca import pca_project

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return pca_project(ds, ["vec_id"], "embedding", n_components=2)


#: token budget for the sequence-packing query (a typical pretraining
#: context length; the op is budget-agnostic)
PACK_BUDGET = 2048


def q_docs_pack_stats(sf_dir: str):
    """Token-budget sequence packing (``ops.packing.pack_stats``): docs
    concatenated in doc_id order, the token stream cut every PACK_BUDGET
    tokens, each doc assigned to the pack its first token lands in
    (exclusive global prefix sum // budget — the distributed-scan
    primitive), then one tiny groupby to per-pack (n_docs, pack_tokens).
    The light (doc_id, n_tokens) projection is materialized once because
    the scan executes its input three times."""
    from cutwed_ray.ops.packing import pack_stats
    from cutwed_ray.ops.text import token_count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    light = ds.map_batches(
        lambda t: token_count(t).select(["doc_id", "n_tokens"]),
        batch_format="pyarrow").materialize()
    return pack_stats(light, order_col="doc_id", tokens_col="n_tokens",
                      budget=PACK_BUDGET)


SQL_DOCS_PACK_STATS = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN regexp_replace(text, '^\s+|\s+$', '', 'g') = '' THEN 0
              ELSE length(regexp_split_to_array(
                     regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'))
         END AS n_tokens
  FROM documents),
cum AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl
  FROM toks)
SELECT CAST(excl // 2048 AS BIGINT) AS pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
FROM cum GROUP BY pack_id
"""


#: fixed category dictionary for the events pivot (at scale, learn it
#: with a tiny distinct aggregate first — the domain is the category
#: cardinality, never the corpus)
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_type_pivot(sf_dir: str):
    """Wide per-user event-type count pivot (``ops.agg.pivot_counts``):
    one row per user with an int64 count per event type plus the total —
    conditional aggregation with map-side combine (each batch emits one
    pre-summed wide row per user present in it)."""
    from cutwed_ray.ops.agg import pivot_counts

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    return pivot_counts(ev, "user_id", "event_type", EVENT_TYPES,
                        total_col="n_events")


SQL_EVENTS_TYPE_PIVOT = """
SELECT user_id,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS c_click,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error')    AS BIGINT) AS c_error,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS c_purchase,
       CAST(COUNT(*) FILTER (WHERE event_type = 'signup')   AS BIGINT) AS c_signup,
       CAST(COUNT(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS c_view,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id
"""


def q_events_value_outliers(sf_dir: str):
    """Per-type z-score anomaly gate (``ops.agg.zscore_outliers``): keep
    events whose centi-unit value falls outside mean ± 2·std of their
    event type.  Exact int64 (n, sum, sumsq) sufficient statistics; both
    engine and oracle evaluate the identical float64 threshold tree, so
    the kept row sets are bit-identical (grouped_corr technique)."""
    from cutwed_ray.ops.agg import zscore_outliers

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def centi(t: pa.Table) -> pa.Table:
        vc = np.floor(t.column("value").to_numpy() * 100 + 0.5
                      ).astype(np.int64)
        return (t.drop_columns(["value"])
                 .append_column("value_centi", pa.array(vc, pa.int64())))

    return zscore_outliers(
        ev.map_batches(centi, batch_format="pyarrow"),
        "event_type", "value_centi",
        cols=["event_id", "event_type", "value_centi"], z=2.0)


SQL_EVENTS_VALUE_OUTLIERS = """
WITH v AS (
  SELECT event_id, event_type,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_centi
  FROM events),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(value_centi) AS BIGINT) AS s,
         CAST(SUM(value_centi * value_centi) AS BIGINT) AS q
  FROM v GROUP BY event_type),
t AS (
  SELECT event_type,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         sqrt((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS sd
  FROM s)
SELECT v.event_id, v.event_type, v.value_centi
FROM v JOIN t USING (event_type)
WHERE CAST(v.value_centi AS DOUBLE) > t.mean + 2.0 * t.sd
   OR CAST(v.value_centi AS DOUBLE) < t.mean - 2.0 * t.sd
"""


def q_events_latest_per_user(sf_dir: str):
    """Per-entity current-state compaction (``ops.window.latest_per_key``):
    each user's latest event by (ts, event_id) — the CDC/upsert
    resolution.  Map-side combine first: each batch reduces to one
    candidate per user before the shuffle."""
    from cutwed_ray.ops.window import latest_per_key

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    return latest_per_key(ev, key="user_id", order_cols=["ts", "event_id"],
                          cols=["event_id", "user_id", "ts", "event_type"])


SQL_EVENTS_LATEST_PER_USER = """
SELECT event_id, user_id, ts, event_type
FROM events
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


def q_cust_spend_rank(sf_dir: str):
    """Global customer-spend leaderboard (``ops.packing.global_rank``):
    exact per-customer order spend (cents) via one distributed groupby,
    then the 0-based global rank in (spend, custkey) order via the
    prefix-scan primitive — ROW_NUMBER semantics WITHOUT an all-to-all
    sort of the corpus (O(buckets) driver bytes).  The light
    (custkey, spend) aggregate is materialized once because the scan
    executes its input three times."""
    from ray.data.aggregate import Sum

    from cutwed_ray.ops.packing import global_rank

    od = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.floor(t.column("o_totalprice").to_numpy() * 100 + 0.5
                     ).astype(np.int64)
        return pa.table({
            "o_custkey": t.column("o_custkey"),
            "spend_cents": pa.array(c, pa.int64()),
        })

    spend = (od.map_batches(cents, batch_format="pyarrow")
               .groupby("o_custkey")
               .aggregate(Sum("spend_cents", alias_name="spend_cents")))

    def as_i64(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": pa.array(t.column("o_custkey").to_numpy()
                                  .astype(np.int64), pa.int64()),
            "spend_cents": pa.array(t.column("spend_cents").to_numpy()
                                    .astype(np.int64), pa.int64()),
        })

    light = spend.map_batches(as_i64, batch_format="pyarrow").materialize()
    return global_rank(light, order_col="spend_cents", tiebreak="o_custkey",
                       cols=["o_custkey", "spend_cents"],
                       out_col="spend_rank")


SQL_CUST_SPEND_RANK = """
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS spend_cents
  FROM orders GROUP BY o_custkey)
SELECT o_custkey, spend_cents,
       CAST(ROW_NUMBER() OVER (ORDER BY spend_cents, o_custkey) - 1
            AS BIGINT) AS spend_rank
FROM spend
"""


def q_cust_profile(sf_dir: str):
    """FULL OUTER customer profile (``ops.joins.full_outer_sum_join``):
    per key, order count + exact spend cents joined with event count +
    exact value micros — keys live in either table; absent sides read 0.
    No pairwise join: both sides pre-combine per batch, one union, ONE
    groupby-sum shuffle."""
    from cutwed_ray.ops.joins import full_outer_sum_join

    od = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.floor(t.column("o_totalprice").to_numpy() * 100 + 0.5
                     ).astype(np.int64)
        return pa.table({"o_custkey": t.column("o_custkey"),
                         "spend_cents": pa.array(c, pa.int64())})

    ev = _read(sf_dir, "events", ["user_id", "value"])

    def micros(t: pa.Table) -> pa.Table:
        m = np.floor(t.column("value").to_numpy() * 1_000_000 + 0.5
                     ).astype(np.int64)
        return pa.table({"user_id": t.column("user_id"),
                         "value_micros": pa.array(m, pa.int64())})

    return full_outer_sum_join(
        od.map_batches(cents, batch_format="pyarrow"),
        ev.map_batches(micros, batch_format="pyarrow"),
        left_key="o_custkey", right_key="user_id", out_key="cust_id",
        left_vals=["spend_cents"], right_vals=["value_micros"],
        left_count="n_orders", right_count="n_events")


SQL_CUST_PROFILE = """
WITH o AS (
  SELECT o_custkey AS cust_id, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS spend_cents
  FROM orders GROUP BY 1),
e AS (
  SELECT user_id AS cust_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT))
              AS BIGINT) AS value_micros
  FROM events GROUP BY 1)
SELECT COALESCE(o.cust_id, e.cust_id) AS cust_id,
       COALESCE(o.n_orders, 0) AS n_orders,
       COALESCE(o.spend_cents, 0) AS spend_cents,
       COALESCE(e.n_events, 0) AS n_events,
       COALESCE(e.value_micros, 0) AS value_micros
FROM o FULL OUTER JOIN e USING (cust_id)
"""


def q_order_ship_90d(sf_dir: str):
    """Cross-table interval join (``ops.joins.range_agg_join`` across two
    DIFFERENT tables): per order, count + exact centi-quantity of its
    lineitems shipped within [o_orderdate, +90 days) — fulfilment-latency
    accounting.  LEFT semantics: unshipped orders emit 0."""
    from cutwed_ray.ops.joins import range_agg_join

    od = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate", "l_quantity"])

    def centi(t: pa.Table) -> pa.Table:
        qc = np.floor(t.column("l_quantity").to_numpy() * 100 + 0.5
                      ).astype(np.int64)
        return (t.drop_columns(["l_quantity"])
                 .append_column("qty_centi", pa.array(qc, pa.int64())))

    out = range_agg_join(
        od, li.map_batches(centi, batch_format="pyarrow"),
        left_key="o_orderkey", left_time="o_orderdate",
        right_key="l_orderkey", right_time="l_shipdate",
        left_cols=["o_orderkey"],
        window_lo=0, window_hi=90 * 86_400_000_000,
        value_col="qty_centi")

    def semantic_names(t: pa.Table) -> pa.Table:
        return t.rename_columns(["o_orderkey", "n_shipped_90d",
                                 "qty_centi_90d"])

    return out.map_batches(semantic_names, batch_format="pyarrow")


SQL_ORDER_SHIP_90D = """
SELECT a.o_orderkey,
       count(b.l_orderkey) AS n_shipped_90d,
       CAST(COALESCE(SUM(CAST(FLOOR(b.l_quantity * 100 + 0.5) AS BIGINT)), 0)
            AS BIGINT) AS qty_centi_90d
FROM orders a
LEFT JOIN lineitem b
  ON b.l_orderkey = a.o_orderkey
 AND b.l_shipdate >= a.o_orderdate
 AND b.l_shipdate < a.o_orderdate + INTERVAL 90 DAY
GROUP BY a.o_orderkey
"""


def q_events_debounced(sf_dir: str):
    """Burst-suppression filter (``ops.window.debounce``): keep each
    user's first event and any event >= 1 hour after the user's previous
    event (LAG formulation — exact epoch-micros gaps, SQL-replicable)."""
    from cutwed_ray.ops.window import debounce

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    return debounce(ev, key="user_id", time="ts", tiebreak="event_id",
                    min_gap=3_600_000_000, cols=["event_id", "user_id"])


SQL_EVENTS_DEBOUNCED = """
WITH lagged AS (
  SELECT event_id, user_id,
         epoch_us(ts) - epoch_us(LAG(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id)) AS gap
  FROM events)
SELECT event_id, user_id
FROM lagged WHERE gap IS NULL OR gap >= 3600000000
"""


def q_events_value_share(sf_dir: str):
    """Ratio-to-report (``ops.agg.grouped_share``): per (event_type,
    user), the exact value-micros sum and its float64 share of the
    type's total — one multi-key groupby of map-side-combined partials;
    the share division is bit-identical to the oracle's (one IEEE op on
    identical exact int64 sums)."""
    from cutwed_ray.ops.agg import grouped_share

    ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def micros(t: pa.Table) -> pa.Table:
        m = np.floor(t.column("value").to_numpy() * 1_000_000 + 0.5
                     ).astype(np.int64)
        return (t.drop_columns(["value"])
                 .append_column("value_micros", pa.array(m, pa.int64())))

    return grouped_share(ev.map_batches(micros, batch_format="pyarrow"),
                         "event_type", "user_id", "value_micros",
                         sum_name="user_value_micros", share_name="share")


SQL_EVENTS_VALUE_SHARE = """
WITH s AS (
  SELECT event_type, user_id,
         CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT))
              AS BIGINT) AS user_value_micros
  FROM events GROUP BY 1, 2),
t AS (
  SELECT event_type, CAST(SUM(user_value_micros) AS BIGINT) AS tm
  FROM s GROUP BY 1)
SELECT s.event_type, s.user_id, s.user_value_micros,
       CAST(s.user_value_micros AS DOUBLE) / CAST(t.tm AS DOUBLE) AS share
FROM s JOIN t USING (event_type)
"""


#: chunking parameters for the long-context preprocessing query
CHUNK_LEN, CHUNK_STRIDE = 512, 384


def q_docs_chunk_stats(sf_dir: str):
    """Sliding-window chunking (``ops.packing.chunk_stats``): docs split
    into 512-token windows every 384 tokens (128-token overlap) — the
    flat-map dual of sequence packing; stateless vectorized expansion,
    no shuffle."""
    from cutwed_ray.ops.packing import chunk_stats
    from cutwed_ray.ops.text import token_count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    light = ds.map_batches(
        lambda t: token_count(t).select(["doc_id", "n_tokens"]),
        batch_format="pyarrow")
    return chunk_stats(light, id_col="doc_id", tokens_col="n_tokens",
                       chunk_len=CHUNK_LEN, stride=CHUNK_STRIDE)


SQL_DOCS_CHUNK_STATS = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN regexp_replace(text, '^\s+|\s+$', '', 'g') = '' THEN 0
              ELSE length(regexp_split_to_array(
                     regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'))
         END AS n_tokens
  FROM documents),
nc AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_tokens > 0
              THEN 1 + CAST((GREATEST(n_tokens - 512, 0) + 383) // 384
                            AS BIGINT)
              ELSE 0 END AS n_chunks
  FROM toks),
ch AS (
  SELECT doc_id, n_tokens, UNNEST(range(n_chunks)) AS cid
  FROM nc)
SELECT doc_id, CAST(cid AS BIGINT) AS chunk_id,
       CAST(LEAST(512, n_tokens - cid * 384) AS BIGINT) AS chunk_tokens
FROM ch
"""


def q_events_contract(sf_dir: str):
    """Data-contract gate (``ops.contract.contract_violations``): one
    streaming pass counts violations of four declared constraints on the
    events table (value >= 0, event_type in dictionary, ts within the
    collection window, props JSON-shaped); map-side-combined partials,
    one tiny groupby."""
    from cutwed_ray.ops.contract import contract_violations

    ev = _read(sf_dir, "events",
               ["ts", "event_type", "value", "props"])
    types = set(EVENT_TYPES)
    lo = np.datetime64("2024-01-01", "us").astype(np.int64)
    hi = np.datetime64("2024-02-01", "us").astype(np.int64)

    # NULL semantics (explicit, matching the oracle's COUNT(*) FILTER:
    # a NULL predicate is NOT a violation — SQL three-valued logic
    # excludes NULL rows from the filtered count; every checker below
    # masks nulls to False before counting.  Pinned by
    # tests/test_packing_pivot_outliers.py::test_contract_null_semantics.
    def value_nonneg(t: pa.Table) -> np.ndarray:
        v = t.column("value")
        bad = v.to_numpy(zero_copy_only=False) < 0   # NaN < 0 is False
        if v.null_count:
            bad &= ~np.asarray(pc.is_null(v).to_numpy(zero_copy_only=False))
        return bad

    def type_in_dict(t: pa.Table) -> np.ndarray:
        s = t.column("event_type").to_pandas()
        return (~s.isin(types) & s.notna()).to_numpy()

    def ts_in_window(t: pa.Table) -> np.ndarray:
        c = t.column("ts")
        ts = c.to_numpy(zero_copy_only=False).astype("datetime64[us]") \
              .astype(np.int64)
        bad = (ts < lo) | (ts >= hi)
        if c.null_count:
            bad &= ~np.asarray(pc.is_null(c).to_numpy(zero_copy_only=False))
        return bad

    def props_json(t: pa.Table) -> np.ndarray:
        p = t.column("props")
        ok = pc.and_kleene(pc.starts_with(p, "{"), pc.ends_with(p, "}"))
        bad = pc.fill_null(pc.invert(ok), False)      # NULL -> no violation
        return bad.to_numpy(zero_copy_only=False).astype(bool)

    return contract_violations(ev, {
        "value_nonneg": value_nonneg,
        "type_in_dict": type_in_dict,
        "ts_in_window": ts_in_window,
        "props_json": props_json,
    })


SQL_EVENTS_CONTRACT = """
SELECT 'props_json' AS constraint_name,
       CAST(COUNT(*) FILTER (WHERE NOT (props LIKE '{%' AND props LIKE '%}'))
            AS BIGINT) AS n_violations,
       CAST(COUNT(*) AS BIGINT) AS n_checked FROM events
UNION ALL
SELECT 'ts_in_window',
       CAST(COUNT(*) FILTER (WHERE NOT (ts >= TIMESTAMP '2024-01-01'
                                        AND ts < TIMESTAMP '2024-02-01'))
            AS BIGINT),
       CAST(COUNT(*) AS BIGINT) FROM events
UNION ALL
SELECT 'type_in_dict',
       CAST(COUNT(*) FILTER (WHERE event_type NOT IN
            ('click', 'error', 'purchase', 'signup', 'view')) AS BIGINT),
       CAST(COUNT(*) AS BIGINT) FROM events
UNION ALL
SELECT 'value_nonneg',
       CAST(COUNT(*) FILTER (WHERE value < 0) AS BIGINT),
       CAST(COUNT(*) AS BIGINT) FROM events
"""


def q_events_schema_migrate(sf_dir: str):
    """Schema migration report (``ops.schema.cast_report``): migrate the
    events table to a declared target schema — user_id int64->int32
    (range-checked downcast), value float64->int64 (exact-integer cast;
    fractional values violate), ts->date32 (civil-day partition key),
    event_type carried — and emit per-column (n_violations, n_ok,
    checksum) counters in one streaming map-side-combined pass.  The
    checksum (sum of cast_value mod 1000003 over OK rows) pins the cast
    OUTPUTS, not just the counts."""
    from cutwed_ray.ops.schema import CastSpec, cast_report

    ev = _read(sf_dir, "events", ["ts", "user_id", "event_type", "value"])
    return cast_report(ev, [
        CastSpec("user_id", "int32"),
        CastSpec("value", "int64_exact"),
        CastSpec("ts", "date", out_col="event_date"),
        CastSpec("event_type", "string"),
    ])


SQL_EVENTS_SCHEMA_MIGRATE = """
SELECT 'event_date' AS column_name,
       CAST(0 AS BIGINT) AS n_violations,
       CAST(COUNT(ts) AS BIGINT) AS n_ok,
       CAST(COALESCE(SUM((((CAST(ts AS DATE) - DATE '1970-01-01') % 1000003)
                          + 1000003) % 1000003), 0) AS BIGINT) AS checksum
FROM events
UNION ALL
SELECT 'event_type',
       CAST(0 AS BIGINT),
       CAST(COUNT(event_type) AS BIGINT),
       CAST(COALESCE(SUM(length(event_type) % 1000003), 0) AS BIGINT)
FROM events
UNION ALL
SELECT 'user_id',
       CAST(COUNT(*) FILTER (WHERE user_id IS NOT NULL
                             AND (user_id < -2147483648 OR user_id > 2147483647))
            AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE user_id BETWEEN -2147483648 AND 2147483647)
            AS BIGINT),
       CAST(COALESCE(SUM(((user_id % 1000003) + 1000003) % 1000003)
                     FILTER (WHERE user_id BETWEEN -2147483648 AND 2147483647),
                     0) AS BIGINT)
FROM events
UNION ALL
SELECT 'value',
       CAST(COUNT(*) FILTER (WHERE value IS NOT NULL
                             AND NOT (isfinite(value) AND value = floor(value)
                                      AND abs(value) <= 9007199254740992.0))
            AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE isfinite(value) AND value = floor(value)
                             AND abs(value) <= 9007199254740992.0) AS BIGINT),
       CAST(COALESCE(SUM(((CAST(value AS BIGINT) % 1000003) + 1000003) % 1000003)
                     FILTER (WHERE isfinite(value) AND value = floor(value)
                             AND abs(value) <= 9007199254740992.0), 0) AS BIGINT)
FROM events
"""


def q_events_value_ntile(sf_dir: str):
    """Per-group ROW_NUMBER + NTILE(4) (``ops.window.grouped_rank_ntile``):
    each event ranked and quartile-binned within its event_type by exact
    value-micros (event_id tiebreak) — the grouped twin of the global
    prefix scan: per-(group, range-bucket) histogram, driver holds
    O(groups x buckets) start ranks, one coarse shuffle, no per-group
    all-to-all sort.  Light projection materialized once (3 executions)."""
    from cutwed_ray.ops.window import grouped_rank_ntile

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def micros(t: pa.Table) -> pa.Table:
        vu = np.floor(t.column("value").to_numpy() * 1e6 + 0.5
                      ).astype(np.int64)
        return pa.table({"event_id": t.column("event_id"),
                         "event_type": t.column("event_type"),
                         "value_u": pa.array(vu, pa.int64())})

    light = ev.map_batches(micros, batch_format="pyarrow").materialize()
    return grouped_rank_ntile(light, group_col="event_type",
                              order_col="value_u", tiebreak="event_id", k=4,
                              cols=["event_id", "event_type", "value_u"])


SQL_EVENTS_VALUE_NTILE = """
WITH vu AS (
  SELECT event_id, event_type,
         CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS value_u
  FROM events)
SELECT event_id, event_type, value_u,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rk,
       CAST(NTILE(4) OVER w AS BIGINT) AS tile
FROM vu
WINDOW w AS (PARTITION BY event_type ORDER BY value_u, event_id)
"""


def q_events_value_quantiles_cont(sf_dir: str):
    """Interpolated per-type quantiles (``ops.agg.grouped_quantiles_cont``):
    the ``quantile_cont`` twin of events_value_quantiles — same
    distributed-histogram shape, float64 outputs BIT-identical to DuckDB
    (identical IEEE interpolation tree over exact int64 histograms, no
    tolerance, no rounding)."""
    from cutwed_ray.ops.agg import grouped_quantiles_cont

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def micros(t: pa.Table) -> pa.Table:
        vu = np.floor(t.column("value").to_numpy() * 1e6 + 0.5
                      ).astype(np.int64)
        return pa.table({"event_type": t.column("event_type"),
                         "value_u": pa.array(vu, pa.int64())})

    return grouped_quantiles_cont(
        ds.map_batches(micros, batch_format="pyarrow"),
        "event_type", "value_u", qs=(0.25, 0.5, 0.75, 0.9, 0.99))


SQL_EVENTS_VALUE_QUANTILES_CONT = """
WITH vu AS (
  SELECT event_type, CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS value_u
  FROM events
)
SELECT event_type, count(*) AS n_rows,
       quantile_cont(value_u, 0.25) AS qc25,
       quantile_cont(value_u, 0.5)  AS qc50,
       quantile_cont(value_u, 0.75) AS qc75,
       quantile_cont(value_u, 0.9)  AS qc90,
       quantile_cont(value_u, 0.99) AS qc99
FROM vu GROUP BY event_type
"""


def q_order_fulfillment(sf_dir: str):
    """Row-level LEFT OUTER join with pre-aggregated right side: EVERY
    order keeps a row — orders with no lineitems (the unmatched left
    rows, present in this data) get COALESCE-0 counts/revenue.  The
    lineitem side is reduced to one row per order key BEFORE the join
    (per-batch partial + one groupby), so the distributed hash join
    moves aggregates, not line items."""
    from ray.data.aggregate import Sum

    from cutwed_ray.stages.cluster import join_partitions

    orders = _read(sf_dir, "orders", ["o_orderkey"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        rev = np.floor(t.column("l_extendedprice").to_numpy()
                       * (1 - t.column("l_discount").to_numpy()) * 100
                       + 0.5).astype(np.int64)
        df = pa.table({"l_orderkey": t.column("l_orderkey"),
                       "rev": pa.array(rev, pa.int64())}).to_pandas()
        g = df.groupby("l_orderkey", as_index=False).agg(
            n_items=("rev", "size"), rev=("rev", "sum"))
        return _pt(g)

    la = (li.map_batches(partial, batch_format="pyarrow")
            .groupby("l_orderkey")
            .aggregate(Sum("n_items", alias_name="n_items"),
                       Sum("rev", alias_name="rev")))

    import pyarrow.parquet as pq
    n_o = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
    parts = max(2, min(join_partitions(), n_o // 50_000 + 1))
    joined = orders.join(la, join_type="left_outer", num_partitions=parts,
                         on=("o_orderkey",), right_on=("l_orderkey",))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pa.array(
                t.column("o_orderkey").to_numpy().astype(np.int64),
                pa.int64()),
            "n_items": pc.coalesce(pc.cast(t.column("n_items"), pa.int64()),
                                   pa.scalar(0, pa.int64())),
            "revenue_cents": pc.coalesce(pc.cast(t.column("rev"), pa.int64()),
                                         pa.scalar(0, pa.int64())),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_ORDER_FULFILLMENT = """
WITH la AS (
  SELECT l_orderkey, count(*) AS n_items,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem GROUP BY 1)
SELECT o.o_orderkey,
       CAST(COALESCE(la.n_items, 0) AS BIGINT) AS n_items,
       CAST(COALESCE(la.rev, 0) AS BIGINT) AS revenue_cents
FROM orders o LEFT JOIN la ON o.o_orderkey = la.l_orderkey
"""


def q_events_retention(sf_dir: str):
    """Hour-over-hour cohort retention (``ops.window.hourly_retention``):
    per hour, distinct active users and how many return the NEXT hour —
    map-side (user, hour) dedup, one coarse user-bucket shuffle, the
    SQL self-join replayed as a vectorized shifted compare.  SQL-oracled
    vs DISTINCT + self-join."""
    from cutwed_ray.ops.window import hourly_retention

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    return hourly_retention(ev, user_col="user_id", ts_col="ts")


SQL_EVENTS_RETENTION = """
WITH uh AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS h FROM events),
act AS (SELECT h, count(*) AS n_active FROM uh GROUP BY 1),
ret AS (SELECT a.h, count(*) AS n_retained
        FROM uh a JOIN uh b USING (user_id)
        WHERE b.h = a.h + 1 GROUP BY 1)
SELECT act.h AS hour_id, CAST(act.n_active AS BIGINT) AS n_active,
       CAST(COALESCE(ret.n_retained, 0) AS BIGINT) AS n_retained
FROM act LEFT JOIN ret ON act.h = ret.h
"""


def q_events_rolling_value(sf_dir: str):
    """Bounded-frame window (``ops.window.rolling_mean``): per user, the
    mean value-micros of the last 3 events (ROWS BETWEEN 2 PRECEDING AND
    CURRENT ROW) — int64 cumsum-difference rolling sum, ONE float64
    division per row, bit-identical to the SQL oracle."""
    from cutwed_ray.ops.window import rolling_mean

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def micros(t: pa.Table) -> pa.Table:
        vu = np.floor(t.column("value").to_numpy() * 1e6 + 0.5
                      ).astype(np.int64)
        return (t.drop_columns(["value"])
                 .append_column("value_u", pa.array(vu, pa.int64())))

    light = ev.map_batches(micros, batch_format="pyarrow")
    return rolling_mean(light, key="user_id", time="ts",
                        tiebreak="event_id", value="value_u", window_rows=3,
                        cols=["event_id", "user_id", "value_u"])


SQL_EVENTS_ROLLING_VALUE = """
WITH vu AS (
  SELECT event_id, user_id, ts,
         CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS value_u
  FROM events)
SELECT event_id, user_id, value_u,
       CAST(SUM(value_u) OVER w AS DOUBLE)
         / CAST(COUNT(*) OVER w AS DOUBLE) AS rolling_mean
FROM vu
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def q_events_user_journey(sf_dir: str):
    """Behavior-sequence extraction (``ops.window.grouped_string_agg``):
    per user, the chronologically-ordered comma-joined event-type path —
    the sequence-model feature every engagement pipeline materializes.
    One coarse key-bucket shuffle of projected light rows; join order
    pinned by (ts, event_id); SQL-oracled vs string_agg ORDER BY."""
    from cutwed_ray.ops.window import grouped_string_agg

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])
    return grouped_string_agg(ev, key="user_id", value="event_type",
                              order_cols=["ts", "event_id"],
                              out_col="type_path")


SQL_EVENTS_USER_JOURNEY = """
SELECT user_id,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS type_path
FROM events GROUP BY user_id
"""


QUERIES = {
    "exact_dedup": q_exact_dedup,
    "exact_cluster": q_exact_cluster,
    "block_counts": q_block_counts,
    "token_counts": q_token_counts,
    "token_counts_bpe": q_token_counts_bpe,
    "text_quality": q_text_quality,
    "repetition_signals": q_repetition_signals,
    "docs_redacted": q_docs_redacted,
    "docs_contamination": q_docs_contamination,
    "docs_tfidf_top3": q_docs_tfidf_top3,
    "lang_doc_stats": q_lang_doc_stats,
    "top_docs_by_chars": q_top_docs_by_chars,
    "lineitem_pricing": q_lineitem_pricing,
    "orders_by_segment": q_orders_by_segment,
    "order_priority_revenue": q_order_priority_revenue,
    "docs_quality_filter": q_docs_quality_filter,
    "orders_topk_per_cust": q_orders_topk_per_cust,
    "event_type_users": q_event_type_users,
    "supplier_region_revenue": q_supplier_region_revenue,
    "events_hourly": q_events_hourly,
    "events_hopping": q_events_hopping,
    "events_type_stats": q_events_type_stats,
    "events_sessions": q_events_sessions,
    "events_asof_order": q_events_asof_order,
    "events_prev_hour": q_events_prev_hour,
    "events_lag_delta": q_events_lag_delta,
    "events_user_cumsum": q_events_user_cumsum,
    "events_value_quantiles": q_events_value_quantiles,
    "top_tokens": q_top_tokens,
    "lang_mode_chars": q_lang_mode_chars,
    "customers_no_orders": q_customers_no_orders,
    "docs_stratified_sample": q_docs_stratified_sample,
    "docs_top_decile_chars": q_docs_top_decile_chars,
    "parts_never_ordered": q_parts_never_ordered,
    "knn_bruteforce": q_knn_bruteforce,
    "ngram_jaccard": q_ngram_jaccard,
    "embedding_near_dup_exact": q_embedding_near_dup_exact,
    "lineitem_corr": q_lineitem_corr,
    "region_nation_rollup": q_region_nation_rollup,
    "events_funnel": q_events_funnel,
    "events_props_stats": q_events_props_stats,
    "docs_pack_stats": q_docs_pack_stats,
    "events_type_pivot": q_events_type_pivot,
    "events_value_outliers": q_events_value_outliers,
    "events_latest_per_user": q_events_latest_per_user,
    "cust_spend_rank": q_cust_spend_rank,
    "cust_profile": q_cust_profile,
    "order_ship_90d": q_order_ship_90d,
    "events_debounced": q_events_debounced,
    "events_value_share": q_events_value_share,
    "docs_chunk_stats": q_docs_chunk_stats,
    "events_contract": q_events_contract,
    "events_schema_migrate": q_events_schema_migrate,
    "events_value_ntile": q_events_value_ntile,
    "events_value_quantiles_cont": q_events_value_quantiles_cont,
    "order_fulfillment": q_order_fulfillment,
    "events_retention": q_events_retention,
    "events_rolling_value": q_events_rolling_value,
    "events_user_journey": q_events_user_journey,
    # rows-only (non-SQL-expressible):
    "minhash_near_dup": q_minhash_near_dup,
    "minhash_dup_clusters": q_minhash_dup_clusters,
    "simhash_near_dup": q_simhash_near_dup,
    "embedding_near_dup": q_embedding_near_dup,
    "langid": q_langid,
    "fingerprint": q_fingerprint,
    "knn_lsh": q_knn_lsh,
    "knn_ivf": q_knn_ivf,
    "embedding_kmeans": q_embedding_kmeans,
    "approx_user_counts": q_approx_user_counts,
    "docs_split_counts": q_docs_split_counts,
    "twed_pairs_documents": q_twed_pairs_documents,
    "twed_topk_neighbors": q_twed_topk_neighbors,
    "er_clusters_documents": q_er_clusters_documents,
    "link_documents": q_link_documents,
    "media_features": q_media_features,
    "media_image_real": q_media_image_real,
    "media_audio_energy": q_media_audio_energy,
    "embedding_pca2": q_embedding_pca2,
    "approx_token_freq": q_approx_token_freq,
}

#: pinned-fixture oracles (see scripts/gen_fixtures.py): valid ONLY for the
#: sf0.01 tables the driver compares at.  Every query listed here is a
#: DETERMINISTIC function of the input — independent of parallelism, block
#: boundaries, and scheduling (candidate/bucket keys are content-hashes,
#: merges use full tie-break sorts, k-means samples are order-pinned
#: prefixes, TWED is per-pair exact arithmetic).  tests/test_fixture_oracles.py
#: recomputes each one against the live sf0.01 testdata on every run, so
#: drift fails CI before it fails the driver's hash gate.  Values are the
#: canonical sort keys used to freeze the parquet stably.
FIXTURE_ORACLES: dict[str, list[str]] = {
    "langid": ["doc_id"],
    "fingerprint": ["doc_id"],
    "minhash_near_dup": ["id_a", "id_b"],
    "minhash_dup_clusters": ["doc_id"],
    "simhash_near_dup": ["id_a", "id_b"],
    "embedding_near_dup": ["id_a", "id_b"],
    "knn_lsh": ["query_id", "rank"],
    "knn_ivf": ["query_id", "rank"],
    "embedding_kmeans": ["vec_id"],
    "approx_user_counts": ["event_type"],
    "docs_split_counts": ["lang", "split"],
    "twed_pairs_documents": ["id_a", "id_b"],
    "twed_topk_neighbors": ["row_id", "rank"],
    "er_clusters_documents": ["path"],
    "link_documents": ["id_a", "id_b"],
    "media_features": ["media_id"],
    "media_image_real": ["media_id"],
    "media_audio_energy": ["media_id", "window_id"],
    "embedding_pca2": ["vec_id"],
    "approx_token_freq": ["token"],
}
_FIXTURE_DIR = "/root/repo/fixtures"


def fixture_sql(name: str) -> str:
    return f"SELECT * FROM read_parquet('{_FIXTURE_DIR}/{name}_sf0.01.parquet')"


SQL_LANGID_FIXTURE = fixture_sql("langid")
SQL_FINGERPRINT_FIXTURE = fixture_sql("fingerprint")

ORACLE = {
    "exact_dedup": SQL_EXACT_DEDUP,
    "exact_cluster": SQL_EXACT_CLUSTER,
    "block_counts": SQL_BLOCK_COUNTS,
    "token_counts": SQL_TOKEN_COUNTS,
    "token_counts_bpe": SQL_TOKEN_COUNTS_BPE,
    "text_quality": SQL_TEXT_QUALITY,
    "repetition_signals": SQL_REPETITION_SIGNALS,
    "docs_redacted": SQL_DOCS_REDACTED,
    "docs_contamination": SQL_DOCS_CONTAMINATION,
    "docs_tfidf_top3": SQL_DOCS_TFIDF_TOP3,
    "lang_doc_stats": SQL_LANG_DOC_STATS,
    "top_docs_by_chars": SQL_TOP_DOCS,
    "lineitem_pricing": SQL_LINEITEM_PRICING,
    "orders_by_segment": SQL_ORDERS_BY_SEGMENT,
    "order_priority_revenue": SQL_ORDER_PRIORITY_REVENUE,
    "docs_quality_filter": SQL_DOCS_QUALITY_FILTER,
    "orders_topk_per_cust": SQL_ORDERS_TOPK,
    "event_type_users": SQL_EVENT_TYPE_USERS,
    "supplier_region_revenue": SQL_SUPPLIER_REGION_REVENUE,
    "events_hourly": SQL_EVENTS_HOURLY,
    "events_hopping": SQL_EVENTS_HOPPING,
    "events_type_stats": SQL_EVENTS_TYPE_STATS,
    "events_sessions": SQL_EVENTS_SESSIONS,
    "events_asof_order": SQL_EVENTS_ASOF_ORDER,
    "events_prev_hour": SQL_EVENTS_PREV_HOUR,
    "events_lag_delta": SQL_EVENTS_LAG_DELTA,
    "events_user_cumsum": SQL_EVENTS_USER_CUMSUM,
    "events_value_quantiles": SQL_EVENTS_VALUE_QUANTILES,
    "top_tokens": SQL_TOP_TOKENS,
    "lang_mode_chars": SQL_LANG_MODE_CHARS,
    "customers_no_orders": SQL_CUSTOMERS_NO_ORDERS,
    "docs_stratified_sample": SQL_DOCS_STRATIFIED_SAMPLE,
    "docs_top_decile_chars": SQL_DOCS_TOP_DECILE_CHARS,
    "parts_never_ordered": SQL_PARTS_NEVER_ORDERED,
    "knn_bruteforce": SQL_KNN_BRUTEFORCE,
    "ngram_jaccard": SQL_NGRAM_JACCARD,
    "embedding_near_dup_exact": SQL_EMBEDDING_NEAR_DUP_EXACT,
    "lineitem_corr": SQL_LINEITEM_CORR,
    "region_nation_rollup": SQL_REGION_NATION_ROLLUP,
    "events_funnel": SQL_EVENTS_FUNNEL,
    "events_props_stats": SQL_EVENTS_PROPS_STATS,
    "docs_pack_stats": SQL_DOCS_PACK_STATS,
    "events_type_pivot": SQL_EVENTS_TYPE_PIVOT,
    "events_value_outliers": SQL_EVENTS_VALUE_OUTLIERS,
    "events_latest_per_user": SQL_EVENTS_LATEST_PER_USER,
    "cust_spend_rank": SQL_CUST_SPEND_RANK,
    "cust_profile": SQL_CUST_PROFILE,
    "order_ship_90d": SQL_ORDER_SHIP_90D,
    "events_debounced": SQL_EVENTS_DEBOUNCED,
    "events_value_share": SQL_EVENTS_VALUE_SHARE,
    "docs_chunk_stats": SQL_DOCS_CHUNK_STATS,
    "events_contract": SQL_EVENTS_CONTRACT,
    "events_schema_migrate": SQL_EVENTS_SCHEMA_MIGRATE,
    "events_value_ntile": SQL_EVENTS_VALUE_NTILE,
    "events_value_quantiles_cont": SQL_EVENTS_VALUE_QUANTILES_CONT,
    "order_fulfillment": SQL_ORDER_FULFILLMENT,
    "events_retention": SQL_EVENTS_RETENTION,
    "events_rolling_value": SQL_EVENTS_ROLLING_VALUE,
    "events_user_journey": SQL_EVENTS_USER_JOURNEY,
}

# Deterministic but not ANSI-SQL-expressible queries (custom 64-bit token
# hashing, TWED scoring, LSH banding, seeded k-means): their oracle is a
# PINNED FIXTURE frozen by scripts/gen_fixtures.py from /root/testdata/
# sf0.01 — the comparison verifies determinism + no-regression, and
# tests/test_fixture_oracles.py recomputes each on every test run so
# drift fails CI first.
ORACLE.update({name: fixture_sql(name) for name in FIXTURE_ORACLES})
