"""Unit tests: regex_redact (sequential semantics) and decontaminate
(brute-force shingle-set cross-check, block-layout invariance)."""

import numpy as np
import pyarrow as pa
import pytest


def test_regex_redact_sequential_counts():
    from cutwed_ray.ops.text import regex_redact

    t = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["customer key value row", "no match here value", ""],
    })
    out = regex_redact(t, [(r"\bcustomer\b", "<NAME>"),
                           (r"\b(?:key|value)\b", "<ID>")])
    assert out.column("text_clean").to_pylist() == [
        "<NAME> <ID> <ID> row", "no match here <ID>", ""]
    assert out.column("n_redactions").to_pylist() == [3, 1, 0]
    assert out.schema.field("n_redactions").type == pa.int64()


def test_regex_redact_second_rule_sees_first_rules_output():
    from cutwed_ray.ops.text import regex_redact

    # rule 1 rewrites 'a b' -> 'b'; rule 2 then matches the NEW 'b b'
    t = pa.table({"text": ["a b b"]})
    out = regex_redact(t, [("a b", "b"), ("b b", "X")])
    assert out.column("text_clean").to_pylist() == ["X"]
    assert out.column("n_redactions").to_pylist() == [2]


def _brute_shingles(text: str, k: int = 3):
    toks = text.split()
    if len(toks) >= k:
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}
    return {" ".join(sorted(toks))}


def test_decontaminate_matches_brute_force(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.decontam import decontaminate

    rng = np.random.default_rng(7)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    docs = [" ".join(rng.choice(vocab, rng.integers(1, 12)))
            for _ in range(120)]
    bench_texts, corpus_texts = docs[:20], docs[20:]
    bench = rd.from_arrow(pa.table({
        "doc_id": list(range(20)), "text": bench_texts}))
    corpus = rd.from_arrow(pa.table({
        "doc_id": list(range(20, 120)), "text": corpus_texts})).repartition(5)

    out = decontaminate(corpus, bench, k=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    bench_grams = set().union(*(_brute_shingles(t) for t in bench_texts))
    for i, text in enumerate(corpus_texts):
        grams = _brute_shingles(text)
        row = out.iloc[i]
        assert row["doc_id"] == 20 + i
        assert row["n_grams"] == len(grams)
        assert row["n_contaminated_grams"] == len(grams & bench_grams)
        assert row["contaminated"] == int(len(grams & bench_grams) >= 1)


def test_decontaminate_empty_benchmark(ray_session):
    import ray.data as rd

    from cutwed_ray.ops.decontam import decontaminate

    corpus = rd.from_arrow(pa.table({
        "doc_id": [1, 2], "text": ["x y z", "p q"]}))
    bench = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}))
    out = decontaminate(corpus, bench).to_pandas()
    assert (out["contaminated"] == 0).all()
    assert (out["n_contaminated_grams"] == 0).all()


def test_tfidf_topk_matches_brute_force(ray_session):
    import math

    import ray.data as rd

    from cutwed_ray.ops.text import tfidf_topk

    rng = np.random.default_rng(11)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    docs = [" ".join(rng.choice(vocab, rng.integers(0, 15)))
            for _ in range(80)]
    t = pa.table({"doc_id": list(range(80)), "text": docs})
    out = tfidf_topk(rd.from_arrow(t).repartition(4), k=2).to_pandas() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)

    n_docs = len(docs)
    df = {}
    for d in docs:
        for wrd in set(d.split()):
            df[wrd] = df.get(wrd, 0) + 1
    expected = []
    for i, d in enumerate(docs):
        toks = d.split()
        tf = {}
        for wrd in toks:
            tf[wrd] = tf.get(wrd, 0) + 1
        scored = sorted(
            ((round(c * math.log(n_docs / df[wrd]), 6), wrd)
             for wrd, c in tf.items()),
            key=lambda p: (-p[0], p[1]))
        for r, (s, wrd) in enumerate(scored[:2], 1):
            expected.append((i, wrd, s, r))
    got = list(out.itertuples(index=False, name=None))
    assert got == expected
