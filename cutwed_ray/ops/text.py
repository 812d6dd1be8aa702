"""Text-analysis operators for large-scale training-data pipelines.

All stateless, vectorized ``map_batches(batch_format="pyarrow")`` stages:
token counting (whitespace, on flat Arrow buffers), quality scoring
(length / punctuation / uppercase / stopword ratios), heuristic
language-ID (stopword + character n-gram scoring), and winnowing document
fingerprints (rolling-hash k-gram minima).  Deterministic — no models.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cutwed_ray.stages.hashing import splitmix64
from cutwed_ray.stages.tokenize import tokenize_content

# small deterministic stopword lists per language (used by both quality
# scoring and the language-ID heuristic)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "was"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "de", "que", "y", "los", "una", "por", "con", "para"],
}


def _doc_bounds(content) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flat byte view + per-doc offsets of an Arrow string column."""
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    bufs = content.buffers()
    off_dtype = np.int64 if pa.types.is_large_string(content.type) else np.int32
    off = np.frombuffer(bufs[1], dtype=off_dtype)[
        content.offset: content.offset + len(content) + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    view = data[off[0]: off[-1]]
    return view, off[:-1] - off[0], off[1:] - off[0]


def _count_in_class(view, starts, ends, mask: np.ndarray) -> np.ndarray:
    """Per-doc count of bytes whose class-mask is True (vectorized prefix sums)."""
    S = np.zeros(view.shape[0] + 1, dtype=np.int64)
    np.cumsum(mask[view], out=S[1:])
    return S[ends] - S[starts]


_PUNCT = np.zeros(256, dtype=bool)
for ch in b".,;:!?'\"()[]{}<>-_=+*/\\|@#$%^&~`":
    _PUNCT[ch] = True
_UPPER = np.zeros(256, dtype=bool)
_UPPER[ord("A"): ord("Z") + 1] = True
_DIGIT = np.zeros(256, dtype=bool)
_DIGIT[ord("0"): ord("9") + 1] = True


def token_count(batch: pa.Table, text_col: str = "text",
                out_col: str = "n_tokens") -> pa.Table:
    """Append whitespace-token counts (flat-buffer vectorized)."""
    _, offsets = tokenize_content(batch.column(text_col), max_tokens=1 << 31 - 1)
    return batch.append_column(out_col, pa.array(offsets[1:] - offsets[:-1], pa.int64()))


def text_quality(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append deterministic quality features:

    n_chars_c int64, n_tokens int64, punct_ratio/upper_ratio/digit_ratio
    float64 (of characters; 0 for empty docs), mean_token_len float64.
    """
    view, starts, ends = _doc_bounds(batch.column(text_col))
    n_chars = ends - starts
    th, offsets = tokenize_content(batch.column(text_col), max_tokens=1 << 31 - 1)
    n_tok = offsets[1:] - offsets[:-1]
    denom = np.maximum(n_chars, 1).astype(np.float64)
    punct = _count_in_class(view, starts, ends, _PUNCT) / denom
    upper = _count_in_class(view, starts, ends, _UPPER) / denom
    digit = _count_in_class(view, starts, ends, _DIGIT) / denom
    ws = _count_in_class(view, starts, ends,
                         np.isin(np.arange(256), [9, 10, 11, 12, 13, 32]))
    mean_tok = (n_chars - ws) / np.maximum(n_tok, 1).astype(np.float64)

    out = batch.append_column("n_chars_c", pa.array(n_chars, pa.int64()))
    out = out.append_column("n_tokens", pa.array(n_tok, pa.int64()))
    out = out.append_column("punct_ratio", pa.array(punct, pa.float64()))
    out = out.append_column("upper_ratio", pa.array(upper, pa.float64()))
    out = out.append_column("digit_ratio", pa.array(digit, pa.float64()))
    out = out.append_column("mean_token_len", pa.array(mean_tok, pa.float64()))
    return out


class LangIdStage:
    """Heuristic language-ID over stopword hit-rates (actor-pool friendly:
    the token-hash lookup tables are built once in __init__).

    Appends ``lang_pred: string`` ('en'/'de'/'fr'/'es'/'und') and
    ``lang_score: float64`` (stopword hit ratio of the winner).
    Deterministic; a stand-in for a fasttext-style model (which would load
    in __init__ exactly the same way).
    """

    def __init__(self):
        from cutwed_ray.stages.hashing import hash_flat_strings

        self.tables = {}
        for lang, words in STOPWORDS.items():
            data = "".join(words).encode()
            lens = np.array([len(w) for w in words], dtype=np.int64)
            ends = np.cumsum(lens)
            starts = ends - lens
            # sorted array, not a set: token lookups are a vectorized
            # searchsorted instead of per-token Python hashing
            self.tables[lang] = np.sort(
                hash_flat_strings(np.frombuffer(data, np.uint8), starts, ends))

    def __call__(self, batch: pa.Table) -> pa.Table:
        # lowercase first so stopword hashes match
        lowered = pc.utf8_lower(batch.column("text"))
        th, offsets = tokenize_content(lowered, max_tokens=1 << 20)
        n_tok = np.maximum(offsets[1:] - offsets[:-1], 1).astype(np.float64)
        langs = sorted(self.tables)
        scores = np.zeros((len(langs), len(batch)))
        for li, lang in enumerate(langs):
            tab = self.tables[lang]
            pos = np.minimum(np.searchsorted(tab, th), tab.size - 1)
            hits = tab[pos] == th
            S = np.zeros(th.shape[0] + 1, dtype=np.int64)
            np.cumsum(hits, out=S[1:])
            scores[li] = (S[offsets[1:]] - S[offsets[:-1]]) / n_tok
        best = scores.argmax(axis=0)
        best_score = scores.max(axis=0)
        pred = np.where(best_score > 0.02, np.array(langs)[best], "und")
        out = batch.append_column("lang_pred", pa.array(pred.tolist(), pa.string()))
        return out.append_column("lang_score", pa.array(best_score, pa.float64()))


def repetition_signals(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1),
    all-integer so the DuckDB oracle is exact:

    ``n_words`` int64 (whitespace tokens), ``n_bigrams`` int64
    (max(n_words-1, 0)), ``n_distinct_bigrams`` int64 (exact distinct
    count of adjacent word pairs), ``top_word_count`` int64 (occurrences
    of the most frequent word; 0 for empty docs).  Downstream filters
    derive ratios (dup-bigram fraction, top-word fraction) from these.

    One flat-buffer tokenize + two lexsorts per batch — no per-row
    Python.  Distinctness is computed on 64-bit token hashes (the same
    assumption the minhash/ngram ops make): two *different* words
    colliding inside one document would be needed to miscount.
    """
    th, offsets = tokenize_content(batch.column(text_col), max_tokens=1 << 31 - 1)
    n_docs = len(batch)
    n_words = (offsets[1:] - offsets[:-1]).astype(np.int64)
    n_bigrams = np.maximum(n_words - 1, 0)
    n_distinct = np.zeros(n_docs, dtype=np.int64)
    top = np.zeros(n_docs, dtype=np.int64)

    if th.shape[0]:
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_words)

        # distinct adjacent pairs per doc: lexsort (doc, h1, h2) then count
        # run boundaries — the pair stays 128-bit (two sort keys), no fold
        same = doc_idx[1:] == doc_idx[:-1]
        if same.any():
            g_doc = doc_idx[:-1][same]
            h1, h2 = th[:-1][same], th[1:][same]
            order = np.lexsort((h2, h1, g_doc))
            d, a, b = g_doc[order], h1[order], h2[order]
            new = np.empty(d.size, dtype=bool)
            new[0] = True
            np.logical_or(d[1:] != d[:-1], a[1:] != a[:-1], out=new[1:])
            np.logical_or(new[1:], b[1:] != b[:-1], out=new[1:])
            n_distinct += np.bincount(d[new], minlength=n_docs).astype(np.int64)

        # top word count per doc: run lengths of (doc, hash), segmented max
        order2 = np.lexsort((th, doc_idx))
        d2, t2 = doc_idx[order2], th[order2]
        run_b = np.flatnonzero(
            np.r_[True, (d2[1:] != d2[:-1]) | (t2[1:] != t2[:-1])])
        run_len = np.diff(np.r_[run_b, d2.size])
        run_doc = d2[run_b]
        doc_b = np.flatnonzero(np.r_[True, run_doc[1:] != run_doc[:-1]])
        top[run_doc[doc_b]] = np.maximum.reduceat(run_len, doc_b)

    out = batch.append_column("n_words", pa.array(n_words, pa.int64()))
    out = out.append_column("n_bigrams", pa.array(n_bigrams, pa.int64()))
    out = out.append_column("n_distinct_bigrams", pa.array(n_distinct, pa.int64()))
    return out.append_column("top_word_count", pa.array(top, pa.int64()))


def fingerprint(batch: pa.Table, text_col: str = "text", k: int = 5,
                window: int = 8) -> pa.Table:
    """Winnowing document fingerprint (Schleimer et al. 2003 style):
    k-token rolling hashes, minimum per sliding window, xor-folded into one
    ``fingerprint: int64`` per doc (deterministic near-dup-stable digest)."""
    from cutwed_ray.stages.hashing import shingle_hashes

    from cutwed_ray.stages.hashing import _ranges

    th, offsets = tokenize_content(batch.column(text_col), max_tokens=1 << 20)
    sh, sh_off = shingle_hashes(th, offsets, k)
    n_docs = len(batch)
    fps = np.zeros(n_docs, dtype=np.uint64)
    L = sh_off[1:] - sh_off[:-1]          # >= 1 per doc (fallback shingle)
    if sh.shape[0] == 0 or n_docs == 0:
        return batch.append_column(
            "fingerprint", pa.array(fps.view(np.int64), pa.int64()))

    # window minima for ALL docs in one pass: a global sliding-window min
    # over the flat shingle buffer, each doc selecting only its in-bounds
    # window positions; docs shorter than the window take their segment min
    # via one reduceat over doc starts.  No per-document Python.
    docs_parts, vals_parts = [], []
    long_mask = L > window
    if long_mask.any():
        SW = np.lib.stride_tricks.sliding_window_view(sh, window).min(axis=1)
        counts = (L - window + 1)[long_mask]
        idx = _ranges(sh_off[:-1][long_mask], counts)
        vals_parts.append(SW[idx])
        docs_parts.append(np.repeat(np.flatnonzero(long_mask), counts))
    short_mask = ~long_mask               # 1 <= L <= window: one min each
    if short_mask.any():
        seg_min = np.minimum.reduceat(sh, sh_off[:-1])   # per-doc total min
        vals_parts.append(seg_min[short_mask])
        docs_parts.append(np.flatnonzero(short_mask))
    docs = np.concatenate(docs_parts)
    vals = np.concatenate(vals_parts)

    # per-doc XOR of UNIQUE window minima: sort by (doc, value), drop
    # repeats, xor-reduce each doc's run
    order = np.lexsort((vals, docs))
    d_s, v_s = docs[order], vals[order]
    keep = np.ones(d_s.size, dtype=bool)
    keep[1:] = (d_s[1:] != d_s[:-1]) | (v_s[1:] != v_s[:-1])
    du, vu = d_s[keep], v_s[keep]
    run_starts = np.flatnonzero(np.r_[True, du[1:] != du[:-1]])
    acc = np.bitwise_xor.reduceat(vu, run_starts)
    fps[du[run_starts]] = splitmix64(acc)
    return batch.append_column("fingerprint", pa.array(fps.view(np.int64), pa.int64()))


def regex_redact(batch: pa.Table, rules, text_col: str = "text",
                 out_col: str = "text_clean") -> pa.Table:
    """Sequential vectorized regex redaction (the PII-scrub primitive).

    ``rules`` is an ordered list of ``(pattern, replacement)`` pairs; each
    pattern runs against the output of the previous rule with exactly one
    RE2 kernel pair per rule (``count_substring_regex`` +
    ``replace_substring_regex``) — no Python loop over rows, zero-copy in
    from the Arrow batch.  Appends ``out_col`` (the redacted text) and
    ``n_redactions`` (int64, total non-overlapping matches across rules,
    counted on the text each rule actually saw — i.e. sequential
    semantics, replayable in SQL as nested regexp_replace).

    Patterns must be RE2-compatible: Arrow's regex kernels and DuckDB both
    run RE2, so a DuckDB oracle replays the same rules exactly.  Scale:
    stateless map_batches stage, patterns are compiled once per process by
    Arrow's kernel cache; streams at any corpus size.
    """
    txt = batch.column(text_col)
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    total = np.zeros(len(batch), dtype=np.int64)
    for pat, repl in rules:
        total += pc.count_substring_regex(txt, pat).to_numpy().astype(np.int64)
        txt = pc.replace_substring_regex(txt, pattern=pat, replacement=repl)
    cols = {name: batch.column(name) for name in batch.column_names}
    cols[out_col] = txt
    cols["n_redactions"] = pa.array(total, pa.int64())
    return pa.table(cols)


def _doc_word_tf(batch: pa.Table, text_col: str, id_col: str):
    """Per-(doc, word) term frequencies of a batch, fully vectorized.

    Returns (doc_ids_per_pair, word_codes_per_pair, tf_per_pair, vocab)
    where word codes index into the batch-local ``vocab`` string array.
    Tokenization matches the repo's SQL convention (trim + split on
    whitespace runs): Arrow's split_whitespace emits empty tokens at
    string boundaries, which are masked out.
    """
    txt = batch.column(text_col)
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    lists = pc.utf8_split_whitespace(txt)
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy().astype(np.int64)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary
    parent, codes = parent[keep], codes[keep]

    # tf per (doc, code): one lexsort + run-length pass
    order = np.lexsort((codes, parent))
    d_s, c_s = parent[order], codes[order]
    starts = np.ones(d_s.size, dtype=bool)
    starts[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
    run_starts = np.flatnonzero(starts)
    tf = np.diff(np.append(run_starts, d_s.size)).astype(np.int64)
    doc_idx = d_s[run_starts]
    ids = batch.column(id_col).to_numpy().astype(np.int64)
    return ids[doc_idx], c_s[run_starts], tf, vocab


def doc_freq(ds, text_col: str = "text", id_col: str = "doc_id",
             include_doc_count: bool = False):
    """Global document frequency per word: distinct-doc count, computed as
    per-batch (word, partial df) partial aggregates + one tiny
    ``groupby(word).sum`` shuffle (vocabulary-sized, not corpus-sized).

    ``include_doc_count=True`` rides a constant-key Count partial on the
    SAME shuffle: each batch also emits a sentinel row ``word=""`` whose
    df is the batch's row count ("" cannot collide — whitespace
    tokenization yields only non-empty words).  Callers that need the
    corpus doc count (tfidf) strip the sentinel instead of paying a
    separate full ``ds.count()`` scan.
    """
    def partial(t: pa.Table) -> pa.Table:
        _, codes, _, vocab = _doc_word_tf(t, text_col, id_col)
        cnt = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
        nz = np.flatnonzero(cnt)
        words = vocab.take(pa.array(nz))
        dfp = cnt[nz]
        if include_doc_count:
            words = pa.concat_arrays([pa.array([""], pa.string()),
                                      words.cast(pa.string())])
            dfp = np.r_[np.int64(t.num_rows), dfp]
        return pa.table({"word": words,
                         "df_part": pa.array(dfp, pa.int64())})

    from ray.data.aggregate import Sum

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("word").aggregate(Sum("df_part", alias_name="df")))


def tfidf_topk(ds, k: int = 3, text_col: str = "text",
               id_col: str = "doc_id", decimals: int = 6):
    """Top-k distinctive words per document by TF-IDF.

    The canonical global-statistic broadcast pattern: the document
    frequency table (VOCABULARY-sized — the documented small side) and
    the corpus doc count are computed first, the DF table is collected
    and ``ray.put`` once, then every corpus batch scores its (doc, word)
    pairs vectorized — ``pc.index_in`` maps batch-local dictionary codes
    into the broadcast vocab, ``tf * ln(N / df)`` in float64, and an
    integer lexsort (doc, rounded score desc, lexical word rank) ranks
    without any per-doc Python.  Scores are rounded to ``decimals`` on
    BOTH the output and the ranking key so mathematically-equal products
    (e.g. ``2*ln(x)`` vs ``ln(x^2)``) tie deterministically and break by
    word — replayable in SQL as ``row_number() OVER (ORDER BY
    round(tfidf, d) DESC, word)``.

    Output: (id_col, word, tfidf float64, rank int64 1..k).  Docs with no
    tokens emit no rows (matches ``unnest`` of an empty list).
    """
    import ray

    # ONE statistics execution: the corpus doc count rides the doc_freq
    # shuffle as a constant-key sentinel ("" word) instead of a separate
    # full ds.count() scan — two executions total (stats + scoring), not
    # three.
    df_tab = doc_freq(ds.select_columns([id_col, text_col]),
                      text_col=text_col, id_col=id_col,
                      include_doc_count=True)
    parts = [b for b in df_tab.iter_batches(batch_format="pyarrow",
                                            batch_size=None)]
    df_all = pa.concat_tables(parts) if parts else pa.table(
        {"word": pa.array([], pa.string()), "df": pa.array([], pa.int64())})
    sentinel = pc.equal(df_all.column("word"), "")
    n_docs = int(pc.sum(pc.if_else(sentinel, df_all.column("df"),
                                   pa.scalar(0, pa.int64()))).as_py() or 0)
    df_all = df_all.filter(pc.invert(sentinel))
    # sort the vocab lexically once: word RANK then equals byte order,
    # giving an integer tie-break identical to SQL's binary collation
    sort_idx = pc.sort_indices(df_all.column("word"))
    vocab_sorted = df_all.column("word").take(sort_idx)
    if isinstance(vocab_sorted, pa.ChunkedArray):
        vocab_sorted = vocab_sorted.combine_chunks()
    df_sorted = df_all.column("df").take(sort_idx).to_numpy().astype(np.float64)
    store_ref = ray.put((vocab_sorted, df_sorted))

    def score(t: pa.Table) -> pa.Table:
        vocab_g, df_g = ray.get(store_ref)
        ids, codes, tf, vocab_b = _doc_word_tf(t, text_col, id_col)
        pos = pc.index_in(vocab_b, value_set=vocab_g) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
        wrank = pos[codes]                      # global lexical word rank
        idf = np.log(np.float64(n_docs) / df_g[wrank])
        s = np.round(tf.astype(np.float64) * idf, decimals)
        order = np.lexsort((wrank, -s, ids))
        ids_s, wrank_s, s_s = ids[order], wrank[order], s[order]
        starts = np.ones(ids_s.size, dtype=bool)
        starts[1:] = ids_s[1:] != ids_s[:-1]
        run_id = np.cumsum(starts) - 1
        first_of_run = np.flatnonzero(starts)
        rank = np.arange(ids_s.size, dtype=np.int64) - first_of_run[run_id] + 1
        m = rank <= k
        return pa.table({
            id_col: pa.array(ids_s[m], pa.int64()),
            "word": vocab_g.take(pa.array(wrank_s[m])),
            "tfidf": pa.array(s_s[m], pa.float64()),
            "rank": pa.array(rank[m], pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def json_int_field(batch: pa.Table, field: str, col: str = "props",
                   out_col: str | None = None) -> pa.Table:
    """Extract an integer field from a flat-JSON string column — the ELT
    "schema-on-read" primitive for semi-structured event payloads.

    Stateless vectorized stage: ONE compiled RE2 ``extract_regex`` kernel
    per batch (Arrow caches the program), no Python row loop, no JSON
    parser allocation per row.  Handles ``"field": <int>`` with arbitrary
    whitespace; rows without the field (or non-integer values) yield null.
    For nested / typed payloads at scale the same shape holds with an
    actor-pool stage owning a real parser — this RE2 path is the fast lane
    for the overwhelmingly common flat case.
    """
    pat = r'"' + field + r'"\s*:\s*(?P<v>-?\d+)'
    ex = pc.extract_regex(batch.column(col), pattern=pat)
    v = pc.cast(pc.struct_field(ex, "v"), pa.int64())
    return batch.append_column(out_col or field, v)
