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
