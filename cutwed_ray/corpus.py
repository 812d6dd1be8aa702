"""Deterministic synthetic source-code corpus generator (FIXTURES.md F1/F2).

Produces the Parquet input table of BASELINE.json's ``input_hint``
(repo:string, path:string, commit:string, lang:string, content:string) with
planted duplicate clusters, plus a ground-truth table (repo, path,
entity_id) for pairwise-F1 evaluation.  Everything is seeded — no external
data.  This plays the role of the reference's seeded synthetic generators
(/root/reference/tests/test_basic.py:15-27,
/root/reference/reference_implementation/generate_ref_input.py:9-54)
adapted to code-like token streams.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["python", "javascript", "java", "go", "c", "rust"]
_EXT = {"python": "py", "javascript": "js", "java": "java", "go": "go", "c": "c", "rust": "rs"}

# Zipfian language weights — skewed on purpose to exercise salting.
_LANG_W = np.array([1.0, 1 / 2, 1 / 3, 1 / 4, 1 / 5, 1 / 6])
_LANG_P = _LANG_W / _LANG_W.sum()

_KEYWORDS = [
    "def", "return", "if", "else", "for", "while", "import", "class", "fn",
    "let", "var", "const", "func", "struct", "impl", "pub", "static", "void",
    "int", "float", "str", "self", "this", "new", "try", "except", "catch",
]


def _zipf_probs(v: int, s: float = 1.1) -> np.ndarray:
    p = 1.0 / np.arange(1, v + 1) ** s
    return p / p.sum()


def generate_corpus(
    n_files: int,
    seed: int = 42,
    vocab_size: int = 4096,
    mean_log_len: float = 4.8,
    sigma_log_len: float = 0.6,
    min_len: int = 16,
    max_len: int = 1024,
    singleton_frac: float = 0.55,
    max_cluster: int = 6,
    max_edits: int = 6,
    path_prefix: str = "",
) -> tuple[pa.Table, pa.Table]:
    """Return (files, truth) Arrow tables.

    files: repo, path, commit, lang, content       (input_hint schema)
    truth: repo, path, entity_id, n_edits          (ground truth for F1)

    Cluster sizes: ``singleton_frac`` of entities are singletons; the rest
    uniformly 2..max_cluster copies.  Copy i of an entity applies
    ``i`` + Uniform{0..max_edits} token edits (insert/delete/substitute) to
    the base token stream, so distances grow with copy index while staying
    far below random-pair distances.
    """
    rng = np.random.default_rng(seed)
    vocab = np.array(
        _KEYWORDS + [f"v{i:x}" for i in range(vocab_size - len(_KEYWORDS))]
    )
    vprobs = _zipf_probs(len(vocab))

    # ---- entities until we reach n_files files ----
    repos, paths, commits, langs, contents = [], [], [], [], []
    t_entity, t_edits = [], []
    file_idx = 0
    entity_id = 0
    while file_idx < n_files:
        lang = LANGS[int(rng.choice(6, p=_LANG_P))]
        L = int(np.clip(np.exp(rng.normal(mean_log_len, sigma_log_len)), min_len, max_len))
        base = rng.choice(len(vocab), size=L, p=vprobs)
        if rng.random() < singleton_frac:
            copies = 1
        else:
            copies = int(rng.integers(2, max_cluster + 1))
        copies = min(copies, n_files - file_idx)
        for c in range(copies):
            toks = base
            n_ed = 0
            if c > 0:
                n_ed = int(min(c, 3) + rng.integers(0, max_edits + 1))
                toks = _apply_edits(rng, base, n_ed, len(vocab), vprobs)
            content = _render(toks, vocab)
            repo = f"org{entity_id % 97}/repo{entity_id % 31}"
            path = f"{path_prefix}src/mod{entity_id}/file{file_idx}.{_EXT[lang]}"
            commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
            repos.append(repo); paths.append(path); commits.append(commit)
            langs.append(lang); contents.append(content)
            t_entity.append(entity_id); t_edits.append(n_ed)
            file_idx += 1
        entity_id += 1

    files = pa.table({
        "repo": pa.array(repos, pa.string()),
        "path": pa.array(paths, pa.string()),
        "commit": pa.array(commits, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "content": pa.array(contents, pa.string()),
    })
    truth = pa.table({
        "repo": pa.array(repos, pa.string()),
        "path": pa.array(paths, pa.string()),
        "entity_id": pa.array(t_entity, pa.int64()),
        "n_edits": pa.array(t_edits, pa.int32()),
    })
    return files, truth


def _apply_edits(rng, toks: np.ndarray, n_ed: int, v: int, vprobs) -> np.ndarray:
    toks = toks.copy()
    for _ in range(n_ed):
        op = rng.integers(0, 3)
        pos = int(rng.integers(0, len(toks)))
        if op == 0 and len(toks) > 4:            # delete
            toks = np.delete(toks, pos)
        elif op == 1:                            # insert
            toks = np.insert(toks, pos, rng.choice(v, p=vprobs))
        else:                                    # substitute
            toks[pos] = rng.choice(v, p=vprobs)
    return toks


def _render(toks: np.ndarray, vocab: np.ndarray) -> str:
    """Render a token stream as whitespace-separated code-ish text with
    newlines every ~12 tokens (round-trips through the whitespace tokenizer)."""
    words = vocab[toks]
    out = []
    for i in range(0, len(words), 12):
        out.append(" ".join(words[i:i + 12]))
    return "\n".join(out)


def write_corpus_parallel(out_dir: str, n_files: int, seed: int = 42,
                          n_shards: int = 32, **kw) -> str:
    """Generate a large corpus as n_shards deterministic Ray tasks.

    Shard s generates ceil(n/n_shards) files with seed ``seed*1000+s`` and
    writes ``files_s.parquet`` / ``truth_s.parquet`` — the union over shards
    is the corpus (deterministic for a given (n_files, seed, n_shards)).
    Entity ids are made globally unique by offsetting with the shard index.
    Requires an initialised Ray session.
    """
    import os

    import ray

    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    os.makedirs(os.path.join(out_dir, "files"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "truth"), exist_ok=True)

    @ray.remote
    def gen_shard(s: int, n: int) -> int:
        files, truth = generate_corpus(n, seed=seed * 1000 + s,
                                       path_prefix=f"s{s:03d}/", **kw)
        ent = truth.column("entity_id").to_numpy() * n_shards + s
        truth = truth.set_column(truth.column_names.index("entity_id"),
                                 "entity_id", pa.array(ent, pa.int64()))
        pq.write_table(files, os.path.join(out_dir, "files", f"part_{s:03d}.parquet"),
                       row_group_size=8192)
        pq.write_table(truth, os.path.join(out_dir, "truth", f"part_{s:03d}.parquet"),
                       row_group_size=8192)
        return n

    per = -(-n_files // n_shards)
    counts = [min(per, n_files - s * per) for s in range(n_shards)]
    ray.get([gen_shard.remote(s, c) for s, c in enumerate(counts) if c > 0])
    with open(done, "w") as f:
        f.write("ok")
    return out_dir


def write_corpus(out_dir: str, n_files: int, seed: int = 42, **kw) -> tuple[str, str]:
    """Write files.parquet + truth.parquet under out_dir; returns the paths.

    Partitioned into row groups of 8k rows so Ray's read parallelizes.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    files, truth = generate_corpus(n_files, seed=seed, **kw)
    fp = os.path.join(out_dir, "files.parquet")
    tp = os.path.join(out_dir, "truth.parquet")
    pq.write_table(files, fp, row_group_size=8192)
    pq.write_table(truth, tp, row_group_size=8192)
    return fp, tp
