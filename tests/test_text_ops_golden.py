"""Regression goldens for the vectorized text ops.

The fixture outputs were captured from the round-1 (scalar-loop)
implementations of ``fingerprint`` and ``LangIdStage``; the vectorized
rewrites must reproduce them bit-for-bit.
"""

import numpy as np
import pyarrow as pa

from cutwed_ray.ops.text import LangIdStage, fingerprint

GOLDEN = "tests/data/text_ops_golden.npz"


def _fixture_table() -> pa.Table:
    rng = np.random.RandomState(123)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
             "the", "and", "der", "die", "le", "la", "el", "que"]
    texts = []
    for _ in range(50):
        L = rng.randint(0, 40)
        texts.append(" ".join(rng.choice(vocab, L)))
    texts += ["", "  ", "one", "one two", "one two three four five"]
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_fingerprint_golden():
    want = np.load(GOLDEN)["fp"]
    got = fingerprint(_fixture_table()).column("fingerprint").to_numpy()
    assert (got == want).all()


def test_langid_golden():
    z = np.load(GOLDEN)
    out = LangIdStage()(_fixture_table())
    assert out.column("lang_pred").to_pylist() == z["pred"].tolist()
    assert np.allclose(out.column("lang_score").to_numpy(), z["score"], atol=0)
