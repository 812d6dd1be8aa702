"""cutwed_ray — a Ray-Data-native entity-resolution / data-processing engine.

Re-expresses the capabilities of the cuTWED reference (garrettwrong/cuTWED:
a linear-memory Time Warp Edit Distance scorer) as an idiomatic Ray Data
pipeline: streaming Arrow batches, actor-pool scoring stages, explicit
blocking shuffles, and distributed transitive clustering — plus the
large-scale training-data operators (dedup, ANN, text analysis) such an
engine needs at 100 TB.

Public kernel API (parity with cuTWED's public surface, see SURVEY.md §2.1):
    twed(A, TA, B, TB, nu, lamb, degree)        — single pair (fast, linear mem)
    twed_ref(...)                               — O(n²) conformance oracle
    twed_batch(AA, TAA, BB, TBB, ..., tri=...)  — all-pairs matrix
    twed_pairs(...)                             — variable-length pair list scorer
"""

from cutwed_ray._malloc import tune_malloc as _tune_malloc

_tune_malloc()

from cutwed_ray.kernel.reference import twed_ref
from cutwed_ray.kernel.batch import twed, twed_batch, twed_pairs, TRIL, TRIU, NOPT
from cutwed_ray.config import TwedConfig, PipelineConfig

__all__ = [
    "twed", "twed_ref", "twed_batch", "twed_pairs",
    "TRIL", "TRIU", "NOPT",
    "TwedConfig", "PipelineConfig",
]

__version__ = "0.1.0"
