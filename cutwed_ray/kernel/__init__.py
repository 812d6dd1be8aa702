from cutwed_ray.kernel.reference import twed_ref
from cutwed_ray.kernel.batch import twed, twed_batch, twed_pairs, TRIL, TRIU, NOPT

__all__ = ["twed", "twed_ref", "twed_batch", "twed_pairs", "TRIL", "TRIU", "NOPT"]
