"""Pipeline configuration.

The reference passes (nu, lambda, degree, dim) as scalars into every C call
(/root/reference/src/cuTWED.h:28-36); our engine carries them in one config
dataclass broadcast to scorer actors via constructor args.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict


@dataclass(frozen=True)
class TwedConfig:
    """TWED algorithm parameters (semantics of reference_implementation/twed.c:54-67).

    nu      — elasticity / stiffness (time-penalty multiplier), nu >= 0
    lamb    — deletion penalty, lamb >= 0
    degree  — Lp-norm power; degree > 0 takes the p-th root, a negative
              degree reproduces Marteau's original "no root" results
              (hidden feature of the reference CPU path, twed.c:113-119)
    """

    nu: float = 1.0
    lamb: float = 1.0
    degree: int = 2

    def __post_init__(self) -> None:
        if self.degree == 0:
            raise ValueError("degree must be nonzero")
        if self.nu < 0:
            raise ValueError("nu must be >= 0")


@dataclass(frozen=True)
class PipelineConfig:
    """End-to-end entity-resolution pipeline configuration."""

    twed: TwedConfig = field(default_factory=TwedConfig)

    # --- tokenizer ---
    token_modulus: int = 1 << 16          # token-hash values land in [0, 1) with this resolution
    max_tokens: int = 4096                # truncate pathological files (counters report truncations)

    # --- blocking ---
    length_bucket_base: float = 1.35      # geometric length buckets => near-equal series length per block
    minhash_perms: int = 16               # total minhash permutations
    minhash_bands: int = 8                # bands of (perms // bands) rows each
                                          # (2 rows/band: ~0.91 same-entity block
                                          # recall at ~4x candidate amplification
                                          # on the seeded synthetic corpus)
    shingle_k: int = 3                    # token shingle width for minhash
    max_block_size: int = 256             # cap on series per block (salting splits bigger blocks)
    block_salt_seed: int = 0x5EED

    # --- scoring ---
    score_batch_pairs: int = 512          # candidate pairs per scorer batch
    scorer_concurrency: int = 8           # actor pool size
    dtype: str = "float64"
    # broadcast-strategy byte budget for the token store; None = 25% of the
    # object store. Above it the pipeline auto-falls-back to "carry".
    broadcast_store_max_bytes: int | None = None
    # broadcast-strategy candidate generation: one remote task over the
    # materialized tokenized blocks (shuffle-free, globally cost-balanced
    # longest-first scoring chunks — see stages/pairgen.central_pair_chunks)
    # instead of the sort-shuffle + per-bucket map_groups.  Only applies
    # under the broadcast byte budget; capped by max_rows (band-row count)
    # beyond which the single-task lexsort would dominate — the shuffle
    # path takes over there (and carry mode never uses this).
    central_pairgen: bool = True
    central_pairgen_max_rows: int = 8_000_000
    # fuse tokenize->tee->shuffle->score into ONE execution (stages/tee.py).
    # Measured SLOWER than materialize-then-score on this box (sf0.1:
    # +10-15% at both 4 and 16 CPUs — the per-batch plasma tee + sync
    # collector acks + at-barrier store build cost more than the executor
    # round-trip they remove), so default off; kept as a tested alternative
    # for callers whose input scan is expensive enough to flip the trade.
    broadcast_tee: bool = False

    # --- linkage ---
    link_mode: bool = False               # True: only cross-dataset (side-bit) pairs

    # --- clustering ---
    threshold: float = 0.35               # on length-normalized TWED: twed / (n_a + n_b)
    max_driver_edges: int = 5_000_000     # above this, use distributed label propagation
    # keep the raw `content` column through labeling so it appears on the
    # clusters output.  Off by default: content is ~95% of the input bytes
    # on the bench corpus, so carrying it duplicates the corpus through
    # plasma (broadcast materialize) and the clusters parquet just to
    # append a cluster_id — the light cluster table joins back to the
    # source by row_id / sha256 / path instead.
    cluster_content: bool = False

    # --- checkpointing ---
    checkpoint_dir: str | None = None

    def to_dict(self) -> dict:
        return asdict(self)
