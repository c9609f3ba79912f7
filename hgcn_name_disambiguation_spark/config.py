"""Pipeline configuration.

Defaults mirror the reference's hardcoded constants so semantics are
reproducible:
- relation fusion weights (5*coauthor + 1*title + 4*venue)/10
  (reference ``GCN.py:124,130``),
- match threshold tau = 0.9 (``name_disambiguation.py:86,599``),
- co-title edge requires >= 2 shared stemmed tokens
  (``name_disambiguation.py:971-973``),
- stopword list (``name_disambiguation.py:772-773``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Reference stoplist, pre-stemmed form (name_disambiguation.py:772-773).
STOPWORDS: tuple[str, ...] = (
    "at", "based", "in", "of", "for", "on", "and", "to", "an", "using",
    "with", "the", "by", "we", "be", "is", "are", "can",
)

# Punctuation class stripped from titles (name_disambiguation.py:771).
TITLE_PUNCT_RE = r"""[!"#$%&'()*+,\-./:;<=>?@\[\]^_`{|}~—～]+"""


@dataclass(frozen=True)
class PipelineConfig:
    """Knobs for the blocking -> pairs -> score -> cluster pipeline."""

    # --- fusion & threshold (reference parity defaults) ---
    w_coauthor: float = 5.0          # GCN.py:124
    w_title: float = 1.0             # GCN.py:124
    w_venue: float = 4.0             # GCN.py:124
    weight_norm: float = 10.0        # GCN.py:124,130 divide-by-10
    match_threshold: float = 0.20    # calibrated on labeled fixtures (tests);
                                     # reference tau=0.9 applies to sigmoid(dot)
                                     # of learned embeds, not raw fusion scores
    min_title_overlap: int = 2       # name_disambiguation.py:971-973
    # title-only pairs match when IDF-cosine >= this. Must stay high:
    # one false pair lets transitive closure merge two whole entities.
    # 0.8 requires most of both titles' idf mass to agree — generic
    # (high-df/low-idf) token collisions top out well below it.
    strong_title_cos: float = 0.80
    use_stemming: bool = True        # name_disambiguation.py:847-848

    # --- scale / skew controls ---
    # tokens occurring in more than this many pubs *within one block*
    # are dropped from the title inverted index (hot-token guard: a
    # token shared by k pubs emits C(k,2) pairs).
    max_token_df_per_block: int = 200
    # same guard for venues ("Unknown" mega-venues) and coauthors.
    max_venue_df_per_block: int = 500
    max_coauthor_df_per_block: int = 500
    # candidate pairs per block hard cap (0 = unlimited); truncation is
    # counted in lineage, never silent.
    max_pairs_per_block: int = 0
    # salt buckets for skewed block self-joins (applies to the exploded
    # key join; AQE skew-join also on). Join keys whose per-block df
    # exceeds salt_df_threshold take the salted replicated join split
    # into salt_buckets sub-keys; 0 disables explicit salting.
    salt_buckets: int = 8
    salt_df_threshold: int = 64

    # --- connected components ---
    cc_max_iterations: int = 25
    cc_checkpoint_every: int = 3

    # --- misc ---
    stopwords: tuple[str, ...] = field(default=STOPWORDS)
    venue_null_values: tuple[str, ...] = ("", "null", "none", "unknown")


DEFAULT_CONFIG = PipelineConfig()
