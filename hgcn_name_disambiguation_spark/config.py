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

# Reference stoplist — the EXACT raw 16-word list from
# name_disambiguation.py:772 (including its 'algrithom' typo). The
# reference stems this list with the same Porter stemmer it applies to
# tokens, then drops a token iff its STEM is in the stemmed list
# (name_disambiguation.py:773,845-848); functions.text.STOP_STEMS is
# that stemmed form.
RAW_STOPWORDS: tuple[str, ...] = (
    "at", "based", "in", "of", "for", "on", "and", "to", "an", "using",
    "with", "the", "method", "algrithom", "by", "model",
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
    # org-affiliation channel (engine extension; reference parses org
    # at name_disambiguation.py:828 but never uses it). 0 disables.
    w_org: float = 4.0
    match_threshold: float = 0.20    # calibrated on labeled fixtures (tests);
                                     # reference tau=0.9 applies to sigmoid(dot)
                                     # of learned embeds, not raw fusion scores
    min_title_overlap: int = 2       # name_disambiguation.py:971-973
    # shared-token minimum for a title_cos edge to exist at all;
    # min_title_overlap above gates only the parity weight w_title.
    # 1 (default) keeps single-token IDF cosines: measured +1.7
    # macro-F1 / +6.7 precision on the reference's labeled AMiner
    # corpus (fixed-k GHAC), because without them non-matching pairs
    # tie at sim 0 and average linkage merges arbitrarily.
    min_title_cos_overlap: int = 1
    # title-only pairs match when IDF-cosine >= this. Must stay high:
    # one false pair lets transitive closure merge two whole entities.
    # 0.8 requires most of both titles' idf mass to agree — generic
    # (high-df/low-idf) token collisions top out well below it.
    strong_title_cos: float = 0.80
    # corroboration gates, both OFF by default. Measured on the
    # reference's 110 labeled AMiner blocks: single-coauthor-only
    # pairs are 54% true and venue-only pairs 81% true — yet excluding
    # them costs far more recall than it buys precision (macro
    # P 0.89->0.90 for R 0.74->0.61; both gates: P 0.96, R 0.52)
    # because transitive closure recovers most false merges through
    # other paths anyway. Enable for precision-critical dedup where a
    # false merge is costlier than a split entity.
    exclude_single_coauthor_only: bool = False
    exclude_venue_only: bool = False
    use_stemming: bool = True        # name_disambiguation.py:847-848
    # Jaro-Winkler/Jaccard enrichment pass (scoring.enrich_scores):
    # re-scores pairs with string-sim features and thresholds on
    # score_enriched. Corpus-density-dependent like refine (below):
    # on the SPARSE labeled AMiner corpus it is worth +1.2 macro F1
    # (0.769 -> 0.781, recall +1.7, precision flat — measured,
    # REFERENCE_EVAL runs); on dense-evidence corpora the flat
    # string-sim bonus pushes weak pairs over tau and block precision
    # collapses (fixtures: 1.0 -> 0.18). Off by default everywhere;
    # jobs/disambiguate.py exposes it as the opt-in --enrich flag.
    enrich: bool = False

    # --- scale / skew controls ---
    # tokens occurring in more than this many pubs *within one block*
    # are dropped from the title inverted index (hot-token guard: a
    # token shared by k pubs emits C(k,2) pairs).
    max_token_df_per_block: int = 200
    # same guard for venues ("Unknown" mega-venues) and coauthors.
    max_venue_df_per_block: int = 500
    max_coauthor_df_per_block: int = 500
    max_org_df_per_block: int = 500
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
    # localCheckpoint cadence (rounds): 1 = truncate lineage eagerly
    # every round — measured fastest in local mode (every=3 with
    # persist() in between cost +2s/+38% on the sf0.1 flagship CC: the
    # deeper in-between plans outweigh the saved checkpoint I/O here).
    # On a real cluster with reliable-checkpoint-to-HDFS costs, raise
    # it to trade plan depth for checkpoint traffic.
    cc_checkpoint_every: int = 1

    # --- cluster-level agglomeration (clustering.refine_clusters) ---
    # rounds of cluster-pair merging on aggregated (incl. sub-threshold)
    # pair evidence; 0 disables. affinity = sum(scores)/min(|A|,|B|).
    # OFF by default — refine is an opt-in recall lever whose merge
    # threshold is corpus-density-dependent: on the reference's SPARSE
    # labeled AMiner blocks one round at tau 0.10 is the measured
    # macro-F1 peak (0.767 -> 0.779; R +3.7 for P -1.6), but on
    # dense-evidence corpora (the synthetic fixtures) the same setting
    # over-merges catastrophically (block precision 1.0 -> 0.15)
    # because sum-of-sub-threshold-evidence normalized by the smaller
    # cluster grows with evidence density, not match probability.
    # Calibrate cluster_merge_tau per corpus before enabling.
    cluster_refine_rounds: int = 0
    cluster_merge_tau: float = 0.10
    # a cluster-pair merge additionally needs >= this many distinct
    # cross pair-edges (corroboration; 1 disables the gate).
    cluster_merge_min_edges: int = 2

    # --- misc ---
    stopwords: tuple[str, ...] = field(default=RAW_STOPWORDS)
    venue_null_values: tuple[str, ...] = ("", "null", "none", "unknown")


DEFAULT_CONFIG = PipelineConfig()
