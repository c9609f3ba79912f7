"""Text-analysis operators for training-data pipelines.

All built-in `pyspark.sql.functions` — JVM-side, codegen'd, no Python
in the hot path. Each op mirrors what a large-scale corpus pipeline
needs: token counting, quality scoring, language-ID heuristic,
document fingerprinting. Deterministic, so each has an exact ANSI-SQL
oracle (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F  # noqa: F401

# Tiny per-language marker-word lists for the n-gram/stopword-hit
# language-ID heuristic (public common-word lists).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "des", "est"),
    "zh": ("de0", "shi4", "le0", "zai4", "he2"),  # pinyin-ish markers
}

# BPE-ish token regex: words, numbers, or single non-space symbols —
# approximates a byte-pair pre-tokenizer's word-boundary splits.
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(text: Column) -> Column:
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_RE), 0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length
    quality features + a composite [0,1] score.

    The score formula is arbitrary-but-deterministic: monotone in
    stopword ratio and word count, penalized by punctuation density —
    the standard heuristic-filter shape (cf. C4/Gopher rules).
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(F.trim(t), r"\s+")
    n_words = F.size(words)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    stop_hits = F.size(
        F.filter(words, lambda w: w.isin("the", "and", "of", "a", "to", "is", "in"))
    )
    mean_wlen = (n_chars - (n_words - 1)) / n_words
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(stop_hits / F.greatest(n_words, F.lit(1)), 6)
    score = F.round(
        F.least(F.lit(1.0), n_words / F.lit(100.0)) * 0.4
        + F.least(F.lit(1.0), stop_hits / F.greatest(n_words, F.lit(1)) * 5.0) * 0.4
        + (1.0 - F.least(F.lit(1.0), n_punct / F.greatest(n_chars, F.lit(1)) * 10.0)) * 0.2,
        6,
    )
    return df.select(
        "*",
        n_words.alias("n_words"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        score.alias("quality_score"),
    )


def language_id(text: Column) -> Column:
    """Marker-word-hit language ID: argmax of per-language hit counts,
    deterministic tiebreak by language code, 'und' when no hits.

    Expressed as a pure column expression (struct-max idiom) so it
    stays in codegen; the same logic is a CASE/GREATEST chain in SQL.
    """
    words = F.split(F.lower(F.trim(text)), r"\s+")
    langs = sorted(LANG_MARKERS)  # ascending; rank descends so that
    # greatest() tiebreaks to the lexicographically smallest language.
    def _hits(markers: tuple[str, ...]) -> Column:
        # one-arg lambda only: a second (default) arg would make
        # F.filter treat it as the (element, index) variant.
        def pred(w):
            return w.isin(*markers)

        return F.size(F.filter(words, pred))

    scored = [
        F.struct(
            _hits(LANG_MARKERS[lang]).alias("hits"),
            F.lit(len(langs) - i).alias("rank"),
            F.lit(lang).alias("lang"),
        )
        for i, lang in enumerate(langs)
    ]
    best = F.greatest(*scored) if len(scored) > 1 else scored[0]
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def doc_fingerprint(text: Column) -> Column:
    """64-bit rolling document fingerprint: xxhash64 of the
    whitespace-normalized lowercased text — stable under reflow.
    (The 'rolling hash' for shingles lives in dedup.shingles.)"""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.xxhash64(norm)


def vocab_top_k(
    df: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary: the vocab_size most frequent whitespace
    tokens of the normalized text, total-ordered by (count DESC,
    token ASC) so the cutoff boundary is deterministic.

    Returns (token, n_occurrences, rank) with rank 1..vocab_size.
    Scale shape: token counting is ONE map-side-combined shuffle on
    the token; the top-K itself is TakeOrderedAndProject over the
    distinct-token frame (a per-partition heap + driver merge of K
    rows — never a global sort of the corpus). The vocab is
    driver-bounded at vocab_size rows by construction, which is what
    makes the downstream OOV join broadcastable.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    toks = df.select(F.explode(F.split(norm, " ")).alias("token"))
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    ordered = counts.orderBy(
        F.desc("n_occurrences"), F.asc("token")
    ).limit(vocab_size)
    from pyspark.sql import Window as _W

    w = _W.orderBy(F.desc("n_occurrences"), F.asc("token"))
    # rank window runs over <= vocab_size rows (post-limit) — bounded.
    return ordered.select(
        "token", "n_occurrences", F.row_number().over(w).alias("rank")
    )


def oov_stats(
    df: DataFrame,
    vocab_size: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Per-document out-of-vocabulary counts against the corpus
    top-vocab_size vocabulary (tokenizer-prep staple: decide vocab
    size / flag OOV-heavy docs before training a tokenizer).

    Returns (doc_id, n_tokens, n_oov) — integers only. Pass a
    precomputed `vocab` (any frame with a `token` column, e.g. a
    FROZEN production vocab) to score against it instead of refitting.

    Scale shape: the vocab side is <= vocab_size rows and explicitly
    broadcast, so the token->vocab membership probe is a map-side
    hash join — the only shuffle is the final per-doc count agg.
    """
    v = (vocab if vocab is not None else vocab_top_k(df, vocab_size, text_col)).select(
        "token", F.lit(1).alias("_iv")
    )
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(norm, " ")).alias("token"),
    )
    return (
        toks.join(F.broadcast(v), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("_iv").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
    )


def token_entropy(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Per-group token-distribution Shannon entropy in integer
    micro-nats (round 5) — the corpus-diversity number a mixing
    report publishes next to composition counts: low entropy flags
    templated/boilerplate-heavy sources, high entropy flags diverse
    ones (Shannon 1948; the nat-denominated form).

        H = ln(N) - (sum_t c_t * ln(c_t)) / N

    over the group's token counts c_t (N = total tokens). Encoding is
    the q50/q59/q66 integer micro-unit pattern: each term contributes
    c_t * floor(1e6 * ln(c_t)) — a BIGINT — and the mean is exact
    integer `div`, so the output is order-insensitive and replays
    bit-for-bit in a second engine (a free-floating DOUBLE mean would
    not; the only residual risk is an ln value within one ulp of a
    1e-6 boundary, ~1e-10 odds per distinct count).

    Returns (group_col, n_tokens, n_distinct_tokens,
    entropy_micro_nats). Scale shape: one map-side-combined count
    shuffle on (group, token) + one per-group agg over the count
    frame — bounded by vocabulary, never corpus size.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(norm, " ")).alias("token"),
    ).where(F.col("token") != "")
    counts = toks.groupBy("grp", "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    g = counts.groupBy("grp").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_tokens"),
        F.sum(
            F.col("c")
            * F.floor(F.lit(1_000_000.0) * F.log(F.col("c"))).cast("long")
        ).alias("_s"),
    )
    return g.select(
        F.col("grp").alias(group_col),
        "n_tokens",
        "n_distinct_tokens",
        (
            F.floor(F.lit(1_000_000.0) * F.log(F.col("n_tokens"))).cast(
                "long"
            )
            - F.expr("_s div n_tokens")
        ).alias("entropy_micro_nats"),
    )
