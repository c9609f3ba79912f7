"""Dataset-curation operators for large-scale training-data pipelines.

Engine extensions beyond the reference (which is a pure entity-resolution
pipeline): the three curation steps every 100-TB pretraining corpus run
needs next to dedup — benchmark decontamination, deterministic stratified
sampling for dataset mixing, and repetition-based quality filtering
(Gopher-style repetition signals, Rae et al. 2021, arXiv:2112.11446).

Scale notes (all three are single-pass, JVM-side, no Python UDFs):

- ``contamination_flags`` — the eval/benchmark side of a decontamination
  run is small (benchmarks are MBs, the corpus is TBs), so its distinct
  shingle set is **broadcast**; the corpus side is one scan + one
  partial-aggregated shuffle on ``doc_id``. Nothing in the plan grows
  with corpus size except that one map-side-combined aggregation.
- ``stratified_sample`` — a pure narrow filter (hash-compare per row, no
  shuffle at all), deterministic in (seed, id): re-running the job or
  adding executors cannot change which rows are kept, which is what
  makes the sample reproducible across a 1000-executor rerun.
- ``repetition_features`` — two aggregations keyed by ``doc_id`` (token
  stats, bigram mode), both map-side combined; the bigram frame never
  materialises more than one row per (doc, distinct bigram).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from hgcn_name_disambiguation_spark.operators.dedup import (
    normalized_text,
    shingle_index,
)

# repetition-filter defaults, calibrated on the synthetic documents
# corpus (sf0.01 medians: dup_token_frac 0.54, top_bigram_frac 0.033,
# p90 0.069) so the flag marks the repetitive tail, not everything.
DUP_TOKEN_FRAC_THRESHOLD = 0.65
TOP_BIGRAM_FRAC_THRESHOLD = 0.10


def contamination_flags(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    ratio_threshold: float = 0.2,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flag corpus documents sharing word ``n``-gram spans with an
    eval/benchmark set (training-set decontamination).

    Returns one row per input doc: (doc_id, n_shingles,
    overlap_shingles, contamination_micro, contaminated) where
    contamination_micro = floor(1e6 * overlapping distinct shingles /
    doc's distinct shingles) — exact integer micro-units (integral
    division, never a rounded DOUBLE: rounded doubles are not
    hash-stable across engines) — and ``contaminated`` = ratio >=
    ratio_threshold AND overlap >= min_hits (int 0/1 for cross-engine
    stability).

    The eval shingle set is broadcast — decontamination's defining
    asymmetry is a tiny benchmark side vs an arbitrarily large corpus
    side, so the corpus is never shuffled by shingle.
    """
    doc_sh = shingle_index(docs, id_col=id_col, text_col=text_col, n=n)
    eval_sh = (
        shingle_index(eval_docs, id_col=id_col, text_col=text_col, n=n)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    per_doc = (
        doc_sh.join(F.broadcast(eval_sh), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("overlap_shingles"),
        )
    )
    base = docs.select(F.col(id_col).alias("doc_id")).distinct()
    ns = F.coalesce(F.col("n_shingles"), F.lit(0))
    ov = F.coalesce(F.col("overlap_shingles"), F.lit(0))
    ratio = ov * F.lit(1.0) / F.greatest(ns, F.lit(1))
    # exact integer micro-units: non-negative long `div` long is pure
    # integral division, so Spark's `div` and DuckDB's `//` agree
    # bit-for-bit (a rounded DOUBLE here is not hash-stable across
    # engines — the one red driver cell of round 3).
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            ns.cast("long").alias("n_shingles"),
            ov.cast("long").alias("overlap_shingles"),
            ((ratio >= ratio_threshold) & (ov >= min_hits))
            .cast("int")
            .alias("contaminated"),
        )
        .withColumn(
            "contamination_micro",
            F.expr(
                "overlap_shingles * 1000000L div greatest(n_shingles, 1L)"
            ),
        )
        .select(
            "doc_id",
            "n_shingles",
            "overlap_shingles",
            "contamination_micro",
            "contaminated",
        )
    )


def sample_cutoff_hex(rate: float) -> str:
    """15-hex-digit cutoff so that md5-prefix < cutoff keeps ~``rate``
    of rows. String comparison of lowercase hex is lexicographic =
    numeric, and both Spark and DuckDB produce identical lowercase md5
    — the same cutoff literal drives both engines bit-identically."""
    rate = min(max(rate, 0.0), 1.0)
    if rate >= 1.0:
        # supremum sentinel: 'g' > every hex char, so every 15-hex
        # md5 prefix compares below it — rate 1.0 keeps all rows
        # (format(16**15) would be 16 chars and mis-compare).
        return "g"
    return format(int(rate * (16**15)), "015x")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-stratum downsampling (dataset mixing).

    Keeps a row iff the first 15 hex chars of md5("{seed}:{id}") fall
    below the stratum's rate cutoff — a pure narrow filter (zero
    shuffle, zero RNG state), so the kept set is a function of
    (seed, id) only: stable under reruns, repartitioning, and cluster
    resizes, and two jobs sampling at rates r1 < r2 produce nested
    samples (the r1 set is a subset of the r2 set), which is how
    mixing-weight sweeps stay comparable across runs.
    """
    hx = F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))), 1, 15
    )
    cutoff = F.lit(sample_cutoff_hex(default_rate))
    for stratum, rate in sorted(rates.items()):
        cutoff = F.when(
            F.col(stratum_col) == stratum, F.lit(sample_cutoff_hex(rate))
        ).otherwise(cutoff)
    return df.where(hx < cutoff)


# C4-style scrubbing patterns — deliberately simple character classes
# that behave identically under Java regex (Spark) and RE2 (DuckDB).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^ ]+"
LONGNUM_RE = r"[0-9]{9,}"


def redact_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII/URL scrubbing (the C4-style pre-training redaction pass):
    emails -> <EMAIL>, URLs -> <URL>, 9+-digit runs -> <NUM>, with
    per-doc match counts taken on the ORIGINAL text. Pure narrow
    regexp transforms — zero shuffle, codegen'd JVM regex; the
    replacement order (email, URL, number) is part of the contract
    (an email never starts with http; a URL may contain digit runs
    that must not be double-masked)."""
    t = F.col(text_col)
    red = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, URL_RE, "<URL>")
    red = F.regexp_replace(red, LONGNUM_RE, "<NUM>")
    return df.select(
        F.col(id_col).alias("doc_id"),
        red.alias("text_redacted"),
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(URL_RE)).alias("n_urls"),
        F.regexp_count(t, F.lit(LONGNUM_RE)).alias("n_longnums"),
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_ranges: int | None = None,
) -> DataFrame:
    """Concatenate-then-chunk sequence-packing offsets (GPT-style
    training layout): documents are laid out in ``id_col`` order into
    one virtual token stream cut into ``seq_len``-token chunks; a doc
    may span a chunk boundary. Returns per doc: (doc_id, n_tokens,
    start_offset, start_chunk, end_chunk).

    The global running offset is a DISTRIBUTED PREFIX SUM — the naive
    form (one unpartitioned window over the corpus) funnels 100 TB
    through a single task. Instead: range-partition by id, aggregate
    one token-sum row per partition (bounded by the partition count,
    the only driver-side data), prefix those on the driver, broadcast
    the per-partition base offsets back, and finish with a
    partition-local window cumsum. Exact, deterministic, and every
    stage is bounded: no task ever sees more than its own range.
    """
    toks = F.size(F.split(normalized_text(F.col(text_col)), " "))
    d = df.select(F.col(id_col).alias("doc_id"), toks.alias("n_tokens"))
    if num_ranges is None:
        num_ranges = max(d.sparkSession.sparkContext.defaultParallelism, 2)
    # materialize the ranged layout ONCE: the per-partition-sum job
    # and the final cumsum job must see the identical partitioning
    # (spark_partition_id is layout-dependent), and the checkpoint
    # guarantees both actions read the same physical partitions.
    d = (
        d.repartitionByRange(num_ranges, "doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # RangePartitioner assigns ascending key ranges to ascending
    # partition ids, so prefixing the per-partition sums in _pid order
    # IS the global prefix. One bounded collect: <= num_ranges rows.
    psums = {
        r["_pid"]: r["s"]
        for r in d.groupBy("_pid").agg(F.sum("n_tokens").alias("s")).collect()
    }
    base, acc = [], 0
    for pid in sorted(psums):
        base.append((pid, acc))
        acc += psums[pid]
    # base offsets ride a broadcast join, NOT a CASE chain: at 10^5
    # ranges a chained when() is a 10^5-deep expression tree (planner
    # death), while a broadcast of num_ranges tiny rows is free.
    base_df = d.sparkSession.createDataFrame(
        base or [(0, 0)], "_pid int, _base long"
    )
    d = d.join(F.broadcast(base_df), "_pid", "left").withColumn(
        "_base", F.coalesce("_base", F.lit(0))
    )
    w = Window.partitionBy("_pid").orderBy("doc_id")
    start = (
        F.col("_base") + F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).cast("long")
    return d.select(
        "doc_id",
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / seq_len).cast("long").alias("start_chunk"),
        F.floor(
            (start + F.greatest(F.col("n_tokens"), F.lit(1)) - 1) / seq_len
        )
        .cast("long")
        .alias("end_chunk"),
    )


def repetition_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dup_token_frac_threshold: float = DUP_TOKEN_FRAC_THRESHOLD,
    top_bigram_frac_threshold: float = TOP_BIGRAM_FRAC_THRESHOLD,
) -> DataFrame:
    """Gopher-style repetition signals per document.

    Returns (doc_id, n_tokens, dup_token_micro, top_bigram_micro,
    repetitive): dup_token_micro = floor(1e6 * (1 - distinct/total
    tokens)), top_bigram_micro = floor(1e6 * occurrences of the doc's
    most frequent bigram / total bigrams), repetitive (int 0/1) =
    either fraction above its threshold. Both signals are the
    token-count analogue of Rae et al.'s duplicate-line / top-2-gram
    character fractions.

    Fractions are exact integer micro-units (non-negative BIGINT
    ``div``), and the threshold flag is an exact integer
    cross-multiplication — no DOUBLE appears in the output or the
    comparisons, so the result is bit-stable across engines (the
    q42/q50 hardening pattern: rounded doubles are not hash-stable
    across engines).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(normalized_text(F.col(text_col)), " ")).alias(
            "pos", "tok"
        ),
    )
    uni = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = toks.select(
        "doc_id",
        F.concat_ws(" ", F.col("tok"), F.lead("tok", 1).over(w)).alias("bigram"),
        F.lead("tok", 1).over(w).isNotNull().alias("_full"),
    ).where(F.col("_full"))
    bg = (
        bigrams.groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_bigrams"))
    )
    dup_num = (F.col("n_tokens") - F.col("n_distinct")).cast("long")
    dup_den = F.greatest(F.col("n_tokens"), F.lit(1)).cast("long")
    top_num = F.coalesce(F.col("top_c"), F.lit(0)).cast("long")
    top_den = F.greatest(
        F.coalesce(F.col("n_bigrams"), F.lit(0)), F.lit(1)
    ).cast("long")
    dup_thr_micro = int(round(1e6 * dup_token_frac_threshold))
    top_thr_micro = int(round(1e6 * top_bigram_frac_threshold))
    return uni.join(bg, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        (dup_num * F.lit(1_000_000)).cast("long").alias("_dn"),
        dup_den.alias("_dd"),
        (top_num * F.lit(1_000_000)).cast("long").alias("_tn"),
        top_den.alias("_td"),
    ).select(
        "doc_id",
        "n_tokens",
        F.expr("_dn div _dd").alias("dup_token_micro"),
        F.expr("_tn div _td").alias("top_bigram_micro"),
        # exact integer cross-multiply: frac > thr <=> num*1e6 > thr_micro*den
        (
            (F.col("_dn") > F.lit(dup_thr_micro) * F.col("_dd"))
            | (F.col("_tn") > F.lit(top_thr_micro) * F.col("_td"))
        )
        .cast("int")
        .alias("repetitive"),
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style language-model quality score: per-doc mean
    log-probability under an add-one-smoothed CORPUS bigram model
    (Wenzek et al. 2020 filter cheap documents by LM perplexity; a
    corpus-trained bigram model is the external-data-free analogue —
    boilerplate and gibberish score low, fluent text scores high).

        P(w2 | w1) = (count(w1 w2) + 1) / (count(w1 ·) + V)
        avg_logprob(doc) = mean over the doc's bigrams of ln P

    Returns (doc_id, n_bigrams, avg_logprob_micro, ppl_micro =
    -avg_logprob_micro); docs with < 2 tokens get NULL scores (no
    bigrams). Scores are INTEGER MICRO-NATS: each bigram contributes
    floor(1e6 * ln P) — a BIGINT — and the per-doc mean is
    floor(sum / n) over those exact integers. Rounded DOUBLEs are not
    hash-stable across engines (last-ulp ln differences plus
    order-sensitive AVG summation — the q42 lesson); flooring each
    term to micro-units makes the sum exact and order-insensitive,
    and the only residual cross-engine risk is a per-DISTINCT-count
    ln value landing within one ulp of a 1e-6 boundary (~1e-10 odds
    per distinct (bc, cc) pair).

    Scale shape: the model IS two aggregations (bigram counts keyed by
    (w1, w2), continuation totals keyed by w1 — both map-side
    combined); scoring is one join from the doc bigram frame to the
    count frames on their natural keys, then a per-doc mean. Nothing
    dense, no UDFs, no driver-side model — at 100 TB the 'model' stays
    a distributed frame joined by key, exactly how an LM-filter
    pass over a pretraining corpus has to work.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(normalized_text(F.col(text_col)), " ")
        ).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = (
        toks.select(
            "doc_id",
            F.col("tok").alias("w1"),
            F.lead("tok", 1).over(w).alias("w2"),
        )
        .where(F.col("w2").isNotNull())
        .localCheckpoint(eager=False)
    )
    bcounts = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("bc")
    )
    ccounts = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("cc"))
    vocab_n = toks.select(
        F.countDistinct("tok").alias("v")
    )
    scored = (
        bigrams.join(bcounts, ["w1", "w2"])
        .join(ccounts, "w1")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "doc_id",
            F.floor(
                F.lit(1e6)
                * F.log(
                    (F.col("bc") + F.lit(1.0))
                    / (F.col("cc") + F.col("v"))
                )
            ).alias("lp_micro"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp_micro").alias("_slp"),
        )
    )
    base = df.select(F.col(id_col).alias("doc_id")).distinct()
    # exact-integer sum / count: IEEE double division of two exact
    # integers is correctly rounded identically on JVM and libm, so
    # the floor is engine-stable.
    avg_micro = F.floor(
        F.col("_slp").cast("double") / F.col("n_bigrams")
    )
    return base.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        avg_micro.alias("avg_logprob_micro"),
        (-avg_micro).alias("ppl_micro"),
    )


def hashed_ngram_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 10_000,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Hashed bag-of-ngrams features (DSIR's representation, Xie et
    al. 2023 arXiv:2302.03169 §2.2): unigrams + bigrams of the
    normalized text, hashed into ``num_buckets`` buckets. Returns
    (doc_id, bucket, c).

    The n-gram arrays are built NARROWLY (split + transform over the
    token array — no posexplode/window, so no per-token shuffle); the
    only shuffle is the final (doc_id, bucket) count, map-side
    combined. ``hash_mode="md5"`` uses conv(md5-prefix) % B, which
    DuckDB reproduces bit-for-bit (`('0x'||substr(md5,1,15))::BIGINT`
    — 60-bit positive, so % == pmod); "xxhash64" is the production
    mode (one 64-bit hash instead of a 32-hex digest per n-gram).
    """
    toks = F.split(normalized_text(F.col(text_col)), " ")
    d = df.select(F.col(id_col).alias("doc_id"), toks.alias("t"))
    # bigrams: t[i] + ' ' + t[i+1] via transform over the first n-1
    # slots — Spark [] indexing and transform's i are both 0-based.
    ngrams = F.expr(
        "concat(t, transform(slice(t, 1, greatest(size(t) - 1, 0)),"
        " (x, i) -> concat(x, ' ', t[i + 1])))"
    )
    ng = d.select("doc_id", F.explode(ngrams).alias("ng"))
    if hash_mode == "md5":
        bucket = F.pmod(
            F.conv(F.substring(F.md5("ng"), 1, 15), 16, 10).cast("long"),
            F.lit(num_buckets),
        )
    else:
        bucket = F.pmod(F.xxhash64("ng"), F.lit(num_buckets))
    return (
        ng.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 10_000,
    hash_mode: str = "xxhash64",
    select_k: int | None = None,
) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169): score
    every raw-corpus document by its log importance weight under two
    add-one-smoothed hashed-ngram bag models — target p vs raw q:

        log w(doc) = sum over buckets b of  c_doc[b] * (ln p_b - ln q_b)
        p_b = (tc_b + 1) / (T_t + B),  q_b = (rc_b + 1) / (T_r + B)

    and (optionally) keep the top ``select_k`` docs by weight — the
    "pick raw data that looks like the target domain" selection step
    of a pretraining-data pipeline.

    Returns (doc_id, n_feats, logratio_micro[, selected]) — INTEGER
    micro-nats only: each ln term is floored to floor(1e6*ln(int))
    separately (exact-integer arithmetic after that, the q50 pattern),
    so per-bucket log-ratios and their weighted sums are exact BIGINTs
    — order-insensitive and hash-stable across engines.

    Scale shape: both models are one map-side-combined agg bounded by
    ``num_buckets`` rows (10^4 constant regardless of corpus size), so
    the log-ratio table is BROADCAST; scoring is the doc-feature frame
    joined to that broadcast + one per-doc sum. The totals ride 1-row
    broadcast cross-joins. Selection is TakeOrdered (bounded k rows on
    the driver) re-broadcast as a flag join — never a global window.
    """
    feats = hashed_ngram_features(
        raw, id_col, text_col, num_buckets, hash_mode
    )
    # consumed twice (the raw bag model and the per-doc scoring join)
    # — one materialization instead of two feature-extraction passes
    feats = feats.localCheckpoint(eager=True)
    tgt_feats = hashed_ngram_features(
        target, id_col, text_col, num_buckets, hash_mode
    )
    raw_m = feats.groupBy("bucket").agg(F.sum("c").alias("rc"))
    tgt_m = tgt_feats.groupBy("bucket").agg(F.sum("c").alias("tc"))
    tot_r = raw_m.select(F.sum("rc").alias("tr"))
    tot_t = tgt_m.select(F.coalesce(F.sum("tc"), F.lit(0)).alias("tt"))

    def _fl(x):  # floor(1e6 * ln x) of an exact integer-valued input
        return F.floor(F.lit(1e6) * F.log(x)).cast("long")

    # every doc bucket appears in the raw model by construction, so
    # raw_m is the spine; target counts default to 0 (smoothed to 1).
    lr = (
        raw_m.join(tgt_m, "bucket", "left")
        .crossJoin(F.broadcast(tot_r))
        .crossJoin(F.broadcast(tot_t))
        .select(
            "bucket",
            (
                _fl(F.coalesce(F.col("tc"), F.lit(0)) + F.lit(1.0))
                - _fl(F.col("tt") + F.lit(float(num_buckets)))
                - _fl(F.col("rc") + F.lit(1.0))
                + _fl(F.col("tr") + F.lit(float(num_buckets)))
            ).alias("lr_micro"),
        )
    )
    scores = (
        feats.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_feats"),
            F.sum(F.col("c") * F.col("lr_micro")).alias("logratio_micro"),
        )
    )
    if select_k is None:
        return scores
    # scores feed both the top-k draw and the flag join — doc-count
    # sized, materialize once
    scores = scores.localCheckpoint(eager=True)
    topk = (
        scores.orderBy(F.desc("logratio_micro"), F.asc("doc_id"))
        .limit(select_k)
        .select("doc_id", F.lit(1).alias("selected"))
    )
    return scores.join(F.broadcast(topk), "doc_id", "left").select(
        "doc_id",
        "n_feats",
        "logratio_micro",
        F.coalesce("selected", F.lit(0)).alias("selected"),
    )


def corpus_composition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
    dup_key_tokens: int | None = None,
) -> DataFrame:
    """Dataset-mixing report: the per-(source, lang) composition table
    every pretraining run publishes before choosing mixture weights —
    document counts, token counts (the unit mixing is actually done
    in), exact-dup pressure, and distinct-text counts. All integers;
    token SHARES are derivable downstream (kept out of the output so
    it stays hash-stable across engines).

    Returns (source, lang, n_docs, n_tokens, n_dup_docs,
    n_unique_texts) where n_dup_docs counts docs whose normalized-text
    key occurs >= 2 times CORPUS-WIDE (cross-source dups count in
    every stratum they appear in — the number mixing needs, since
    deduping one stratum shrinks the others' effective overlap).
    ``dup_key_tokens`` truncates the dup key to the first N tokens
    (q13's trick for manufacturing deterministic dups at small SF);
    None = full normalized text.

    Scale shape: one map-side-combined count shuffle on the 64-hex dup
    key, one join back on that key (AQE handles skew on mega-dup
    groups), then one agg on (source, lang) — a stratum-count-bounded
    output. The count-distinct over keys expands the final agg 2x;
    strata counts are tiny so the expand is map-side absorbed.
    """
    norm = normalized_text(F.col(text_col))
    key_src = (
        F.concat_ws(" ", F.slice(F.split(norm, " "), 1, dup_key_tokens))
        if dup_key_tokens is not None
        else norm
    )
    base = df.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        F.size(F.split(norm, " ")).alias("n_toks"),
        F.sha2(key_src, 256).alias("h"),
    )
    counts = base.groupBy("h").agg(F.count(F.lit(1)).alias("ch"))
    return (
        base.join(counts, "h")
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.sum(F.when(F.col("ch") >= 2, 1).otherwise(0)).alias("n_dup_docs"),
            F.countDistinct("h").alias("n_unique_texts"),
        )
    )
