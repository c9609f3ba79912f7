"""Incremental cluster assignment — attribute NEW publications to an
existing clustered snapshot without re-clustering.

The reference is batch-only (it re-runs the whole block pipeline per
name, ``name_disambiguation.py`` main loop), so this operator is
forward-looking capability in the same spirit as the streaming
surface: the deployment question it answers is "a new paper arrived —
which KNOWN author wrote it?" with bounded latency, leaving the full
(heavier) re-cluster to ``streaming.incremental_disambiguation`` or a
scheduled batch run.

Scoring mirrors the engine's F7 fusion ((5·A + 1·T + 4·V)/10,
``GCN.py:124`` weights):

- A (coauthor): 1.0 when the new pub shares at least one coauthor
  with any member of the cluster,
- T (title): IDF cosine between the new pub's token vector and the
  cluster's DISTINCT member-token vector, idf taken from the SNAPSHOT
  (ln((N_block+1)/df)); tokens unseen in the snapshot count in the
  pub norm at the block's max idf (ln(N_block+1)) so unmatchable
  tokens still dilute the cosine,
- V (venue): 1.0 when the new pub's venue appears in the cluster.

Per new pub the argmax cluster wins (ties break toward the GREATEST
cluster_id — a deterministic rule expressible as one max(struct(..))
aggregate, no window sort, legal in Structured Streaming); the pub is
assigned iff fused >= ``config.assign_threshold``, else cluster_id is
NULL (a new entity, pending the next full resolution).

Scale notes: every stage is an equi-join on (block_key, key) followed
by a hash aggregate. Hot keys are capped on the SNAPSHOT side —
authors/venues shared by more than ``assign_hot_key_clusters``
clusters in a block are dropped from the candidate index (they carry
no identity signal, exactly like the hot-token cap in
``token_idf_index``), which bounds the per-new-pub candidate fan-out
independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig


def _hot_capped(index: DataFrame, key: str, cap: int) -> DataFrame:
    """Drop (block, key) values present in more than ``cap`` distinct
    clusters — no identity signal, unbounded fan-out."""
    counts = index.groupBy("block_key", key).agg(
        F.count(F.lit(1)).alias("_n_clusters")
    )
    return (
        index.join(counts, ["block_key", key])
        .where(F.col("_n_clusters") <= cap)
        .drop("_n_clusters")
    )


def cluster_profiles(
    clustered: DataFrame, config: PipelineConfig = DEFAULT_CONFIG
) -> dict[str, DataFrame]:
    """Snapshot-side candidate indexes, each distinct per cluster:
    ``authors`` (block_key, author, cluster_id), ``venues``
    (block_key, venue, cluster_id), ``tokens`` (block_key, tok, idf,
    cluster_id), ``token_norms`` (block_key, cluster_id, c_norm),
    plus the (block_key, tok, idf, df) lookup ``block_idf`` (UNCAPPED
    — scoring needs df to tell 'hot, excluded from both sides' from
    'unseen, max idf') and ``block_sizes``. Build once per snapshot
    and reuse across micro-batches. The idf formula is
    ``token_idf_index``'s (ln((N_block+1)/df)), over snapshot pubs."""
    cap = config.assign_hot_key_clusters
    authors = _hot_capped(
        clustered.select(
            "block_key",
            F.explode("authors").alias("author"),
            "cluster_id",
        ).distinct(),
        "author",
        cap,
    )
    venues = _hot_capped(
        clustered.where(
            ~F.lower(F.coalesce(F.col("venue"), F.lit(""))).isin(
                *config.venue_null_values
            )
        )
        .select("block_key", "venue", "cluster_id")
        .distinct(),
        "venue",
        cap,
    )
    block_sizes = clustered.groupBy("block_key").agg(
        F.count(F.lit(1)).alias("n_block")
    )
    idx = clustered.select(
        "block_key", "pub_id", "cluster_id",
        F.explode("title_toks").alias("tok"),
    )
    df_counts = idx.groupBy("block_key", "tok").agg(
        F.countDistinct("pub_id").alias("df")
    )
    block_idf = (
        df_counts.join(block_sizes, "block_key")
        .withColumn("idf", F.log((F.col("n_block") + 1.0) / F.col("df")))
        .select("block_key", "tok", "idf", "df")
    )
    tokens = (
        idx.select("block_key", "tok", "cluster_id")
        .distinct()
        .join(
            block_idf.where(
                F.col("df") <= config.max_token_df_per_block
            ).select("block_key", "tok", "idf"),
            ["block_key", "tok"],
        )
    )
    token_norms = tokens.groupBy("block_key", "cluster_id").agg(
        F.sqrt(F.sum(F.col("idf") * F.col("idf"))).alias("c_norm")
    )
    return {
        "authors": authors,
        "venues": venues,
        "tokens": tokens,
        "token_norms": token_norms,
        "block_idf": block_idf,
        "block_sizes": block_sizes,
    }


def score_against_clusters(
    new_pubs: DataFrame,
    profiles: dict[str, DataFrame],
    config: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """(block_key, pub_id, cluster_id, a, t, v, fused) for every
    candidate (new pub, cluster) pair that shares a coauthor, a venue,
    or at least one indexed token. Streaming-legal when ``new_pubs``
    is a stream (stream-static equi-joins + one hash agg per channel).
    """
    # A channel -------------------------------------------------------
    np_auth = new_pubs.select(
        "block_key", "pub_id", F.explode("authors").alias("author")
    ).distinct()
    a_chan = (
        np_auth.join(profiles["authors"], ["block_key", "author"])
        .select("block_key", "pub_id", "cluster_id")
        .distinct()
        .withColumn("a", F.lit(1.0))
    )
    # V channel -------------------------------------------------------
    v_chan = (
        new_pubs.select("block_key", "pub_id", "venue")
        .join(profiles["venues"], ["block_key", "venue"])
        .select("block_key", "pub_id", "cluster_id")
        .distinct()
        .withColumn("v", F.lit(1.0))
    )
    # T channel -------------------------------------------------------
    np_toks = new_pubs.select(
        "block_key", "pub_id", F.explode("title_toks").alias("tok")
    ).distinct()
    # snapshot idf for seen tokens; tokens hot-capped OUT of the
    # snapshot index are dropped here too (excluded from BOTH sides);
    # genuinely unseen tokens count in the pub norm at the block's
    # max idf, ln(n_block + 1) (df would be 1 next resolution at most
    # n_block -> idf in (0, ln(n_block+1)]; unseen = the ceiling)
    toks_idf = (
        np_toks.join(profiles["block_idf"], ["block_key", "tok"], "left")
        .where(
            F.col("df").isNull()
            | (F.col("df") <= config.max_token_df_per_block)
        )
        .join(profiles["block_sizes"], "block_key", "left")
        .withColumn(
            "idf",
            F.coalesce(
                F.col("idf"),
                F.log(F.coalesce(F.col("n_block"), F.lit(0.0)) + 1.0),
            ),
        )
    )
    p_norm = toks_idf.groupBy("block_key", "pub_id").agg(
        F.sqrt(F.sum(F.col("idf") * F.col("idf"))).alias("p_norm")
    )
    shared = (
        toks_idf.select("block_key", "pub_id", "tok", "idf")
        .join(
            profiles["tokens"].select("block_key", "tok", "cluster_id"),
            ["block_key", "tok"],
        )
        .groupBy("block_key", "pub_id", "cluster_id")
        .agg(F.sum(F.col("idf") * F.col("idf")).alias("shared_mass"))
    )
    t_chan = (
        shared.join(p_norm, ["block_key", "pub_id"])
        .join(profiles["token_norms"], ["block_key", "cluster_id"])
        .withColumn(
            "t",
            F.when(
                (F.col("p_norm") > 0) & (F.col("c_norm") > 0),
                F.col("shared_mass") / (F.col("p_norm") * F.col("c_norm")),
            ).otherwise(F.lit(0.0)),
        )
        .select("block_key", "pub_id", "cluster_id", "t")
    )
    # fuse -------------------------------------------------------------
    keys = ["block_key", "pub_id", "cluster_id"]
    cand = (
        a_chan.select(*keys)
        .unionByName(v_chan.select(*keys))
        .unionByName(t_chan.select(*keys))
        .distinct()
    )
    scored = (
        cand.join(a_chan, keys, "left")
        .join(v_chan, keys, "left")
        .join(t_chan, keys, "left")
        .fillna(0.0, subset=["a", "t", "v"])
        .withColumn(
            "fused",
            (
                config.w_coauthor * F.col("a")
                + config.w_title * F.col("t")
                + config.w_venue * F.col("v")
            )
            / config.weight_norm,
        )
    )
    return scored


def assign_to_clusters(
    new_pubs: DataFrame,
    clustered: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """One row per NEW pub: (block_key, pub_id, cluster_id, fused) —
    cluster_id NULL (and fused NULL) when no cluster clears
    ``config.assign_threshold``. Deterministic: ties on fused break
    toward the greatest cluster_id via max(struct(fused, cluster_id)).
    """
    scored = score_against_clusters(
        new_pubs, cluster_profiles(clustered, config), config
    )
    best = (
        scored.where(F.col("fused") >= config.assign_threshold)
        .groupBy("block_key", "pub_id")
        .agg(F.max(F.struct("fused", "cluster_id")).alias("_best"))
        .select(
            "block_key",
            "pub_id",
            F.col("_best.cluster_id").alias("cluster_id"),
            F.col("_best.fused").alias("fused"),
        )
    )
    return new_pubs.select("block_key", "pub_id").join(
        best, ["block_key", "pub_id"], "left"
    )
