"""Semantic cluster-level merge — the cc path's recall layer (round 4).

The cc pipeline's measured recall tail (REFERENCE_EVAL_GHAC.md) is
same-person publication groups with ZERO shared token/coauthor/venue/
org evidence: threshold + connected components can never join them.
Pair-level semantic rescue was measured marginal (0.8154 -> 0.8183,
round 3) because single-pair cosines are noisy; CLUSTER-level merging
— cosine of cluster centroid doc-vectors — averages that noise out and
was measured at 0.8154 -> 0.8240 macro F1 on the reference's 114
labeled blocks (tiered thresholds rare 0.6 / common 0.8 / amb off,
focal-signature guard; sweep in REFERENCE_EVAL_GHAC.md round-4
addendum).

Semantics, per eligible block (sparse-evidence, non-amb tier):

1. centroid = mean of member doc vectors (pubs without vectors don't
   contribute; clusters with no vectors never merge),
2. candidate merges = centroid pairs with cosine >= theta(tier),
3. focal-signature guard: a merge is vetoed when ANY member signature
   of one cluster is position-wise incompatible with ANY member
   signature of the other ("john a" never merges with "john w"),
4. the passing merge edges close transitively (connected components —
   a greedy by-cosine union-find yields the identical partition since
   constraints are evaluated pairwise before merging).

Scale stance: every step is keyed by (block_key[, cluster]) — the
centroid agg is one map-side-combinable shuffle over (block, cluster,
component-pos); the candidate join is per-block clusters x clusters,
bounded by ``semantic_merge_max_clusters`` (blocks over the cap keep
their CC clusters unmerged; on the reference corpus every such block
is amb-tier and already theta-gated off);
the sig-guard join runs over DISTINCT (cluster, signature) rows, which
given-name variants bound far below member counts. Nothing dense in
the number of pubs ever materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..operators.clustering import connected_components
from ..operators.name_constraints import sig_compatible

_SEP = "\x1f"


def _centroids(members: DataFrame, doc_vecs: DataFrame) -> DataFrame:
    """(block_key, cluster_id, cvec, cnorm) — mean member doc vector.

    posexplode + hash agg, same shape as semantic.document_vectors:
    JVM-side, shuffles on (block, cluster, pos) with map-side combine.
    """
    withvec = members.join(
        doc_vecs.select("block_key", "pub_id", "vec"),
        ["block_key", "pub_id"],
    )
    comp = withvec.select(
        "block_key",
        "cluster_id",
        F.posexplode("vec").alias("pos", "val"),
    )
    cent = (
        comp.groupBy("block_key", "cluster_id", "pos")
        .agg(F.avg("val").alias("cval"))
        .groupBy("block_key", "cluster_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "cval"))
            ).alias("_comps")
        )
        .select(
            "block_key",
            "cluster_id",
            F.transform(F.col("_comps"), lambda c: c["cval"]).alias("cvec"),
        )
        .withColumn(
            "cnorm",
            F.sqrt(
                F.aggregate(
                    "cvec", F.lit(0.0), lambda acc, x: acc + x * x
                )
            ),
        )
        .where(F.col("cnorm") > 0)
    )
    return cent


def semantic_cluster_merge(
    clustered: DataFrame,
    doc_vecs: DataFrame,
    sigs: DataFrame,
    eligible: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """One merge round over ``clustered`` (must carry block_key,
    pub_id, cluster_id; other columns pass through).

    ``eligible``: (block_key, theta) — the blocks to consider and each
    block's cosine threshold (callers derive it from tier + sparsity).
    Returns ``clustered`` with ``cluster_id`` rewritten for merged
    clusters (representative = the component id, deterministic).
    """
    # eligible is block-level (tiny at any scale); materialize it so
    # its lineage — often shared with `clustered` via the traits frame
    # — can't alias-collide with the centroid self-join below.
    eligible = eligible.select(
        F.col("block_key").alias("_ebk"), "theta"
    ).localCheckpoint(eager=True)
    members = clustered.join(
        F.broadcast(eligible),
        clustered["block_key"] == eligible["_ebk"],
        "left_semi",
    ).select("block_key", "pub_id", "cluster_id")

    # mega-block bound: blocks whose cluster count exceeds the cap
    # never enter the pair join (counted by the caller via eligible)
    counts = members.groupBy("block_key").agg(
        F.countDistinct("cluster_id").alias("_nc")
    )
    ok_blocks = counts.where(
        F.col("_nc") <= config.semantic_merge_max_clusters
    ).select("block_key")
    members = members.join(F.broadcast(ok_blocks), "block_key", "left_semi")

    cent = _centroids(members, doc_vecs).localCheckpoint(eager=False)

    a = cent.alias("a")
    b = cent.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col("a.cluster_id") < F.col("b.cluster_id")),
        )
        .join(
            F.broadcast(eligible),
            F.col("a.block_key") == eligible["_ebk"],
        )
        .select(
            F.col("a.block_key").alias("block_key"),
            F.col("a.cluster_id").alias("ca"),
            F.col("b.cluster_id").alias("cb"),
            (
                F.aggregate(
                    F.zip_with(
                        F.col("a.cvec"),
                        F.col("b.cvec"),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / (F.col("a.cnorm") * F.col("b.cnorm"))
            ).alias("cos"),
            eligible["theta"],
        )
        .where(F.col("cos") >= F.col("theta"))
        .drop("theta")
    )

    # focal-signature guard over DISTINCT cluster signatures
    csigs = (
        members.join(
            sigs.select("block_key", "pub_id", "sig"),
            ["block_key", "pub_id"],
        )
        .where(F.col("sig").isNotNull() & (F.size("sig") > 0))
        .select("block_key", "cluster_id", "sig")
        .dropDuplicates(["block_key", "cluster_id", "sig"])
        .localCheckpoint(eager=False)
    )
    sa = csigs.select(
        F.col("block_key").alias("_bk"),
        F.col("cluster_id").alias("ca"),
        F.col("sig").alias("_sa"),
    )
    sb = csigs.select(
        F.col("block_key").alias("_bk"),
        F.col("cluster_id").alias("cb"),
        F.col("sig").alias("_sb"),
    )
    vetoed = (
        pairs.join(
            sa,
            (pairs["block_key"] == sa["_bk"]) & (pairs["ca"] == sa["ca"]),
        )
        .join(
            sb,
            (pairs["block_key"] == sb["_bk"]) & (pairs["cb"] == sb["cb"]),
        )
        .where(~sig_compatible(F.col("_sa"), F.col("_sb")))
        .select("block_key", pairs["ca"], pairs["cb"])
        .distinct()
    )
    merges = pairs.join(
        vetoed, ["block_key", "ca", "cb"], "left_anti"
    ).select("block_key", "ca", "cb")

    node = lambda c: F.concat_ws(_SEP, F.col("block_key"), c)  # noqa: E731
    comp = connected_components(
        merges.select(node(F.col("ca")).alias("src"), node(F.col("cb")).alias("dst")),
        config=config,
    )
    mapping = comp.select(
        F.split_part(F.col("node"), F.lit(_SEP), F.lit(1)).alias("block_key"),
        F.split_part(F.col("node"), F.lit(_SEP), F.lit(2)).alias("cluster_id"),
        F.split_part(F.col("component"), F.lit(_SEP), F.lit(2)).alias(
            "_merged"
        ),
    )
    return (
        clustered.join(mapping, ["block_key", "cluster_id"], "left")
        .withColumn(
            "cluster_id", F.coalesce(F.col("_merged"), F.col("cluster_id"))
        )
        .drop("_merged")
    )
