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

Semantics, per eligible block (sparse-evidence; all tiers carry at
least one live rule since round 5):

1. centroid = mean of member doc vectors (pubs without vectors don't
   contribute; clusters with no vectors never merge),
2. candidate merges = centroid pairs accepted by ANY of: flat
   cosine >= theta(tier); mutual-top1 + margin over both endpoints'
   second-best (round 5 — relative evidence, with a stricter margin
   when a singleton cluster is involved); amb-tier best member-pair
   cosine >= maxdoc_theta inside the [maxdoc_floor, theta) window
   (round 5). Rule rationale + measured sweep: config.py and the
   REFERENCE_EVAL.md round-5 addendum (0.8322 -> 0.8398 macro F1,
   zero blocks regressing),
3. focal-signature guard + closure: passing edges merge GREEDILY by
   descending cosine through a per-block union-find whose union step
   checks the two components' ACCUMULATED distinct signature sets —
   a union is applied only when every signature on one side is
   position-wise compatible with every signature on the other
   ("john a" never merges with "john w", not even transitively
   through a signature-less intermediate cluster). Plain transitive
   closure over pairwise-vetoed edges is NOT equivalent: clusters A
   ('john a') and C ('john w') would close through an intermediate B
   with empty/compatible signatures even though the direct A-C edge
   is vetoed — exactly the false-merge class the guard exists to
   prevent (round-5 fix).

Scale stance: every step is keyed by (block_key[, cluster]) — the
centroid agg is one map-side-combinable shuffle over (block, cluster,
component-pos); the candidate join is per-block clusters x clusters,
bounded by ``semantic_merge_max_clusters`` (blocks over the cap keep
their CC clusters unmerged; on the reference corpus every such block
is amb-tier and already theta-gated off). The union-find runs as one
Arrow-batched cogroup keyed by block_key over CLUSTER-level frames
(edges <= cap^2 per block, distinct signatures bounded by given-name
variants) — block-parallel, never dense in the number of pubs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig


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


def _py_sig_compatible(a, b) -> bool:
    """Python replica of name_constraints.sig_compatible: position-wise
    given-name compatibility (equal token, or an initial sharing the
    first letter; missing tail tokens match — Python zip truncates to
    the shorter array, same semantics as zip_with's null padding)."""
    if not len(a) or not len(b):
        return True
    for x, y in zip(a, b):
        if x == y:
            continue
        if (len(x) == 1 or len(y) == 1) and x[:1] == y[:1]:
            continue
        return False
    return True


def _merge_components(edges: pd.DataFrame, sigpd: pd.DataFrame) -> pd.DataFrame:
    """Per-block greedy merge closure (cogroup kernel).

    Edges (ca, cb, cos) are processed in descending-cosine order
    (ties broken by (ca, cb) for determinism) through a union-find;
    a union is applied only when the two components' accumulated
    distinct signature sets are pairwise compatible. The component
    representative is the minimum cluster_id — the same choice the
    previous connected-components closure made, so unconstrained
    blocks partition identically.
    """
    cols = ["block_key", "cluster_id", "_merged"]
    if edges.empty:
        return pd.DataFrame(columns=cols)
    bk = edges["block_key"].iloc[0]

    sig_of: dict[str, set[tuple]] = {}
    for cid, sig in zip(sigpd["cluster_id"], sigpd["sig"]):
        # pandas renders a missing list cell as a float NaN
        if sig is None or isinstance(sig, float):
            continue
        sig_of.setdefault(cid, set()).add(tuple(sig))

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    comp_sigs: dict[str, set[tuple]] = {}
    for _, e in edges.sort_values(
        ["cos", "ca", "cb"], ascending=[False, True, True]
    ).iterrows():
        ca, cb = e["ca"], e["cb"]
        for c in (ca, cb):
            if c not in parent:
                parent[c] = c
                comp_sigs[c] = set(sig_of.get(c, ()))
        ra, rb = find(ca), find(cb)
        if ra == rb:
            continue
        sa, sb = comp_sigs[ra], comp_sigs[rb]
        if all(
            _py_sig_compatible(a, b) for a in sa for b in sb
        ):
            parent[rb] = ra
            comp_sigs[ra] = sa | sb
            comp_sigs.pop(rb)

    groups: dict[str, list[str]] = {}
    for c in parent:
        groups.setdefault(find(c), []).append(c)
    rows = []
    for members_ in groups.values():
        rep = min(members_)
        for c in members_:
            rows.append((bk, c, rep))
    return pd.DataFrame(rows, columns=cols)


def _merge_mapping(
    clustered: DataFrame,
    doc_vecs: DataFrame,
    sigs: DataFrame,
    eligible: DataFrame,
    config: PipelineConfig,
) -> DataFrame:
    """One merge round: (block_key, cluster_id, _merged) for every
    cluster that appears in an ACCEPTED merge edge.

    Edge acceptance is the OR of three rules over centroid cosine
    (``eligible`` carries the per-block knobs: theta, mfloor,
    maxdoc_theta — a value > 1.0 disables that rule for the block):

      theta:  cos >= theta (round-4 flat rule).
      mutual: the two clusters are each other's top-1 partner, cos >=
              mfloor, and the margin over both endpoints' second-best
              clears semantic_merge_mutual_margin (the singleton
              variant when either side is smaller than
              semantic_merge_mutual_min_size). Relative evidence:
              absolute cosine scales differ per block, mutual-top1 +
              margin does not.
      maxdoc: cos in [semantic_merge_maxdoc_floor, theta) and the best
              MEMBER document pair clears maxdoc_theta.

    Scale notes: the mutual rule ranks the SAME per-block pair frame
    the theta rule already builds (two row_number windows keyed by
    (block, cluster) — no new shuffle volume, cap^2 bounded); the
    maxdoc member join fans out only pairs inside the [floor, theta)
    cosine window, each bounded by the two member counts.
    """
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
            eligible["mfloor"],
            eligible["maxdoc_theta"],
        )
    )

    # --- mutual-top1 + margin (windows over the symmetrized frame) ---
    from pyspark.sql import Window

    sym = pairs.select(
        "block_key", F.col("ca").alias("src"), F.col("cb").alias("dst"), "cos"
    ).unionByName(
        pairs.select(
            "block_key",
            F.col("cb").alias("src"),
            F.col("ca").alias("dst"),
            "cos",
        )
    )
    w = Window.partitionBy("block_key", "src").orderBy(
        F.desc("cos"), F.asc("dst")
    )
    ranked = sym.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= 2
    )
    top1 = ranked.where(F.col("rn") == 1).select(
        "block_key", "src", F.col("dst").alias("best")
    )
    # a block with exactly two centroided clusters has no second-best:
    # the replica convention (and the measured rule) treats the missing
    # top-2 as -2.0, i.e. the margin always clears
    top2 = ranked.where(F.col("rn") == 2).select(
        "block_key", "src", F.col("cos").alias("second")
    )
    sizes = members.groupBy("block_key", "cluster_id").agg(
        F.count("*").alias("sz")
    )

    cand = (
        pairs.join(
            top1.withColumnsRenamed({"src": "ca", "best": "_best_a"}),
            ["block_key", "ca"],
            "left",
        )
        .join(
            top1.withColumnsRenamed({"src": "cb", "best": "_best_b"}),
            ["block_key", "cb"],
            "left",
        )
        .join(
            top2.withColumnsRenamed({"src": "ca", "second": "_sec_a"}),
            ["block_key", "ca"],
            "left",
        )
        .join(
            top2.withColumnsRenamed({"src": "cb", "second": "_sec_b"}),
            ["block_key", "cb"],
            "left",
        )
        .join(
            sizes.withColumnsRenamed({"cluster_id": "ca", "sz": "_sz_a"}),
            ["block_key", "ca"],
        )
        .join(
            sizes.withColumnsRenamed({"cluster_id": "cb", "sz": "_sz_b"}),
            ["block_key", "cb"],
        )
    )

    # --- maxdoc (member-level best pair, [floor, theta) window only) ---
    ndocs = (
        members.join(
            doc_vecs.select("block_key", "pub_id", "vec"),
            ["block_key", "pub_id"],
        )
        .withColumn(
            "_n",
            F.sqrt(
                F.aggregate("vec", F.lit(0.0), lambda acc, x: acc + x * x)
            ),
        )
        .where(F.col("_n") > 0)
        .select(
            "block_key",
            "cluster_id",
            F.transform("vec", lambda x: x / F.col("_n")).alias("nvec"),
        )
    )
    md_window = pairs.where(
        (F.col("maxdoc_theta") <= 1.0)
        & (F.col("cos") < F.col("theta"))
        & (F.col("cos") >= F.lit(config.semantic_merge_maxdoc_floor))
    ).select("block_key", "ca", "cb")
    da = ndocs.withColumnsRenamed({"cluster_id": "ca", "nvec": "_va"})
    db = ndocs.withColumnsRenamed({"cluster_id": "cb", "nvec": "_vb"})
    maxdoc = (
        md_window.join(da, ["block_key", "ca"])
        .join(db, ["block_key", "cb"])
        .select(
            "block_key",
            "ca",
            "cb",
            F.aggregate(
                F.zip_with("_va", "_vb", lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("_dot"),
        )
        .groupBy("block_key", "ca", "cb")
        .agg(F.max("_dot").alias("_maxdoc"))
    )
    cand = cand.join(maxdoc, ["block_key", "ca", "cb"], "left")

    margin = F.col("cos") - F.greatest(
        F.coalesce(F.col("_sec_a"), F.lit(-2.0)),
        F.coalesce(F.col("_sec_b"), F.lit(-2.0)),
    )
    need_margin = F.when(
        (F.col("_sz_a") >= config.semantic_merge_mutual_min_size)
        & (F.col("_sz_b") >= config.semantic_merge_mutual_min_size),
        F.lit(config.semantic_merge_mutual_margin),
    ).otherwise(F.lit(config.semantic_merge_mutual_margin_singleton))
    accept = (
        (F.col("cos") >= F.col("theta"))
        | (
            (F.col("maxdoc_theta") <= 1.0)
            & (F.col("cos") >= F.lit(config.semantic_merge_maxdoc_floor))
            & (F.coalesce(F.col("_maxdoc"), F.lit(-2.0))
               >= F.col("maxdoc_theta"))
        )
        | (
            (F.col("cos") >= F.col("mfloor"))
            & (F.col("_best_a") == F.col("cb"))
            & (F.col("_best_b") == F.col("ca"))
            & (margin >= need_margin)
        )
    )
    edges = cand.where(accept).select("block_key", "ca", "cb", "cos")

    # distinct per-cluster signatures — the union-find's constraint
    # input (given-name variants bound rows far below member counts)
    csigs = (
        members.join(
            sigs.select("block_key", "pub_id", "sig"),
            ["block_key", "pub_id"],
        )
        .where(F.col("sig").isNotNull() & (F.size("sig") > 0))
        .select("block_key", "cluster_id", "sig")
        .dropDuplicates(["block_key", "cluster_id", "sig"])
    )

    # greedy by-cosine union-find with accumulated-signature checks,
    # one Arrow batch per block over cluster-level rows
    return (
        edges.groupBy("block_key")
        .cogroup(csigs.groupBy("block_key"))
        .applyInPandas(
            _merge_components,
            schema="block_key string, cluster_id string, _merged string",
        )
    )


def semantic_cluster_merge(
    clustered: DataFrame,
    doc_vecs: DataFrame,
    sigs: DataFrame,
    eligible: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Merge clusters of ``clustered`` (must carry block_key, pub_id,
    cluster_id; other columns pass through) until fixpoint, capped at
    ``config.semantic_merge_rounds`` rounds — centroids are recomputed
    after each merge pass, so clusters joined in round 1 present a
    sharper centroid to round 2 (measured: rafael alonso +0.155 F1
    from the second round alone).

    ``eligible``: (block_key, theta[, mfloor, maxdoc_theta]) — the
    blocks to consider and each block's rule knobs (callers derive
    them from tier + sparsity; missing columns default to "off", so a
    plain (block_key, theta) frame reproduces the round-4 flat-theta
    behavior). Returns ``clustered`` with ``cluster_id`` rewritten for
    merged clusters (representative = the component id,
    deterministic).
    """
    # eligible is block-level (tiny at any scale); materialize it so
    # its lineage — often shared with `clustered` via the traits frame
    # — can't alias-collide with the centroid self-join inside.
    for col, off in (("mfloor", 2.0), ("maxdoc_theta", 2.0)):
        if col not in eligible.columns:
            eligible = eligible.withColumn(col, F.lit(off))
    eligible = eligible.select(
        F.col("block_key").alias("_ebk"), "theta", "mfloor", "maxdoc_theta"
    ).localCheckpoint(eager=True)

    # doc_vecs' lineage embeds the tokenize/IDF/word2vec transform;
    # every mapping round reads it twice (centroids + the maxdoc
    # member join), so truncate it once — stored partitions, computed
    # on first use, reused by every later consumer.
    doc_vecs = doc_vecs.localCheckpoint(eager=False)

    # lazy-checkpoint the pub-level input: round 1's mapping job
    # materializes it, so round 2 (and the caller's final action)
    # re-reads stored partitions instead of recomputing the whole
    # upstream pipeline once per round — the same per-round lineage
    # truncation the CC loop uses.
    out = clustered.localCheckpoint(eager=False)
    live = eligible
    for _ in range(max(1, config.semantic_merge_rounds)):
        # the mapping is cluster-level (tiny); eager-checkpoint it so
        # the fixpoint probe below doesn't recompute the round and the
        # next round's lineage restarts from materialized rows
        mapping = _merge_mapping(
            out, doc_vecs, sigs, live, config
        ).localCheckpoint(eager=True)
        touched = mapping.where(
            F.col("cluster_id") != F.col("_merged")
        ).select(F.col("block_key").alias("_ebk")).distinct()
        if touched.isEmpty():
            break
        out = (
            out.join(mapping, ["block_key", "cluster_id"], "left")
            .withColumn(
                "cluster_id",
                F.coalesce(F.col("_merged"), F.col("cluster_id")),
            )
            .drop("_merged")
        )
        # a block with no accepted edge this round has identical
        # centroids/pairs next round and would map to the same empty
        # result — restrict the next pass to blocks that merged, so
        # round 2+ costs scale with the merge frontier, not the corpus
        live = live.join(touched, "_ebk", "semi").localCheckpoint(
            eager=True
        )
    return out
