"""G4 (effective computation): fused graph feature propagation.

The reference trains a per-relation 2-layer GCN (``GCN.py:92-159``)
— but its own ``GCN.py:127-130`` assigns the LAYER-1 pre-relu fusion
to ``self.embed``, so the trained second layer never affects output:
what the model actually computes is ONE linear normalized-adjacency
propagation of the node features, fused 5/1/4 across relations
(``GCN.py:124``):

    out = (5 * norm(GA) @ X + 1 * norm(GT) @ X + 4 * norm(GV) @ X) / 10
    norm(G) = I + D^-1/2 A D^-1/2,  D = rowsum(A)

(exact ``cal_gcn_matrix`` parity, ``GCN.py:31-42``: the unit self-loop
is added AFTER normalization and the degree excludes self-loops;
0-degree rows map to 0, i.e. isolated nodes keep exactly their own
features through the I term)

This operator is that effective computation, distributed, over SPARSE
features (token -> weight maps, e.g. the per-block IDF title vectors
that replace the reference's word2vec means — SURVEY S7/A3). Dense
n x d per-block matrices are the reference's laptop ceiling; sparse
triplet frames keep every step a hash join/agg:

- per channel: symmetric weighted edges, degree agg (real edges
  only), 1/sqrt(d_u d_v) edge normalization (two broadcast-able dim
  joins against the degree frame), then the UNNORMALIZED unit
  self-loop rows unioned in (the reference's I term),
- propagate: join normalized edges with neighbor feature triplets,
  sum per (block, node, token) — map-side combinable,
- fuse: weighted union across channels, one final agg.

The trained-weights part of G4 (random init W, LINE loss, Adam) stays
not-ported by design — training is out of engine scope and the bug
above means those weights never reach the reference's output anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_FUSION = {"w_coauthor": 5.0, "w_title": 1.0, "w_venue": 4.0}


def feature_propagation(
    pubs: DataFrame,
    edges: DataFrame,
    features: DataFrame,
    fusion: dict[str, float] | None = None,
) -> DataFrame:
    """One fused normalized-adjacency propagation step.

    pubs:     (block_key, pub_id) — the node set (isolated nodes keep
              their own features through the self-loop).
    edges:    combined_edges output (w_coauthor/w_title/w_venue).
    features: (block_key, pub_id, token, w) sparse node features.
    Returns   (block_key, pub_id, token, value).
    """
    fusion = fusion or _FUSION
    total = sum(fusion.values())
    # edges is consumed twice per channel (both directions) and
    # features once per channel — truncate their lineage ONCE so the
    # upstream scoring subtree isn't re-executed 2 * len(fusion) times
    # (measured 28s -> 17s for the q38 shape at sf0.1)
    edges = edges.localCheckpoint(eager=False)
    feats = features.select(
        F.col("block_key").alias("_fbk"),
        F.col("pub_id").alias("_fid"),
        "token",
        F.col("w").alias("_fw"),
    ).localCheckpoint(eager=False)
    out = None
    for ch, fw in fusion.items():
        sym = None
        for a, b in (
            (F.col("id_a"), F.col("id_b")),
            (F.col("id_b"), F.col("id_a")),
        ):
            half = edges.where(F.col(ch) > 0).select(
                "block_key",
                a.alias("src"),
                b.alias("dst"),
                F.col(ch).alias("w"),
            )
            sym = half if sym is None else sym.unionByName(half)
        # degrees over REAL edges only (reference: D = rowsum(A)); the
        # inner joins are safe — every edge endpoint has d >= w > 0,
        # and 0-degree nodes have no edge rows at all (they enter only
        # through the unnormalized I term below, exactly cal_gcn_matrix's
        # D_[inf] = 0 handling).
        deg = sym.groupBy("block_key", "src").agg(F.sum("w").alias("d"))
        normed = (
            sym.join(deg, ["block_key", "src"])
            .join(
                deg.select(
                    "block_key",
                    F.col("src").alias("dst"),
                    F.col("d").alias("d_dst"),
                ),
                ["block_key", "dst"],
            )
            .select(
                "block_key",
                "src",
                "dst",
                (F.col("w") / F.sqrt(F.col("d") * F.col("d_dst"))).alias(
                    "nw"
                ),
            )
        )
        # the I term: unit self-contribution added AFTER normalization
        loops = pubs.select(
            "block_key",
            F.col("pub_id").alias("src"),
            F.col("pub_id").alias("dst"),
            F.lit(1.0).alias("nw"),
        )
        normed = normed.unionByName(loops)
        contrib = normed.join(
            feats,
            (F.col("block_key") == F.col("_fbk"))
            & (F.col("dst") == F.col("_fid")),
        ).select(
            "block_key",
            F.col("src").alias("pub_id"),
            "token",
            (F.col("nw") * F.col("_fw") * F.lit(fw / total)).alias("v"),
        )
        out = contrib if out is None else out.unionByName(contrib)
    return out.groupBy("block_key", "pub_id", "token").agg(
        F.sum("v").alias("value")
    )
