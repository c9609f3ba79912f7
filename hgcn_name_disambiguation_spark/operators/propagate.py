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
    # Round-6 second pass (guide §2.4): ALL channels ride one frame —
    # each (src, dst) edge row fans out to its positive channels via an
    # exploded literal array (the metapath_walks device), so the whole
    # fused propagation costs ONE degree aggregation, TWO dim joins,
    # ONE feature join and ONE final aggregation instead of
    # len(fusion) of each. Per-channel semantics are reproduced
    # row-by-row: the channel id is a data column, degrees aggregate
    # per (block, ch, src) over the same channel-filtered rows (sums
    # of integer-valued weights — exact in any order), and the fusion
    # weight is a per-row CASE yielding the same fw/total constant the
    # per-channel loop folded in.
    chs = list(fusion.keys())
    # edges is consumed by both direction halves — truncate its
    # lineage ONCE so the upstream scoring subtree isn't re-executed
    # per direction (the round-5 note measured 28s -> 17s when this
    # was 2 * len(fusion) consumers; it is 2 now)
    edges = edges.localCheckpoint(eager=False)
    feats = features.select(
        F.col("block_key").alias("_fbk"),
        F.col("pub_id").alias("_fid"),
        "token",
        F.col("w").alias("_fw"),
    )
    ch_entries = F.array(
        *[
            F.struct(F.lit(c).alias("ch"), F.col(c).alias("w"))
            for c in chs
        ]
    )
    sym = None
    for a, b in (
        (F.col("id_a"), F.col("id_b")),
        (F.col("id_b"), F.col("id_a")),
    ):
        half = edges.select(
            "block_key",
            a.alias("src"),
            b.alias("dst"),
            F.explode(
                F.filter(ch_entries, lambda e: e.getField("w") > 0)
            ).alias("e"),
        )
        sym = half if sym is None else sym.unionByName(half)
    sym = sym.select(
        "block_key",
        F.col("e.ch").alias("ch"),
        "src",
        "dst",
        F.col("e.w").alias("w"),
    )
    # degrees over REAL edges only (reference: D = rowsum(A)); the
    # inner joins are safe — every edge endpoint has d >= w > 0, and
    # 0-degree nodes have no edge rows at all (they enter only through
    # the unnormalized I term below, exactly cal_gcn_matrix's
    # D_[inf] = 0 handling).
    deg = sym.groupBy("block_key", "ch", "src").agg(F.sum("w").alias("d"))
    normed = (
        sym.join(deg, ["block_key", "ch", "src"])
        .join(
            deg.select(
                "block_key",
                "ch",
                F.col("src").alias("dst"),
                F.col("d").alias("d_dst"),
            ),
            ["block_key", "ch", "dst"],
        )
        .select(
            "block_key",
            "ch",
            "src",
            "dst",
            (F.col("w") / F.sqrt(F.col("d") * F.col("d_dst"))).alias("nw"),
        )
    )
    # the I term: unit self-contribution added AFTER normalization,
    # once per channel (the per-channel loop added one per channel)
    loops = pubs.select(
        "block_key",
        F.explode(F.array(*[F.lit(c) for c in chs])).alias("ch"),
        F.col("pub_id").alias("src"),
        F.col("pub_id").alias("dst"),
        F.lit(1.0).alias("nw"),
    )
    normed = normed.unionByName(loops)
    fw_col = F.when(
        F.col("ch") == chs[0], F.lit(fusion[chs[0]] / total)
    )
    for c in chs[1:]:
        fw_col = fw_col.when(F.col("ch") == c, F.lit(fusion[c] / total))
    contrib = normed.join(
        feats,
        (F.col("block_key") == F.col("_fbk"))
        & (F.col("dst") == F.col("_fid")),
    ).select(
        "block_key",
        F.col("src").alias("pub_id"),
        "token",
        (F.col("nw") * F.col("_fw") * fw_col).alias("v"),
    )
    return contrib.groupBy("block_key", "pub_id", "token").agg(
        F.sum("v").alias("value")
    )
