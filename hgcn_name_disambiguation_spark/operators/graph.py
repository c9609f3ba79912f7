"""Global graph metrics over the sparse per-block evidence graph.

The reference materializes one dense adjacency per name block and
walks it (``name_disambiguation.py:978-988``); these operators consume
the same ``combined_edges`` frame sparsely — the adjacency is only
ever an edge list, work per round is O(|E|). PageRank itself is
additive engine capability (the reference has no global-importance
metric): the standard graph-analytics primitive a user would expect
next to the BFS / walk / triangle operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F



def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 1_000_000,
    block_col: str = "block_key",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Fixed-iteration PageRank over the undirected per-block graph in
    EXACT integer arithmetic.

    Every quantity is an integer micro-unit: ranks start at ``scale``,
    the teleport term is ``(scale * (den - num)) div den``, and each
    neighbor contribution is ``(num * rank) div (den * deg)`` — floor
    division end to end. No float ever enters the update, so the
    result is bit-identical across engines, partitionings, and
    summation orders: the q50/q59 integer micro-nat pattern applied to
    an iterative fixpoint (a float PageRank would drift per-ulp with
    shuffle order and never hash-match a second engine).

    Shape per iteration: ONE equi-join of the rank frame to the
    degree-annotated adjacency + ONE sum agg — ``iterations`` shuffle
    rounds total, fixed and data-independent, the same bounded-stage
    contract as the BFS operator (``walks.bfs_negative_weights``).
    Lineage is truncated every few rounds (lazy localCheckpoint) so a
    deep run still keeps a bounded plan. Undirected semantics: each
    input pair contributes in both directions; ``deg`` = neighbor
    count; every endpoint of the edge frame is a node (deg >= 1, so no
    dangling-mass term).

    Returns (block_col, node_id, deg, rank_micro) — integers only.
    """
    sym = edges.select(
        block_col, F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).unionByName(
        edges.select(
            block_col, F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
        )
    )
    deg = sym.groupBy(block_col, "src").agg(F.count(F.lit(1)).alias("deg"))
    # The adjacency is consumed `iterations` times and the caller's
    # edge frame may carry an arbitrarily expensive lineage (here: the
    # candidate-pair build) — materialize it ONCE; every iteration then
    # joins a shallow checkpointed frame instead of replaying the edge
    # DAG (measured 28s -> ~3s for 3 iterations at sf0.1).
    adj = sym.join(deg, [block_col, "src"]).localCheckpoint()
    deg = adj.select(block_col, "src", "deg").groupBy(block_col, "src").agg(
        F.first("deg").alias("deg")
    )
    nodes = deg.select(block_col, F.col("src").alias("node"))

    teleport = (scale * (damping_den - damping_num)) // damping_den
    ranks = nodes.select(
        block_col, "node", F.lit(scale).cast("long").alias("rank_micro")
    )
    contrib_expr = F.expr(
        f"(CAST({damping_num} AS BIGINT) * rank_micro)"
        f" div (CAST({damping_den} AS BIGINT) * deg)"
    )
    # Iterations CHAIN inside one plan (round-6): every round's join
    # reads the adjacency through a canonically identical exchange, so
    # ReuseExchange shuffles adj ONCE for all rounds — a per-round
    # localCheckpoint compiled a separate plan per round and re-
    # shuffled adj each time. Lineage is truncated every
    # `checkpoint_every` rounds so a deep fixed-iteration run still
    # keeps a bounded plan; integer updates make all of this
    # value-neutral.
    checkpoint_every = 5
    for i in range(iterations):
        contrib = (
            adj.join(
                ranks.select(
                    block_col, F.col("node").alias("src"), "rank_micro"
                ),
                [block_col, "src"],
            )
            .select(
                block_col,
                F.col("dst").alias("node"),
                contrib_expr.alias("c"),
            )
            .groupBy(block_col, "node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = nodes.join(contrib, [block_col, "node"], "left").select(
            block_col,
            "node",
            (F.lit(teleport) + F.coalesce(F.col("c"), F.lit(0)))
            .cast("long")
            .alias("rank_micro"),
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.join(
        deg.select(block_col, F.col("src").alias("node"), "deg"),
        [block_col, "node"],
    ).select(
        block_col,
        F.col("node").alias("node_id"),
        F.col("deg").cast("int").alias("deg"),
        "rank_micro",
    )
