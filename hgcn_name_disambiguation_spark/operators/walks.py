"""G1/G2: distributed metapath random-walk corpus generation.

Reference: ``name_disambiguation.py:480-532`` — per block it builds the
three relation graphs Ga (coauthor), Gt (title), Gv (venue)
(``:380-427``), then walks every node ``numwalks`` times for
``walklength`` steps, cycling the metapath ``[Ga, Gt, Ga, Gv]``
(``:487``) with the walk index rotating the metapath start
(``g_index = j``, ``:492``), sampling each next hop from the current
relation's weighted neighbor distribution. The walk corpus feeds its
skip-gram/GCN embedding (G3/G4 — not reproduced here; the reference's
own ``GCN.py:127-130`` dead-layer bug is documented in SURVEY §2).

Spark-first reformulation:
- One DataFrame job over ALL blocks/nodes/walks at once: each step is
  a typed-edge equi-join + per-walk argmin aggregation (map-side
  combinable, no windows, no Python). ``walk_length`` shuffles total,
  independent of corpus size — the iterative-join shape that survives
  a 100x scale-up.
- DETERMINISTIC next-hop: the reference's per-process RNG is not
  reproducible across partitions/retries, so the distributed variant
  picks ``argmin_{nbr} hash(seed, walk_id, step, nbr)`` — per-step
  uniform over the neighbor set (an unweighted DeepWalk-style step;
  the reference's alias tables add weight-proportional sampling, a
  documented delta), stable under any partitioning, retries, and AQE
  re-planning, and exactly replicable in SQL (the q36 DuckDB oracle).
- Dead ends: a walk with no neighbor in the current relation stops
  (emits no further rows); the reference instead emits negative
  samples and keeps cycling — negatives are a training-time concern
  and are out of scope for the walk corpus itself.

``hash_mode='md5'`` makes the choice function DuckDB-replicable;
``'xxhash64'`` is the cheaper production default (same algorithm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_CHANNEL_FLAG = {"A": "w_coauthor", "T": "w_title", "V": "w_venue"}


def _choice_key(walk_id, step: int, nbr, hash_mode: str, seed: int):
    s = F.concat_ws(
        ":", F.lit(str(seed)), walk_id, F.lit(str(step)), nbr
    )
    return F.md5(s) if hash_mode == "md5" else F.xxhash64(s)


def metapath_walks(
    pubs: DataFrame,
    edges: DataFrame,
    metapath: tuple[str, ...] = ("A", "T", "A", "V"),
    walk_length: int = 4,
    walks_per_node: int = 2,
    hash_mode: str = "xxhash64",
    seed: int = 42,
) -> DataFrame:
    """Walk corpus: (block_key, walk_id, step, node) rows.

    ``metapath`` entries are relation channels (A=coauthor, T=title
    with the >=2-token parity bound, V=venue); step s uses channel
    ``metapath[(w + s) % len]`` where w is the walk index — the
    reference's rotating start (``name_disambiguation.py:492-493``).
    Step 0 rows are the start nodes (every pub spawns
    ``walks_per_node`` walks).
    """
    sym = None
    for a, b in ((F.col("id_a"), F.col("id_b")), (F.col("id_b"), F.col("id_a"))):
        half = edges.select(
            "block_key",
            a.alias("src"),
            b.alias("dst"),
            *[F.col(f).alias(f) for f in set(_CHANNEL_FLAG.values())],
        )
        sym = half if sym is None else sym.unionByName(half)
    # consumed walk_length * walks_per_node times — truncate the
    # edge-scoring subtree once instead of re-executing it per step
    sym = sym.localCheckpoint(eager=True)

    # ALL walk indices ride one frame (the walk index is a data
    # column, not a DAG branch): walk_length joins total instead of
    # walk_length * walks_per_node — each step joins 2x the rows
    # through the same shuffle, which beats twice the stages at any
    # scale. The step's relation channel depends on the walk index
    # ((w + s) % len(metapath), the reference's rotating start), so
    # the channel is resolved per ROW: equi-join on (block, node),
    # then a CASE filter on the walk's channel flag for this step.
    path_arr = F.array(*[F.lit(c) for c in metapath])
    cur = pubs.crossJoin(
        F.broadcast(
            pubs.sparkSession.range(walks_per_node).select(
                F.col("id").cast("int").alias("_w")
            )
        )
    ).select(
        "block_key",
        F.concat_ws("#", F.col("pub_id"), F.col("_w")).alias("walk_id"),
        F.col("pub_id").alias("node"),
        "_w",
    )
    flag_of = {c: F.col(f) for c, f in _CHANNEL_FLAG.items()}
    frames = [cur.withColumn("step", F.lit(0))]
    for s in range(walk_length):
        ch = F.element_at(
            path_arr, ((F.col("_w") + s) % len(metapath)) + 1
        )
        chan_ok = F.lit(False)
        for c in dict.fromkeys(metapath):
            chan_ok = F.when(ch == c, flag_of[c] > 0).otherwise(chan_ok)
        cand = cur.join(
            sym.select(
                F.col("block_key").alias("_bk"),
                "src",
                "dst",
                *[F.col(f) for f in set(_CHANNEL_FLAG.values())],
            ),
            (cur["block_key"] == F.col("_bk"))
            & (cur["node"] == F.col("src")),
        ).where(chan_ok).select(
            cur["block_key"],
            "walk_id",
            "_w",
            F.col("dst"),
            _choice_key(
                F.col("walk_id"), s + 1, F.col("dst"), hash_mode, seed
            ).alias("hkey"),
        )
        # each step frame is read twice (next hop + output union), but
        # both reads land in ONE action, so Catalyst's ReuseExchange
        # dedupes the step's shuffle — no O(L^2) recompute. Per-step
        # localCheckpoint (separate jobs per step) measured 1.6x
        # SLOWER than this single-DAG form at sf0.1.
        cur = cand.groupBy("block_key", "walk_id", "_w").agg(
            F.expr("min_by(dst, struct(hkey, dst))").alias("node")
        )
        frames.append(cur.withColumn("step", F.lit(s + 1)))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select("block_key", "walk_id", "step", "node")


def bfs_negative_weights(
    edges: DataFrame,
    max_hops: int = 6,
) -> DataFrame:
    """G2: the negative-sampling distance weights, distributed.

    Reference (``name_disambiguation.py:447-474``, AMiner
    ``:1014-1028``): per block it runs networkx all-pairs Dijkstra on
    the combined graph and builds an n x n matrix where
    weight(u, v) = 0 for self and direct neighbors (dist <= 1),
    dist(u, v) for reachable pairs, 6 for unreachable — the negative-
    sample distribution "prefer nodes far from u".

    A dense n^2 matrix per block is exactly what dies at scale, so the
    distributed form returns the SPARSE part only: (block_key, src,
    dst, dist, neg_weight) for 2 <= dist <= max_hops, computed as
    iterative BFS frontier joins (unit weights make Dijkstra = BFS).
    Each hop is one equi-join + one anti-join against the known set —
    max_hops shuffles total. The unreachable mass (weight
    ``max_hops`` per the reference's unreachable -> 6 with
    max_hops = 6) is uniform, so a sampler needs only the per-node
    unreachable COUNT: n_block - |reachable <= max_hops| - 1 —
    derivable from this frame + block sizes without any n^2
    materialization. Documented delta: distances are capped at
    max_hops (pairs farther than max_hops hops fold into the
    unreachable mass; the reference keeps exact distances > 6 for the
    rare reachable-but-distant pair).
    """
    sym = None
    # ANY evidence connects for distance purposes — including 1-token
    # title pairs (title_cos > 0, w_title parity-gated to 0): distance
    # is about reachability in the evidence graph, and the weak links
    # are exactly what separates "2 hops away" from "unreachable"
    flags = [
        c
        for c in ("w_coauthor", "w_title", "w_venue", "title_cos")
        if c in edges.columns
    ]
    any_flag = None
    for c in flags:
        cond = F.col(c) > 0
        any_flag = cond if any_flag is None else (any_flag | cond)
    for a, b in ((F.col("id_a"), F.col("id_b")), (F.col("id_b"), F.col("id_a"))):
        half = edges.where(any_flag).select(
            "block_key", a.alias("src"), b.alias("dst")
        )
        sym = half if sym is None else sym.unionByName(half)
    sym = sym.distinct().localCheckpoint(eager=False)

    known = sym.withColumn("dist", F.lit(1))
    frontier = known
    for h in range(2, max_hops + 1):
        step = (
            frontier.alias("f")
            .join(
                sym.alias("s"),
                (F.col("f.block_key") == F.col("s.block_key"))
                & (F.col("f.dst") == F.col("s.src")),
            )
            .select(
                F.col("f.block_key").alias("block_key"),
                F.col("f.src").alias("src"),
                F.col("s.dst").alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        frontier = step.join(
            known.select("block_key", "src", "dst"),
            ["block_key", "src", "dst"],
            "left_anti",
        ).withColumn("dist", F.lit(h)).localCheckpoint(eager=False)
        known = known.unionByName(frontier)
    return known.where(F.col("dist") >= 2).select(
        "block_key",
        "src",
        "dst",
        "dist",
        F.col("dist").cast("double").alias("neg_weight"),
    )
