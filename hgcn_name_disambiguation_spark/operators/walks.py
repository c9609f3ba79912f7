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
    sym = sym.localCheckpoint(eager=False)

    out = None
    for w in range(walks_per_node):
        cur = pubs.select(
            "block_key",
            F.concat_ws("#", F.col("pub_id"), F.lit(str(w))).alias("walk_id"),
            F.col("pub_id").alias("node"),
        )
        frames = [cur.withColumn("step", F.lit(0))]
        for s in range(walk_length):
            flag = _CHANNEL_FLAG[metapath[(w + s) % len(metapath)]]
            cand = cur.join(
                sym.where(F.col(flag) > 0).select(
                    F.col("block_key").alias("_bk"),
                    "src",
                    "dst",
                ),
                (cur["block_key"] == F.col("_bk"))
                & (cur["node"] == F.col("src")),
            ).select(
                cur["block_key"],
                "walk_id",
                F.col("dst"),
                _choice_key(
                    F.col("walk_id"), s + 1, F.col("dst"), hash_mode, seed
                ).alias("hkey"),
            )
            # each step frame is read twice (next hop + output union);
            # without truncation the union would recompute the whole
            # prior chain per frame — O(L^2) joins instead of O(L)
            cur = cand.groupBy("block_key", "walk_id").agg(
                F.expr("min_by(dst, struct(hkey, dst))").alias("node")
            ).localCheckpoint(eager=False)
            frames.append(cur.withColumn("step", F.lit(s + 1)))
        stepped = frames[0]
        for f in frames[1:]:
            stepped = stepped.unionByName(f)
        out = stepped if out is None else out.unionByName(stepped)
    return out.select("block_key", "walk_id", "step", "node")
