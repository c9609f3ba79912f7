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

Spark-first reformulation (round-6 optimized shape):
- The neighbor distribution of every node is aggregated ONCE into a
  dst-sorted adjacency array (one shuffle, degree-bounded by the
  hot-key caps), and each walk step is a single equi-join against that
  array followed by NARROW array folds — no per-step window sort, no
  per-step aggregation. ``walk_length`` joins total, independent of
  corpus size; when the adjacency fits the broadcast cap the steps add
  ZERO exchanges (data-adaptive hint, never a hard-coded local[n]
  assumption).
- DETERMINISTIC WEIGHT-PROPORTIONAL next-hop: the reference draws the
  next node weight-proportionally from per-node alias tables
  (``name_disambiguation.py:996-1058``); a per-process RNG is not
  reproducible across partitions/retries, so the distributed variant
  replaces the alias draw with a cumulative-threshold draw — per
  (walk, step) a hash-derived uniform u = hex6(md5(seed:walk:step)) /
  16^6 picks the first neighbor in dst order whose running weight sum
  crosses u * total. Same distribution as the alias table (P(nbr) =
  w_nbr / sum w), stable under any partitioning, retries, and AQE
  re-planning, and exactly replicable in SQL (the q36 DuckDB oracle):
  the draw uses only IEEE +, *, and comparisons in a FIXED dst order —
  the array fold adds the same doubles in the same sequence the
  round-5 window formulation did, so results are bit-identical.
- Dead ends: a walk with no neighbor in the current relation stops
  (emits no further rows); the reference instead emits negative
  samples and keeps cycling — negatives are a training-time concern
  and are out of scope for the walk corpus itself.

``hash_mode='md5'`` makes the choice function DuckDB-replicable;
``'xxhash64'`` is the cheaper production default (same algorithm).
"""

from __future__ import annotations


from pyspark.sql import Column, DataFrame, functions as F

_CHANNEL_FLAG = {"A": "w_coauthor", "T": "w_title", "V": "w_venue"}

_U_DENOM = 16 ** 6  # 24-bit uniform granularity; max u = 1 - 2^-24


from .util import adaptive_broadcast as _adaptive_broadcast


def _step_uniform(walk_id, step: int, hash_mode: str, seed: int):
    """Deterministic uniform in [0, 1) per (walk, step) — the draw
    threshold of the weighted hop. md5 mode: first 6 hex chars as an
    integer (exactly replicable in DuckDB via per-char arithmetic);
    xxhash64 mode: the cheaper production default, same construction
    over the 64-bit hash."""
    s = F.concat_ws(":", F.lit(str(seed)), walk_id, F.lit(str(step)))
    if hash_mode == "md5":
        x = F.conv(F.substring(F.md5(s), 1, 6), 16, 10).cast("double")
    else:
        x = F.pmod(F.xxhash64(s), F.lit(_U_DENOM)).cast("double")
    return x / F.lit(float(_U_DENOM))


def _prefix_pick(nbrs: Column, u: Column) -> Column:
    """First neighbor in array order whose PRECOMPUTED running weight
    sum crosses ``u * total`` — the deterministic cumulative-threshold
    draw over a channel-filtered adjacency array of (dst, cum) entries
    (built once, in dst order, by a window at aggregation time).

    total = the last entry's prefix sum (weights are strictly
    positive, so the cumulative sum is strictly increasing and the
    final entry carries the full sum). The qualifying set
    {cum > u * total} is a suffix in dst order, so its FIRST element
    is exactly the round-5 window formulation's MIN(dst) crossing —
    bit-identical, because the prefix sums were accumulated over the
    same filtered rows in the same dst order with the same IEEE
    additions. Returns NULL when no entry qualifies (dead walk /
    empty channel — F.get is null-safe on empty/short arrays).

    Everything here is O(degree) per row with ONE field compare per
    element — no nested aggregate is ever re-evaluated per element
    (an aggregate-inside-aggregate formulation measured 15s/step at
    sf0.1; a fat multi-channel struct with CASE per element measured
    ~7x this form)."""
    tot = F.get(nbrs, F.size(nbrs) - 1).getField("cum")
    thr = u * tot
    hit = F.filter(nbrs, lambda e: e.getField("cum") > thr)
    return F.get(hit, 0).getField("dst")


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
    ``walks_per_node`` walks). Each hop is drawn WEIGHT-PROPORTIONALLY
    from the current channel's neighbor weights (the reference's alias
    sampling, ``name_disambiguation.py:996-1058``), deterministically:
    hash-uniform threshold into the ordered cumulative weight sum.

    Round-6 shape: the symmetric weighted adjacency is aggregated once
    into per-node dst-sorted arrays (degree-bounded by the hot-key
    caps) and checkpointed; each step is then ONE equi-join + narrow
    array folds. vs the round-5 window form this removes the per-step
    window sort AND the per-step argmin aggregation (3 exchanges/step
    -> at most 1), and the adjacency exchange is shared by all steps.
    Measured at sf0.1: q36 16.0s -> 7.3s, identical output.
    """
    sym = None
    wcols = list(dict.fromkeys(_CHANNEL_FLAG.values()))
    for a, b in ((F.col("id_a"), F.col("id_b")), (F.col("id_b"), F.col("id_a"))):
        half = edges.select(
            "block_key",
            a.alias("src"),
            b.alias("dst"),
            *[F.col(f).alias(f) for f in wcols],
        )
        sym = half if sym is None else sym.unionByName(half)
    # Per-node, PER-CHANNEL adjacency arrays, sorted by dst (struct
    # sort: dst is the first field and unique per (src, channel), so
    # array order == the round-5 window's ORDER BY dst), each entry
    # carrying its PRE-COMPUTED running weight sum. The prefix sums
    # are accumulated by one window over the channel-filtered rows in
    # the same dst order the round-5 per-step window used, so every
    # partial sum is IEEE-identical. Built + materialized ONCE — the
    # walk consumes it walk_length times, and the (possibly expensive)
    # edge subtree is never re-executed per step. Keeping one array
    # per channel makes the per-element step predicate a single
    # compare on a 2-field struct (the fat one-array variant measured
    # ~7x slower per step: interpreted HOF lambdas pay per node
    # visited).
    from pyspark.sql import Window as _W

    channels = list(dict.fromkeys(metapath))
    # one (src, dst) row fans out to its positive channels via an
    # exploded literal array — NOT per-channel where() branches, which
    # would push different filters into the caller's edge subtree and
    # defeat exchange reuse (measured: the whole candidate-pair build
    # re-executed once per channel per direction)
    ch_entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("ch"),
                F.col(_CHANNEL_FLAG[c]).alias("w"),
            )
            for c in channels
        ]
    )
    by_ch = sym.select(
        "block_key",
        "src",
        "dst",
        F.explode(
            F.filter(ch_entries, lambda e: e.getField("w") > 0)
        ).alias("e"),
    ).select(
        "block_key",
        "src",
        "dst",
        F.col("e.w").alias("w"),
        F.col("e.ch").alias("ch"),
    )
    # ONE window pass partitioned by (block_key, src) — the SAME key
    # the groupBy below clusters on, so the aggregation reuses the
    # window's exchange (2 exchanges -> 1). Ordering by (ch, dst)
    # keeps each channel's rows in dst order; the per-channel
    # conditional running sums skip other channels' rows (sum ignores
    # NULL), so every prefix sum is the channel-filtered dst-ordered
    # accumulation, IEEE-identical to the round-5 per-step window.
    wcum = _W.partitionBy("block_key", "src").orderBy("ch", "dst")
    with_cum = by_ch.select(
        "block_key",
        "src",
        "dst",
        "ch",
        *[
            F.sum(
                F.when(F.col("ch") == c, F.col("w"))
            ).over(wcum).alias(f"cum_{c}")
            for c in channels
        ],
    )
    cum_of_row = F.when(
        F.col("ch") == channels[0], F.col(f"cum_{channels[0]}")
    )
    for c in channels[1:]:
        cum_of_row = cum_of_row.when(F.col("ch") == c, F.col(f"cum_{c}"))
    adj = (
        with_cum.withColumn("cum", cum_of_row)
        .groupBy("block_key", "src")
        .agg(
            *[
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("ch") == c, F.struct("dst", "cum")
                        )
                    )
                ).alias(f"nbrs_{c}")
                for c in channels
            ]
        )
        .localCheckpoint(eager=True)
    )
    adj = _adaptive_broadcast(adj, adj.count())

    # ALL walk indices ride one frame (the walk index is a data
    # column, not a DAG branch): the step's relation channel depends on
    # the walk index ((w + s) % len(metapath), the reference's rotating
    # start), so the channel is resolved per ROW inside the fold.
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
    # The per-step work (hash draw + array scan) is CPU-bound and the
    # broadcast join PRESERVES the stream side's partitioning — a
    # small parquet start frame (1 scan partition) would serialize
    # every step onto one task. Widen ONLY when under-parallel (the
    # brute_force_topk pattern): at real scale the frame already has
    # >= defaultParallelism partitions and this adds no Exchange.
    # (partition probe on the scan-only pubs plan: cur is a broadcast
    # cross join of pubs, so it inherits pubs' partitioning)
    par = pubs.sparkSession.sparkContext.defaultParallelism
    if pubs.rdd.getNumPartitions() < par:
        cur = cur.repartition(par)
    frames = [cur.withColumn("step", F.lit(0))]
    for s in range(walk_length):
        ch = F.element_at(
            path_arr, ((F.col("_w") + s) % len(metapath)) + 1
        )

        # the walk's channel for this step selects which pre-filtered
        # array to draw from — one row-level CASE, then a single-field
        # compare per array element inside the pick
        arr = F.when(ch == channels[0], F.col(f"nbrs_{channels[0]}"))
        for c in channels[1:]:
            arr = arr.when(ch == c, F.col(f"nbrs_{c}"))

        u = _step_uniform(F.col("walk_id"), s + 1, hash_mode, seed)
        cur = (
            cur.join(
                adj.select(
                    F.col("block_key").alias("_bk"),
                    F.col("src").alias("_src"),
                    *[f"nbrs_{c}" for c in channels],
                ),
                (cur["block_key"] == F.col("_bk"))
                & (cur["node"] == F.col("_src")),
            )
            .select(
                cur["block_key"],
                "walk_id",
                "_w",
                _prefix_pick(arr, u).alias("node"),
            )
            # a walk with no neighbor in this step's channel stops here
            .where(F.col("node").isNotNull())
            # plan barrier: without it the optimizer inlines the pick
            # expression behind `node` into the NEXT step's join key,
            # filter, and output projection, and the expression tree
            # grows multiplicatively per step. persist() (not
            # localCheckpoint) because it stays fully lazy — a lazy
            # localCheckpoint still runs doExecute at construction,
            # which under AQE materializes every query stage
            # synchronously on the driver (measured ~2s/step of
            # construction wall); the InMemoryRelation barrier defers
            # everything to the action while still stopping the
            # optimizer from rewriting through it. The step frame is
            # one narrow row per live walk, so the cache is tiny.
            .persist()
        )
        frames.append(cur.withColumn("step", F.lit(s + 1)))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select("block_key", "walk_id", "step", "node")


# the reference's training constants (name_disambiguation.py:1064-1066)
REF_NUMWALKS = 4
REF_WALKLENGTH = 10
REF_NEGATIVE_NUM = 3


def walk_training_pairs(
    walks: DataFrame,
    neg_weights: DataFrame,
    walk_length: int,
    negatives_per_pos: int = REF_NEGATIVE_NUM,
    window: int = 2,
    hash_mode: str = "xxhash64",
    seed: int = 42,
) -> DataFrame:
    """G3: the reference's skip-gram training triples (u_i, u_j, label)
    from the walk corpus + the G2 distance distribution.

    Reference (``name_disambiguation.py:1064-1127``): while walking,
    each step emits (current, next, +1) and a window-2 peek positive,
    each followed by ``negative_num`` negatives drawn
    distance-proportionally from the G2 matrix (self/dist<=1 weight 0,
    unreachable 6); a stuck walk emits one negative batch and breaks.
    Constants there: numwalks=4, walklength=10, negative_num=3
    (REF_NUMWALKS/REF_WALKLENGTH/REF_NEGATIVE_NUM).

    Distributed re-expression over the REALIZED walk corpus:

    - positives: window self-join of the walk frame — (node@s,
      node@s+d, +1) for d in 1..window. Documented delta: the
      reference's window-2 positive is an independent peek draw from
      the next node's next-channel distribution; the realized s+2 node
      is a sample from exactly that distribution (same support, same
      probabilities), so the corpus is distribution-identical.
    - negatives: ``negatives_per_pos`` per positive, drawn from the
      caller's ``neg_weights`` frame ((block_key, src, dst,
      neg_weight) — ``bfs_negative_weights`` output) with the same
      deterministic cumulative-threshold draw as the walk hop:
      u = hash(seed:walk:step:win:k), first dst in order whose
      running neg_weight sum crosses u * total. Nodes absent from the
      frame emit no negatives (the reference skips sampler==0 nodes
      the same way). Round-6 shape: the per-node distance distribution
      is aggregated once into a dst-sorted array and each draw is ONE
      join row + a narrow fold — the round-5 form materialized
      |draws| x |dist-neighborhood| rows (33M at sf0.1) through a
      window + re-aggregation; the fold emits one row per draw.
    - stuck walks (last emitted step < walk_length): one negative
      batch keyed win=0, matching the reference's stuck branch.

    Returns (block_key, walk_id, step, win, k, u_i, u_j, label) —
    win = skip-gram distance (0 for stuck-batch negatives), k = the
    negative draw index (0 for positives), label = +1/-1. One shuffle
    per window offset + one per negative draw join; nothing is ever
    per-block dense.
    """
    # the corpus is consumed 4x (two window offsets, the successor
    # probe, the stuck anti-join): materialize it ONCE — without this
    # the whole iterative walk DAG re-executes per consumer (measured
    # 75s -> ~40s for the q49 shape at sf0.1)
    w = walks.select(
        "block_key", "walk_id", "step", "node"
    ).localCheckpoint(eager=True)
    # positives: window self-join (equi-join on the walk key + step
    # arithmetic — a shuffle on (block, walk_id), never all-pairs).
    # All window offsets fold into ONE join: the step-shifted frames
    # union first (join distributes over union, so the output rows
    # are identical to per-offset joins), costing one shuffle of the
    # (window x) shifted frame instead of `window` shuffles of each
    # side (round-5 fold, VERDICT r4 ask #7).
    shifted = None
    for d in range(1, window + 1):
        s = w.select(
            "block_key",
            "walk_id",
            (F.col("step") - d).alias("step"),
            F.col("node").alias("u_j"),
            F.lit(d).alias("win"),
        )
        shifted = s if shifted is None else shifted.unionByName(s)
    pos = (
        w.alias("a")
        .join(shifted.alias("b"), ["block_key", "walk_id", "step"])
        .select(
            "block_key",
            "walk_id",
            "step",
            "win",
            F.col("a.node").alias("u_i"),
            "u_j",
        )
        .localCheckpoint(eager=False)
    )

    # stuck-walk anchors: last emitted step with no successor before
    # walk_length (the reference's "no forward path" branch)
    nxt = w.select(
        "block_key", "walk_id", (F.col("step") - 1).alias("step")
    )
    stuck = (
        w.where(F.col("step") < walk_length)
        .join(nxt, ["block_key", "walk_id", "step"], "left_anti")
        .select(
            "block_key",
            "walk_id",
            "step",
            F.lit(0).alias("win"),
            F.col("node").alias("u_i"),
        )
    )

    # negative draws: one row per (anchor, k); the anchor joins its
    # node's pre-aggregated dst-sorted distance array and a narrow
    # fold picks the cumulative crossing — per-anchor candidate sets
    # are the sparse dist<=max neighborhoods, degree-bounded, and the
    # join emits ONE row per draw (the round-5 window form emitted one
    # row per (draw, candidate) and re-aggregated them).
    anchors = pos.select(
        "block_key", "walk_id", "step", "win", "u_i"
    ).unionByName(stuck)
    ks = walks.sparkSession.range(negatives_per_pos).select(
        F.col("id").cast("int").alias("k")
    )
    drawn = anchors.crossJoin(F.broadcast(ks)).withColumn(
        "u",
        _step_uniform(
            F.concat_ws(
                ":",
                F.col("walk_id"),
                F.col("step"),
                F.col("win"),
                F.col("k"),
            ),
            0,
            hash_mode,
            seed,
        ),
    )
    from pyspark.sql import Window as _W

    ncum = _W.partitionBy("block_key", "src").orderBy("dst")
    nadj = (
        neg_weights.select(
            "block_key",
            "src",
            "dst",
            "neg_weight",
            F.sum("neg_weight").over(ncum).alias("cum"),
        )
        .groupBy("block_key", "src")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dst", "cum"))
            ).alias("nbrs")
        )
        .localCheckpoint(eager=True)
    )
    nadj = _adaptive_broadcast(nadj, nadj.count())
    neg = (
        drawn.join(
            nadj,
            (drawn["block_key"] == nadj["block_key"])
            & (drawn["u_i"] == nadj["src"]),
        )
        .select(
            drawn["block_key"],
            "walk_id",
            "step",
            "win",
            "k",
            "u_i",
            _prefix_pick(F.col("nbrs"), F.col("u")).alias("u_j"),
        )
        .where(F.col("u_j").isNotNull())
    )

    out = pos.select(
        "block_key",
        "walk_id",
        "step",
        "win",
        F.lit(0).alias("k"),
        "u_i",
        "u_j",
        F.lit(1).alias("label"),
    ).unionByName(
        neg.select(
            "block_key",
            "walk_id",
            "step",
            "win",
            "k",
            "u_i",
            "u_j",
            F.lit(-1).alias("label"),
        )
    )
    return out


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
    Each hop is one equi-join + dedup + one anti-join against the
    known set — max_hops shuffles total. The unreachable mass (weight
    ``max_hops`` per the reference's unreachable -> 6 with
    max_hops = 6) is uniform, so a sampler needs only the per-node
    unreachable COUNT: n_block - |reachable <= max_hops| - 1 —
    derivable from this frame + block sizes without any n^2
    materialization. Documented delta: distances are capped at
    max_hops (pairs farther than max_hops hops fold into the
    unreachable mass; the reference keeps exact distances > 6 for the
    rare reachable-but-distant pair).

    Round-6 shape (guide §2.3 "shuffle fewer bytes", §2.4): the hop
    expansion emits |paths| = sum deg^2 rows (25.8M at sf0.1), and the
    round-5 form deduplicated them as (block_key, src, dst) STRING
    triples — the hash aggregate on wide string keys was 70% of q37.
    Now every (block, node) is mapped once through an integer
    dictionary (internal ids only; outputs translate back), the hop
    set is halved to canonical src < dst pairs before the dedup (an
    undirected path always has its mirror, so nothing is lost and the
    mirror is restored after), and the dedup runs on two longs — the
    codegen fast-path. Translation joins touch only the node
    dictionary and the final sparse output, never the path volume.
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
    # ONE materialization of the (possibly expensive) edge subtree;
    # the dictionary, the translated edges and every hop derive from
    # this cached frame (a per-derived-frame checkpoint re-executed
    # the edge build once per checkpoint — measured 2x at sf0.1).
    sym = sym.distinct().localCheckpoint(eager=True)
    n_sym = sym.count()

    # integer node dictionary — ids are run-internal (pinned by the
    # eager checkpoint; monotonically_increasing_id is injective by
    # construction), the output is translated back to the caller's
    # string ids, so no ordering property is required of them.
    nodes = (
        sym.select("block_key", F.col("src").alias("node"))
        .distinct()
        .withColumn("nid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    nodes = _adaptive_broadcast(nodes, nodes.count())
    # not checkpointed: two broadcast-dictionary joins over the cached
    # sym are narrow and cheap to replay per consumer; the broadcast
    # hint (bounded by sym's measured count) keeps each hop join
    # exchange-free when the graph fits
    sym_int = (
        sym.join(
            nodes.select(
                "block_key", F.col("node").alias("src"), F.col("nid").alias("s")
            ),
            ["block_key", "src"],
        )
        .join(
            nodes.select(
                "block_key", F.col("node").alias("dst"), F.col("nid").alias("d")
            ),
            ["block_key", "dst"],
        )
        .select("s", "d")
    )
    sym_int = _adaptive_broadcast(sym_int, n_sym)

    # canonical (s < d) known set; frontier stays directional for the
    # expansion join, mirrored from the canonical rows (narrow union).
    known_c = sym_int.where(F.col("s") < F.col("d")).withColumn(
        "dist", F.lit(1)
    )
    frontier_dir = sym_int
    for h in range(2, max_hops + 1):
        step = (
            frontier_dir.alias("f")
            .join(sym_int.alias("x"), F.col("f.d") == F.col("x.s"))
            .select(F.col("f.s").alias("s"), F.col("x.d").alias("d"))
            # canonical halving BEFORE the dedup: the mirror path
            # (d .. s) always exists in the undirected expansion, so
            # keeping s < d loses nothing and halves the hash-agg input
            .where(F.col("s") < F.col("d"))
            .distinct()
        )
        frontier_c = (
            step.join(
                known_c.select("s", "d"), ["s", "d"], "left_anti"
            )
            .withColumn("dist", F.lit(h))
            .localCheckpoint(eager=False)
        )
        known_c = known_c.unionByName(frontier_c)
        frontier_dir = frontier_c.select("s", "d").unionByName(
            frontier_c.select(F.col("d").alias("s"), F.col("s").alias("d"))
        )

    # restore the mirror rows, then translate ids back to the caller's
    # (block_key, string) node names — both joins touch only the
    # sparse dist>=2 output and the node dictionary.
    out_c = known_c.where(F.col("dist") >= 2)
    out_int = out_c.unionByName(
        out_c.select(
            F.col("d").alias("s"), F.col("s").alias("d"), "dist"
        )
    )
    return (
        out_int.join(
            nodes.select(
                F.col("nid").alias("s"),
                F.col("block_key").alias("block_key"),
                F.col("node").alias("src"),
            ),
            "s",
        )
        .join(
            nodes.select(
                F.col("nid").alias("d"), F.col("node").alias("dst")
            ),
            "d",
        )
        .select(
            "block_key",
            "src",
            "dst",
            "dist",
            F.col("dist").cast("double").alias("neg_weight"),
        )
    )
