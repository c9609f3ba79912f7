"""Similarity search over an embedding column (ARRAY<FLOAT>).

- brute_force_topk: exact cosine top-k, query-set x corpus join +
  per-query window. The correctness baseline; cost Q x N — fine when
  the query set is small or broadcastable, the oracle for everything
  else.
- lsh_topk: random-hyperplane LSH-bucketed approximate top-k — the
  100-TB path: candidates share >= 1 of `num_tables` bucket keys, so
  the join is equi on (table, bucket), never all-pairs.
- ivf_topk: IVF-style coarse quantization — k-means-free variant using
  deterministic seeded centroids drawn from the corpus itself; each
  vector is assigned to its nearest centroid (one pass, built-ins) and
  queries probe `nprobe` nearest cells.

All dot products/norms are `zip_with` + `aggregate` higher-order
functions — JVM-side, no Python. A vectorized pandas-UDF variant
(numpy matmul per Arrow batch) is provided for wide-batch rescoring
(`cosine_rescore_udf`) where HOF per-element overhead dominates.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F, types as T


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


@F.pandas_udf(T.DoubleType())
def cosine_rescore_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched numpy cosine — one matmul-shaped op per batch for
    hot rescoring loops (10-100x the HOF path on wide vectors)."""
    import numpy as np

    av = np.stack(a.values)
    bv = np.stack(b.values)
    num = (av * bv).sum(axis=1)
    den = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(den > 0, num / den, 0.0)
    return pd.Series(out)


def allpairs_cosine_blocked(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    num_blocks: int | None = None,
    round_to: int | None = None,
    rows_per_block: int = 4096,
) -> DataFrame:
    """EXACT all-pairs cosine >= threshold via block-matrix self-join.

    The scalable form of the O(n^2) similarity scan (reference's dense
    sim matrix, ``name_disambiguation.py:579-592`` — single machine,
    dense N x N): partition rows into B deterministic hash blocks, emit
    each row to the B block-pair groups it participates in, and let
    each group compute ONE dense GEMM over Arrow-delivered numpy
    matrices (``applyInPandas``). Work per task is an (n/B)^2 matmul —
    BLAS-speed, bounded memory; replication factor is B. No pair ever
    crosses the wire individually: only the final >= threshold
    survivors are emitted.

    ``num_blocks=None`` (default) sizes B FROM THE DATA:
    B = ceil(n / rows_per_block), so each task holds at most
    ~2*rows_per_block vectors dense in one pandas frame regardless of
    corpus size — B grows linearly with n, tasks B(B+1)/2 grow with
    the (inherent) n^2 work, and per-task memory stays constant. A
    fixed B would cap parallelism and OOM a task at 100x data. The
    result is B-invariant (exact pairs), so the one count() action
    this costs never changes answers.

    Returns (id_a, id_b, cos_sim) with id_a < id_b. ``round_to`` rounds
    BEFORE thresholding (oracle-comparable semantics).
    """
    import math

    import numpy as np

    if num_blocks is None:
        n = df.count()
        num_blocks = max(1, math.ceil(n / max(1, rows_per_block)))

    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )
    B = num_blocks
    rows = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_vec"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(B))
        .cast("int")
        .alias("_blk"),
    )
    groups = F.array_distinct(
        F.array(
            *[
                F.struct(
                    F.least("_blk", F.lit(o)).alias("gi"),
                    F.greatest("_blk", F.lit(o)).alias("gj"),
                )
                for o in range(B)
            ]
        )
    )
    expanded = rows.select(
        "_id", "_vec", "_blk", F.explode(groups).alias("g")
    ).select("_id", "_vec", "_blk", F.col("g.gi").alias("gi"), F.col("g.gj").alias("gj"))

    def score(key, pdf):
        gi, gj = int(key[0]), int(key[1])
        V = np.stack(pdf["_vec"].values)
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0] = 1.0
        Vn = V / norms[:, None]
        ids = pdf["_id"].values
        blk = pdf["_blk"].values
        if gi == gj:
            S = Vn @ Vn.T
            if round_to is not None:
                S = np.round(S, round_to)
            mask = np.triu(S >= threshold, k=1)
            ii, jj = np.nonzero(mask)
            ia, ib, cs = ids[ii], ids[jj], S[ii, jj]
        else:
            left = blk == gi
            right = blk == gj
            S = Vn[left] @ Vn[right].T
            if round_to is not None:
                S = np.round(S, round_to)
            ii, jj = np.nonzero(S >= threshold)
            ia, ib, cs = ids[left][ii], ids[right][jj], S[ii, jj]
        swap = ia > ib
        lo = np.where(swap, ib, ia)
        hi = np.where(swap, ia, ib)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cos_sim": cs})

    return expanded.groupBy("gi", "gj").applyInPandas(score, out_schema)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    broadcast_queries: bool = True,
    exclude_self: bool = False,
) -> DataFrame:
    """Exact cosine top-k per query. Queries are broadcast (small side)
    so the corpus never shuffles; ties broken by neighbor id asc.
    exclude_self drops query_id == nbr_id BEFORE ranking, so the k
    slots all go to real neighbors (leave-one-out semantics)."""
    # Norms ride as per-ROW columns computed below the join (round-6,
    # guide §2.3 "don't compute things you throw away"): the fused
    # cosine(q, c) expression re-derived both norms per PAIR — for a
    # Q x N scoring that is 2QN redundant array folds; per-side
    # precompute leaves the identical dot/(qn*cn) IEEE arithmetic
    # (same operand order), so scores are bit-unchanged.
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).withColumn("_qn", _norm(F.col("qvec")))
    if broadcast_queries:
        q = F.broadcast(q)
    c = corpus.select(
        F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("cvec")
    ).withColumn("_cn", _norm(F.col("cvec")))
    # The broadcast cross join does O(|corpus| x |queries|) cosine work
    # INSIDE the corpus scan stage — if the scan yields fewer partitions
    # than cores (one small parquet file), the whole quadratic phase
    # serializes onto one task (measured 60s -> 5s at 2k x 2k). Widen
    # only when under-parallel: at real scale the corpus already has
    # >> defaultParallelism partitions and this adds no Exchange.
    par = corpus.sparkSession.sparkContext.defaultParallelism
    if c.rdd.getNumPartitions() < par:
        c = c.repartition(par)
    scored = c.crossJoin(q).select(
        "query_id",
        "nbr_id",
        F.round(
            _dot(F.col("qvec"), F.col("cvec"))
            / (F.col("_qn") * F.col("_cn")),
            6,
        ).alias("cosine"),
    )
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("nbr_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("nbr_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def _hyperplanes(num_tables: int, num_planes: int, dim: int, seed: int):
    """Per-(table, plane) pseudo-random hyperplanes with full-avalanche
    component mixing (see dedup._hyperplane for why a linear ramp in j
    collapses the sign-bucket index to ~2 buckets)."""
    from .dedup import _mix64

    return [
        [
            [
                ((_mix64(seed * 7_368_787 + t * 65_537 + i * 10_007 + j)
                  % 2_000_003) / 1_000_001.5) - 1.0
                for j in range(dim)
            ]
            for i in range(num_planes)
        ]
        for t in range(num_tables)
    ]


def _bucket_expr(vec: Column, planes) -> Column:
    bits = []
    for i, plane in enumerate(planes):
        # ONE sql-parsed array literal instead of dim F.lit() py4j
        # calls (classic pyspark expands lit(list) element-wise too);
        # repr() round-trips every double exactly, so values are
        # identical and plan construction is ~100x cheaper
        arr = F.expr(
            "array(" + ",".join(f"{float(x)!r}D" for x in plane) + ")"
        )
        bits.append(
            F.when(_dot(vec, arr) >= 0, F.lit(2 ** i)).otherwise(F.lit(0))
        )
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_tables: int = 4,
    num_planes: int | None = 6,
    seed: int = 42,
    target_bucket_size: int = 1024,
) -> DataFrame:
    """Approximate top-k: equi-join on (table, sign-bucket) across
    `num_tables` independent hyperplane sets, exact-cosine rescore of
    the candidate union, per-query window. Shuffle key cardinality =
    num_tables * 2^num_planes.

    ``num_planes=None`` sizes the tables FROM THE DATA (one count()):
    planes = clamp(6, 24, ceil(log2(n / target_bucket_size))), keeping
    expected bucket size ~ target_bucket_size so candidate volume per
    query stays flat as the corpus grows — a fixed plane count caps
    total buckets and degenerates toward brute force at 100x data.
    Recall per extra plane drops geometrically; raise num_tables in
    step (recall = 1-(1-p^planes)^tables, p = 1 - arccos(cos)/pi)."""
    dim = len(corpus.select(vec_col).first()[0])
    if num_planes is None:
        import math

        n = corpus.count()
        num_planes = max(
            6, min(24, math.ceil(math.log2(max(2, n / target_bucket_size))))
        )
    tables = _hyperplanes(num_tables, num_planes, dim, seed)

    def bucketize(df, idc, vecc, out_id):
        # per-side norm precompute (below the join) — the rescore then
        # never re-folds a norm per candidate pair; identical
        # dot/(qn*cn) arithmetic, bit-unchanged scores
        rows = df.select(
            F.col(idc).alias(out_id), F.col(vecc).alias(f"{out_id}_vec")
        ).withColumn(f"{out_id}_n", _norm(F.col(f"{out_id}_vec")))
        buckets = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    _bucket_expr(F.col(f"{out_id}_vec"), tables[t]).alias("bkt"),
                )
                for t in range(num_tables)
            ]
        )
        return rows.select(
            out_id, f"{out_id}_vec", f"{out_id}_n", F.explode(buckets).alias("tb")
        ).select(out_id, f"{out_id}_vec", f"{out_id}_n", "tb.tbl", "tb.bkt")

    cb = bucketize(corpus, id_col, vec_col, "nbr_id")
    qb = bucketize(queries, query_id_col, vec_col, "query_id")

    cands = (
        cb.join(qb, ["tbl", "bkt"])
        .select(
            "query_id", "query_id_vec", "query_id_n",
            "nbr_id", "nbr_id_vec", "nbr_id_n",
        )
        .dropDuplicates(["query_id", "nbr_id"])
    )
    scored = cands.select(
        "query_id",
        "nbr_id",
        F.round(
            _dot(F.col("query_id_vec"), F.col("nbr_id_vec"))
            / (F.col("query_id_n") * F.col("nbr_id_n")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def sample_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = 16,
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> list[tuple[int, list[float]]]:
    """Deterministic seeded corpus sample used as coarse-quantizer
    centroids (shared by ``ivf_topk`` and ``semantic_dedup``).

    Centroid selection = hash-threshold FILTER (keep the 1/mod slice of
    seeded hash values) + hash-min-k on the slice; the min-k compiles
    to TakeOrderedAndProject (per-partition heap, no shuffle / no full
    sort). If the corpus is too small to fill the slice, the slice
    widens geometrically. Result is the global hash-min-k of the slice
    — deterministic under any partitioning/layout; the driver holds
    exactly ``num_cells`` rows. ``hash_mode='md5'`` uses md5-hex
    prefix slices so a DuckDB oracle can replicate the draw."""
    if hash_mode == "md5":
        keyed = corpus.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("cvec"),
            F.md5(
                F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
            ).alias("_h"),
        )
        cents = []
        for pl in (3, 2, 1, 0):
            sliced = (
                keyed.where(F.substring("_h", 1, pl) == "0" * pl)
                if pl
                else keyed
            )
            cents = (
                sliced.orderBy("_h", "cid").limit(num_cells).collect()
            )
            if len(cents) >= num_cells:
                break
    else:
        keyed = corpus.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("cvec"),
            F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)).alias("_h"),
        )
        mod = 1 << 14
        cents = []
        while True:
            cents = (
                keyed.where(F.pmod("_h", F.lit(mod)) == 0)
                .orderBy("_h", "cid")
                .limit(num_cells)
                .collect()
            )
            if len(cents) >= num_cells or mod == 1:
                break
            mod = max(1, mod >> 4)
    return [(i, [float(x) for x in r.cvec]) for i, r in enumerate(cents)]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """IVF coarse quantization: centroids = num_cells deterministic
    corpus samples (seeded hash threshold — no RNG state, resume-safe);
    vectors assigned to nearest centroid once; queries probe the
    `nprobe` nearest cells. Candidate set = union of probed cells.

    Centroid selection = hash-threshold FILTER (keep the 1/mod slice
    of seeded hash values) + hash-min-k on the slice. The min-k
    compiles to TakeOrderedAndProject — a per-partition heap of
    num_cells rows merged at the driver: NO shuffle, NO exchange, NO
    full-corpus sort (asserted by test on the physical plan). If the
    corpus is too small to fill the slice, the slice widens
    geometrically. Result is the global hash-min-k of the slice —
    deterministic under any partitioning/layout.

    ``hash_mode='md5'`` keys the sample on md5 hex strings with
    '000'/'00'/'0'/'' prefix slices instead of xxhash64 pmod — the
    identical algorithm in a hash family DuckDB also has, making the
    whole IVF pipeline (sampling, assignment, probing, rescore)
    oracle-checkable (q22)."""
    cent_vecs = sample_centroids(
        corpus, id_col, vec_col, num_cells, seed, hash_mode
    )
    # centroid norms folded in PYTHON with the exact per-element IEEE
    # accumulation _norm uses (left-to-right acc + x*x, then sqrt), so
    # dot/(row_norm * lit_norm) is bit-identical to the fused form
    # while evaluating the row's norm once instead of once per cell
    import math

    def _py_norm(cv):
        acc = 0.0
        for x in cv:
            acc = acc + x * x
        return math.sqrt(acc)

    def cell_scores(vec: Column, norm_col: Column) -> Column:
        return F.array(
            *[
                F.struct(
                    F.round(
                        _dot(
                            vec,
                            F.expr(
                                "array("
                                + ",".join(f"{float(x)!r}D" for x in cv)
                                + ")"
                            ),
                        )
                        / (norm_col * F.lit(_py_norm(cv))),
                        6,
                    ).alias("cos"),
                    F.lit(ci).alias("cell"),
                )
                for ci, cv in cent_vecs
            ]
        )

    c = corpus.select(
        F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("cvec")
    ).withColumn("_cn", _norm(F.col("cvec")))
    c = c.withColumn(
        "cell", F.array_max(cell_scores(F.col("cvec"), F.col("_cn")))["cell"]
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).withColumn("_qn", _norm(F.col("qvec")))
    q = q.withColumn(
        "cells",
        F.slice(
            F.reverse(
                F.array_sort(cell_scores(F.col("qvec"), F.col("_qn")))
            ),
            1,
            nprobe,
        ),
    ).select(
        "query_id", "qvec", "_qn",
        F.explode(F.transform("cells", lambda s: s["cell"])).alias("cell"),
    )

    cands = q.join(c, "cell").select(
        "query_id",
        "nbr_id",
        F.round(
            _dot(F.col("qvec"), F.col("cvec"))
            / (F.col("_qn") * F.col("_cn")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        cands.dropDuplicates(["query_id", "nbr_id"])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def label_agreement(
    topk: DataFrame,
    labels: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """kNN label-agreement: for each query, how many of its top-k
    neighbors share its label — the standard self-supervised quality
    check for an embedding column (and, fed an ANN top-k instead of
    the brute one, a recall proxy for the index).

    Takes ANY (query_id, nbr_id, ...) neighbor frame — brute_force_topk,
    lsh_topk, or ivf_topk — so the expensive step keeps whichever scale
    path produced it; this composition adds two equi-joins on the id
    (label side is NOT assumed broadcastable: at 100 TB labels span
    the corpus) and one count agg per query.

    Returns (vec_id, label, n_neighbors, n_same_label) — integers only.
    """
    lq = labels.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("q_label")
    )
    ln = labels.select(
        F.col(id_col).alias("nbr_id"), F.col(label_col).alias("n_label")
    )
    return (
        topk.select("query_id", "nbr_id")
        .join(lq, "query_id")
        .join(ln, "nbr_id")
        .groupBy("query_id", "q_label")
        .agg(
            F.count(F.lit(1)).alias("n_neighbors"),
            F.sum(
                F.when(F.col("q_label") == F.col("n_label"), 1).otherwise(0)
            ).alias("n_same_label"),
        )
        .select(
            F.col("query_id").alias("vec_id"),
            F.col("q_label").alias("label"),
            "n_neighbors",
            "n_same_label",
        )
    )


def mutual_topk_edges(topk: DataFrame) -> DataFrame:
    """Undirected mutual-kNN edges from ANY (query_id, nbr_id)
    neighbor frame: (a, b) with a < b kept iff each appears in the
    other's top-k. One self-join on the reversed pair — the directed
    frame is n*k rows, so this is k-bounded, never quadratic.

    The mutual-kNN graph is the standard manifold skeleton of an
    embedding column (isolated points and asymmetric hubs drop out).
    """
    d = topk.select("query_id", "nbr_id")
    rev = d.select(
        F.col("nbr_id").alias("query_id"), F.col("query_id").alias("nbr_id")
    )
    return (
        d.join(rev, ["query_id", "nbr_id"])
        .where(F.col("query_id") < F.col("nbr_id"))
        .select(F.col("query_id").alias("a"), F.col("nbr_id").alias("b"))
        .distinct()
    )


def triangle_counts(edges: DataFrame, nodes: DataFrame | None = None) -> DataFrame:
    """Per-node triangle and degree counts over an undirected edge
    frame (a, b) with a < b — the clustering-coefficient ingredients
    (coefficient = 2*T / (deg*(deg-1)), left to the caller so the
    output stays integer-only).

    Node-iterator shape with ID orientation: wedges are enumerated
    only as a < b < c (join e(a,b) x e(b,c) on the middle vertex, then
    one equi-join back onto e(a,c)) so each triangle is found exactly
    once and the wedge frame is bounded by sum(out_deg^2) — on a kNN
    graph out-degree <= k, so wedges <= n*k^2 regardless of corpus
    size. No vertex ever holds its full adjacency in memory.
    """
    e = edges.select("a", "b").where(F.col("a") < F.col("b")).distinct()
    w = (
        e.select(F.col("a"), F.col("b").alias("m"))
        .join(e.select(F.col("a").alias("m"), F.col("b").alias("c")), "m")
        .select("a", F.col("m").alias("b"), "c")
    )
    tri = w.join(
        e.select(F.col("a"), F.col("b").alias("c")), ["a", "c"]
    ).select("a", "b", "c")
    per_node_tri = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("vec_id"))
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        e.select(F.explode(F.array("a", "b")).alias("vec_id"))
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    base = (
        nodes.select(F.col(nodes.columns[0]).alias("vec_id"))
        if nodes is not None
        else deg.select("vec_id")
    )
    return (
        base.join(deg, "vec_id", "left")
        .join(per_node_tri, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("degree", F.lit(0)).cast("long").alias("degree"),
            F.coalesce("n_triangles", F.lit(0))
            .cast("long")
            .alias("n_triangles"),
        )
    )


def sparse_tfidf_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int = 100,
    queries_filter: Column | None = None,
) -> DataFrame:
    """Sparse lexical retrieval: per-document top-k neighbors by
    TF-IDF-weighted dot product over an inverted token index — the
    text-side twin of the engine's dense ANN family (brute/LSH/IVF),
    and the same inverted-index shape as the ER co-title join (J1/T1),
    re-expressed over the documents table with EXACT-INTEGER weights.

    Integer encoding (the q42/q50/q75 rule — no free doubles):
    idf_micro = floor(1e6·ln N) - floor(1e6·ln df) (per-integer-count
    lns, the q75 idiom, identical in both engines); per-doc token
    weight = tf · idf_micro; pair score = sum over shared tokens of
    tf_a·tf_b·idf_micro² — monotone in the TF-IDF dot product, all
    int64 at test scale (the 100-TB path is the same formula over
    DECIMAL(38,0), as in profile.py's HHI).

    Stop-token prune FIRST: tokens with df > max_df are dropped before
    the self-join, bounding every inverted-index bucket — the pair
    fan-out is sum(df²) <= max_df · sum(df), linear in corpus size at
    fixed max_df (the identical cap that makes clone_pairs and the
    co-title join 100-TB-legal).

    queries_filter optionally restricts WHICH docs get a result list
    (applied to the query side BEFORE the join, so pruned queries cost
    nothing); corpus side always searches the full frame.

    Returns (query_id, nbr_id, score, rank<=k); ties by nbr_id asc.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(
                    F.regexp_replace(
                        F.lower(F.col(text_col)), r"[^a-z0-9]+", " "
                    ),
                    " ",
                ),
                lambda x: x != "",
            )
        ).alias("token"),
    )
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_df)
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))  # 1 row, broadcast
    weighted = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            (
                F.floor(F.lit(1_000_000) * F.log("n_docs"))
                - F.floor(F.lit(1_000_000) * F.log("df"))
            )
            .cast("long")
            .alias("idf_micro"),
        )
    )
    qside = weighted.select(
        F.col("doc_id").alias("query_id"),
        "token",
        F.col("tf").alias("tf_q"),
        "idf_micro",
    )
    if queries_filter is not None:
        qside = qside.where(queries_filter)
    cside = weighted.select(
        F.col("doc_id").alias("nbr_id"), "token", F.col("tf").alias("tf_c")
    )
    scored = (
        qside.join(cside, "token")
        .where(F.col("query_id") != F.col("nbr_id"))
        .groupBy("query_id", "nbr_id")
        .agg(
            F.sum(
                F.col("tf_q")
                * F.col("tf_c")
                * F.col("idf_micro")
                * F.col("idf_micro")
            ).alias("score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("nbr_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "score", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame], k: int = 5, c: int = 60
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke, Büttcher, SIGIR 2009):
    fuse N per-query rankings into one — the standard hybrid-retrieval
    combiner for dense (embedding kNN) + sparse (TF-IDF) candidate
    lists in a training-data pipeline.

    Each input frame has (query_id, nbr_id, rank); an item's fused
    score is sum over the lists containing it of 1e6 div (c + rank) —
    integer ppm (exact integral division, never a summed double), the
    published formula with the conventional c=60. Items missing from a
    list simply contribute nothing for it (the paper's semantics).

    Scale shape: union (narrow) + ONE agg on (query_id, nbr_id) + the
    per-query top-k window — input is already top-k-bounded per list,
    so the frame is |queries|·k·N rows, never corpus-sized.

    Returns (query_id, nbr_id, rrf_ppm, fused_rank<=k); ties by
    nbr_id asc.
    """
    parts = [
        r.select(
            "query_id",
            "nbr_id",
            F.expr(f"1000000 DIV ({c} + rank)").alias("contrib"),
        )
        for r in rankings
    ]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    fused = unioned.groupBy("query_id", "nbr_id").agg(
        F.sum("contrib").cast("long").alias("rrf_ppm")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_ppm"), F.asc("nbr_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .where(F.col("fused_rank") <= k)
        .select("query_id", "nbr_id", "rrf_ppm", "fused_rank")
    )
