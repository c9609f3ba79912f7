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


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact cosine top-k per query. Queries are broadcast (small side)
    so the corpus never shuffles; ties broken by neighbor id asc."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    if broadcast_queries:
        q = F.broadcast(q)
    c = corpus.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("cvec"))
    scored = c.crossJoin(q).select(
        "query_id",
        "nbr_id",
        F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("nbr_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def _hyperplanes(num_tables: int, num_planes: int, dim: int, seed: int):
    return [
        [
            [
                (((seed * 7_368_787 + t * 65_537 + i * 10_007 + j * 101)
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
        arr = F.array(*[F.lit(float(x)) for x in plane])
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
    num_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: equi-join on (table, sign-bucket) across
    `num_tables` independent hyperplane sets, exact-cosine rescore of
    the candidate union, per-query window. Shuffle key cardinality =
    num_tables * 2^num_planes — tunable to executor count."""
    dim = len(corpus.select(vec_col).first()[0])
    tables = _hyperplanes(num_tables, num_planes, dim, seed)

    def bucketize(df, idc, vecc, out_id):
        rows = df.select(F.col(idc).alias(out_id), F.col(vecc).alias(f"{out_id}_vec"))
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
            out_id, f"{out_id}_vec", F.explode(buckets).alias("tb")
        ).select(out_id, f"{out_id}_vec", "tb.tbl", "tb.bkt")

    cb = bucketize(corpus, id_col, vec_col, "nbr_id")
    qb = bucketize(queries, query_id_col, vec_col, "query_id")

    cands = (
        cb.join(qb, ["tbl", "bkt"])
        .select("query_id", "query_id_vec", "nbr_id", "nbr_id_vec")
        .dropDuplicates(["query_id", "nbr_id"])
    )
    scored = cands.select(
        "query_id",
        "nbr_id",
        F.round(cosine(F.col("query_id_vec"), F.col("nbr_id_vec")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


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
) -> DataFrame:
    """IVF coarse quantization: centroids = num_cells deterministic
    corpus samples (seeded hash order — no RNG state, resume-safe);
    vectors assigned to nearest centroid once; queries probe the
    `nprobe` nearest cells. Candidate set = union of probed cells."""
    cents = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .orderBy(F.xxhash64(F.col("cid").cast("string"), F.lit(seed)))
        .limit(num_cells)
        .collect()
    )
    cent_vecs = [(i, [float(x) for x in r.cvec]) for i, r in enumerate(cents)]

    def cell_scores(vec: Column) -> Column:
        return F.array(
            *[
                F.struct(
                    F.round(cosine(vec, F.array(*[F.lit(x) for x in cv])), 6).alias("cos"),
                    F.lit(ci).alias("cell"),
                )
                for ci, cv in cent_vecs
            ]
        )

    c = corpus.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("cvec"))
    c = c.withColumn(
        "cell", F.array_max(cell_scores(F.col("cvec")))["cell"]
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    q = q.withColumn(
        "cells",
        F.slice(
            F.reverse(F.array_sort(cell_scores(F.col("qvec")))), 1, nprobe
        ),
    ).select(
        "query_id", "qvec", F.explode(F.transform("cells", lambda s: s["cell"])).alias("cell")
    )

    cands = q.join(c, "cell").select(
        "query_id",
        "nbr_id",
        F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        cands.dropDuplicates(["query_id", "nbr_id"])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )
