from __future__ import annotations

from pyspark.sql import functions as F

from hgcn_name_disambiguation_spark.operators.sketch import distinct_sketch


def _vals(spark, n, dups=1):
    # n distinct string values, each repeated `dups` times, one group
    df = spark.range(n * dups).select(
        F.lit("g").alias("grp"),
        F.concat(F.lit("v"), (F.col("id") % n).cast("string")).alias("v"),
    )
    return df


def test_distinct_sketch_exact_small_group(spark):
    """n < k and p = 0: the sketch IS the exact distinct count, and
    duplicates don't move it."""
    out = distinct_sketch(_vals(spark, 10, dups=3), ["grp"], "v", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_slice == 10 and r.est_threshold == 10 and r.est_kmv == 10
    assert len(r.kth_hex) == 32


def test_distinct_sketch_kmv_accuracy(spark):
    """KMV with k=64 on 5000 distinct values: relative error well
    inside 4 standard errors (1/sqrt(k-2) ~ 12.7%)."""
    r = distinct_sketch(_vals(spark, 5000), ["grp"], "v", k=64).collect()[0]
    assert r.n_slice == 5000  # p=0 slice holds everything
    assert abs(r.est_kmv - 5000) / 5000 < 0.5
    assert r.est_threshold == 5000


def test_distinct_sketch_sliced_and_auto(spark):
    """p=1 keeps only the 1/16 hash slice; estimates stay in range;
    auto_target picks the same p; result invariant to partitioning."""
    df = _vals(spark, 5000, dups=2)
    a = distinct_sketch(df, ["grp"], "v", k=64, prefix_zeros=1).collect()[0]
    # expected slice ~ 5000/16 = 312; binomial 5-sigma band
    assert 200 < a.n_slice < 450
    assert a.est_threshold == a.n_slice * 16
    assert abs(a.est_threshold - 5000) / 5000 < 0.35
    assert abs(a.est_kmv - 5000) / 5000 < 0.5

    # 16 * 100 <= 10000 < 16^2 * 100  =>  auto picks p = 1
    b = distinct_sketch(df, ["grp"], "v", k=64, auto_target=100).collect()[0]
    assert (b.n_slice, b.kth_hex, b.est_threshold, b.est_kmv) == (
        a.n_slice, a.kth_hex, a.est_threshold, a.est_kmv,
    )

    c = distinct_sketch(
        df.repartition(7).sortWithinPartitions(F.desc("v")),
        ["grp"], "v", k=64, prefix_zeros=1,
    ).collect()[0]
    assert (c.n_slice, c.kth_hex, c.est_kmv) == (
        a.n_slice, a.kth_hex, a.est_kmv,
    )
