"""M5 — pairwise P/R/F1 in closed form (SURVEY §2.3 J7, §2.9 G10).

The reference loops over all O(n^2) index pairs
(``name_disambiguation.py:111-133``). Identical result via group-size
combinatorics — three hash aggregations, no pair materialization:

    pairs(g)   = C(n_g, 2) = n_g * (n_g - 1) / 2
    TP + FN    = sum over truth groups of pairs(g)
    TP + FP    = sum over predicted groups of pairs(g)
    TP         = sum over (truth, pred) cells of pairs(g)

precision = TP/(TP+FP), recall = TP/(TP+FN), F1 harmonic mean —
exactly the reference's formulas at ``:128-133``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _c2(col):
    return F.sum(F.col(col) * (F.col(col) - 1) / 2.0)


def pairwise_metrics(
    clustered: DataFrame,
    truth_col: str = "label",
    pred_col: str = "cluster_id",
    by_block: bool = True,
) -> DataFrame:
    """clustered pubs -> per-block (or global) precision/recall/F1.

    Rows with null truth labels are excluded (unlabeled mode).
    """
    grp = ["block_key"] if by_block else []
    df = clustered.where(F.col(truth_col).isNotNull())

    truth_sizes = df.groupBy(*grp, truth_col).agg(F.count(F.lit(1)).alias("n"))
    pred_sizes = df.groupBy(*grp, pred_col).agg(F.count(F.lit(1)).alias("n"))
    cell_sizes = df.groupBy(*grp, truth_col, pred_col).agg(
        F.count(F.lit(1)).alias("n")
    )

    tp_fn = truth_sizes.groupBy(*grp).agg(_c2("n").alias("tp_fn"))
    tp_fp = pred_sizes.groupBy(*grp).agg(_c2("n").alias("tp_fp"))
    tp = cell_sizes.groupBy(*grp).agg(_c2("n").alias("tp"))

    if grp:
        m = tp.join(tp_fp, grp).join(tp_fn, grp)
    else:
        m = tp.crossJoin(tp_fp).crossJoin(tp_fn)

    prec = F.when(F.col("tp_fp") > 0, F.col("tp") / F.col("tp_fp")).otherwise(
        F.lit(1.0)
    )
    rec = F.when(F.col("tp_fn") > 0, F.col("tp") / F.col("tp_fn")).otherwise(
        F.lit(1.0)
    )
    out = m.withColumn("precision", prec).withColumn("recall", rec)
    f1 = F.when(
        (F.col("precision") + F.col("recall")) > 0,
        2 * F.col("precision") * F.col("recall")
        / (F.col("precision") + F.col("recall")),
    ).otherwise(F.lit(0.0))
    return out.withColumn("f1", f1)


def metrics_summary(per_block: DataFrame) -> DataFrame:
    """A8: NaN-safe averages across blocks — mirrors the reference's
    CSV summary row (``name_disambiguation.py:1272-1291``)."""
    ok = per_block.where(
        ~F.isnan("f1") & F.col("f1").isNotNull()
    )
    return ok.agg(
        F.avg("precision").alias("avg_precision"),
        F.avg("recall").alias("avg_recall"),
        F.avg("f1").alias("avg_f1"),
        F.count(F.lit(1)).alias("n_blocks"),
    )
