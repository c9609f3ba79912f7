"""Deterministic cardinality sketches.

An analytics engine is expected to answer "how many distinct X" on a
corpus where exact COUNT(DISTINCT) means shuffling every distinct
value. The standard answers (HLL / theta sketches) are
engine-specific binary states — useless for cross-engine checking.
These operators get the same one-pass, merge-friendly shape with a
SEEDED md5 ORDER STATISTIC instead, so a second engine replays them
bit-for-bit:

- threshold sampling (Gibbons' distinct sampling, fixed threshold):
  keep only values whose hash has `prefix_zeros` leading zero nibbles
  (a 16^-p uniform slice), count the distinct survivors, estimate
  = 16^p * count.
- KMV (k minimum values, Bar-Yossef et al. 2002): the k-th smallest
  hash u_(k) of the slice IS the global k-th minimum whenever the
  slice holds >= k values (the slice is exactly the numerically
  smallest hashes), so est = (k-1) / u_(k).

Every arithmetic step is exact-integer or a single correctly-rounded
IEEE double op on identical inputs (the q50 pattern), so the output
is hash-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX15 = 16 ** 15  # 2^60, exactly representable as a double


def distinct_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    prefix_zeros: int = 0,
    seed: int = 42,
    auto_target: int | None = None,
) -> DataFrame:
    """Per-group distinct-count sketch: threshold-sampling estimate +
    KMV estimate in one pass.

    Scale contract: the ONLY shuffled rows are the hash slice —
    expected |distinct| / 16^prefix_zeros per group — so the exact-
    distinct shuffle never happens at p > 0. ``auto_target`` sizes p
    from the data (one count scalar: deepest p keeping the expected
    slice >= auto_target rows), the same auto-sizing pattern as
    ``semantic_dedup``. The per-group k-th order statistic runs on the
    already-small slice (one window, slice-sized). Groups whose slice
    is empty do not appear (their estimate is 0 at this resolution —
    widen p to resolve them).

    Estimator fallback: a slice with fewer than k distinct values IS
    the exact distinct set of the slice, so est_kmv degrades to the
    threshold estimate (exact when p = 0) instead of extrapolating
    from a non-existent k-th minimum.

    Returns (group..., n_slice, kth_hex, est_threshold, est_kmv);
    integers + one fixed-width hex string.
    """
    if auto_target is not None:
        n = df.count()  # one scalar: sizes the slice from the data
        p = 0
        while 16 ** (p + 1) * auto_target <= n:
            p += 1
        prefix_zeros = p
    mod = 16 ** prefix_zeros

    h: Column = F.md5(
        F.concat(
            F.lit(f"{seed}:"),
            F.coalesce(F.col(value_col).cast("string"), F.lit("")),
        )
    )
    sliced = df.select(*group_cols, h.alias("h"))
    if prefix_zeros:
        sliced = sliced.where(F.col("h").startswith("0" * prefix_zeros))
    sliced = sliced.distinct()

    w_rank = Window.partitionBy(*group_cols).orderBy("h")
    w_all = Window.partitionBy(*group_cols)
    ranked = sliced.select(
        *group_cols,
        "h",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n_slice"),
    )
    kth = ranked.where(
        F.col("rn") == F.least(F.lit(k), F.col("n_slice"))
    )
    # u = value(first 15 hex chars) / 16^15; est = floor((k-1) / u).
    # BIGINT -> DOUBLE cast and one division are both correctly-rounded
    # IEEE ops on identical inputs in Spark and DuckDB.
    val = F.conv(F.substring(F.col("h"), 1, 15), 16, 10).cast("long")
    est_kmv = F.when(
        F.col("n_slice") < k,
        F.col("n_slice") * F.lit(mod),
    ).otherwise(
        F.floor(
            F.lit(float(k - 1))
            * F.lit(float(_HEX15))
            / F.greatest(val, F.lit(1)).cast("double")
        )
    )
    return kth.select(
        *group_cols,
        F.col("n_slice").cast("long").alias("n_slice"),
        F.col("h").alias("kth_hex"),
        (F.col("n_slice") * F.lit(mod)).cast("long").alias("est_threshold"),
        est_kmv.cast("long").alias("est_kmv"),
    )
