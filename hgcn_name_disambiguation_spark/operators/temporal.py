"""Point-in-time (as-of) join — the temporal operator Spark's built-in
join family lacks.

For each left row, attach the LATEST right row with the same key and
``right.ts <= left.ts`` (``<`` when strict) — the feature-store /
training-data primitive ("the user's most recent profile/view/price AS
OF this example's timestamp") whose naive formulations are both wrong
at scale: a range-join explodes quadratically inside time buckets, and
a per-left-row correlated lookup is a driver loop.

Implementation is the union-scan shape: tag both sides, sort each key
partition once by (ts, side, tiebreak), and carry the last-seen right
payload forward with ``last(ignorenulls)`` over an unbounded-preceding
ROWS window — ONE shuffle on the key, a single O(n) streaming pass per
partition (rowsBetween windows don't re-scan), zero row amplification.
Exactly-equal timestamps are deterministic: right rows sort before
left rows (inclusive mode), and right-vs-right ties resolve to the
highest ``right_id``.

Skew: one hot key's timeline serializes into one task's sort — that is
inherent to "running last per key" (the state is order-dependent), but
the state carried is ONE struct, so the task is sort-bound, not
memory-bound; at 100 TB per-key timelines are bounded by the key's own
event rate, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _epoch_us(col):
    """Exact integer microseconds since epoch for TIMESTAMP or
    TIMESTAMP_NTZ columns (timezone-independent: a pure diff against
    the epoch literal in the same clock)."""
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" cast({col} as timestamp_ntz))"
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    window_us: int,
    ts_col: str = "ts",
    payload_prefix: str = "r_",
) -> DataFrame:
    """Windowed (range) join: every (left, right) pair with the same
    key and ``right.ts`` in ``[left.ts - window_us, left.ts]`` — the
    "events within Δ before" temporal join (error attribution, session
    stitching, feature lookback).

    Naive formulations fail at scale: a non-equi theta-join is a
    nested-loop cross product per key, and a per-key window sort can't
    express many-to-many matches. This is the BUCKETED shape: both
    sides bucket timestamps at the window width, the LEFT side probes
    its own and the preceding bucket (a 2-row explode — bounded 2x
    amplification on one side only), the join is a plain equi-join on
    (key, bucket) that shuffles/AQE-skew-handles like any other, and
    an exact range filter keeps true matches. Each true pair survives
    exactly once (a right row lives in exactly one bucket; the two
    probe buckets are distinct).

    Returns left columns + prefixed right payload columns; inner
    semantics (unmatched left rows drop — wrap with a left join on the
    output keys when outer semantics are needed).
    """
    payload = [c for c in right.columns if c not in (on, ts_col)]
    l_us = _epoch_us(ts_col)
    r_us = _epoch_us(ts_col)
    lb = F.floor(l_us / F.lit(window_us)).cast("long")
    l = left.select(
        F.struct(*left.columns).alias("_l"),
        F.col(on).alias("_k"),
        l_us.alias("_lus"),
        F.explode(F.array(lb - 1, lb)).alias("_b"),
    )
    r = right.select(
        F.col(on).alias("_k"),
        r_us.alias("_rus"),
        F.floor(r_us / F.lit(window_us)).cast("long").alias("_b"),
        *[F.col(c).alias(f"{payload_prefix}{c}") for c in payload],
    )
    j = l.join(r, ["_k", "_b"]).where(
        (F.col("_rus") >= F.col("_lus") - F.lit(window_us))
        & (F.col("_rus") <= F.col("_lus"))
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"{payload_prefix}{c}") for c in payload
    ]
    return j.select(*out_cols)


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    on: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-sequence (funnel) analysis: for each key, the earliest
    completion time of each step GIVEN the previous step happened at
    or before it — step i matches the earliest ``steps[i]`` event with
    ``ts >= t_{i-1}`` — and the stage reached (0..len(steps)).

    Returns (key, stage, us_<step1>, ..., us_<stepN>) with times as
    exact integer epoch-microseconds (NULL once the funnel breaks).

    Scale shape: one conditional-min aggregation per step, all keyed
    on the SAME column — the first groupBy shuffles, every later
    stage reuses that partitioning (no new Exchange), and each agg is
    map-side combined. Never a per-key sort or event-list collect, so
    a hot key costs a skewed agg, not a memory blowup.
    """
    us = _epoch_us(ts_col)
    d = events.select(
        F.col(on).alias("_k"), us.alias("_us"), F.col(type_col).alias("_t")
    )
    acc = d.groupBy("_k").agg(
        F.min(F.when(F.col("_t") == steps[0], F.col("_us"))).alias("_s0")
    )
    for i, step in enumerate(steps[1:], start=1):
        acc = (
            d.join(acc, "_k")
            .groupBy("_k", *[f"_s{j}" for j in range(i)])
            .agg(
                F.min(
                    F.when(
                        (F.col("_t") == step)
                        & (F.col("_us") >= F.col(f"_s{i-1}")),
                        F.col("_us"),
                    )
                ).alias(f"_s{i}")
            )
        )
    stage = sum(
        (F.col(f"_s{i}").isNotNull()).cast("int") for i in range(len(steps))
    )
    return acc.select(
        F.col("_k").alias(on),
        stage.alias("stage"),
        *[
            F.col(f"_s{i}").alias(f"us_{s}")
            for i, s in enumerate(steps)
        ],
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_id: str | None = None,
    strict: bool = False,
    payload_prefix: str = "r_",
) -> DataFrame:
    """As-of (point-in-time) LEFT join.

    Returns every ``left`` row plus the payload columns of the latest
    matching ``right`` row (prefixed ``payload_prefix``), NULL when no
    right row precedes it. ``right_id`` names a unique right column
    used as the equal-timestamp tie-break (highest wins); defaults to
    the first non-key, non-ts right column.

    strict=False matches ``right.ts <= left.ts`` (a right row exactly
    at the left timestamp is visible); strict=True matches ``<``.
    """
    payload = [c for c in right.columns if c not in (on, ts_col)]
    if right_id is None:
        if not payload:
            raise ValueError("right needs at least one payload column")
        right_id = payload[0]
    # inclusive: right sorts BEFORE left at equal ts (side 0 < 1) so a
    # same-instant right row is already "seen"; strict flips the order.
    r_side, l_side = (0, 1) if not strict else (1, 0)
    r = right.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(r_side).alias("_side"),
        F.col(right_id).cast("string").alias("_tb"),
        F.struct(*payload).alias("_r"),
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(l_side).alias("_side"),
        F.lit(None).cast("string").alias("_tb"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        F.struct(*left.columns).alias("_l"),
    )
    u = r.select("_k", "_ts", "_side", "_tb", "_r", F.lit(None).cast(
        l.schema["_l"].dataType
    ).alias("_l")).unionByName(l)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_ts"), F.asc("_side"), F.asc_nulls_first("_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(
        "_m", F.last("_r", ignorenulls=True).over(w)
    ).where(F.col("_side") == l_side)
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"_m.{c}").alias(f"{payload_prefix}{c}") for c in payload
    ]
    return matched.select(*out_cols)
