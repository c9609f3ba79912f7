"""Small shared planner helpers for the operator family."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def adaptive_broadcast(df: DataFrame, rows: int) -> DataFrame:
    """Broadcast-hint a (checkpointed) frame when its MEASURED row
    count is under the env-tunable cap (SPARK_GRAFT_BROADCAST_ROWS,
    default 2M rows). Checkpointed frames carry no catalyst size
    statistics, so the planner would default them to sort-merge joins
    even when they are a few MB; the row count is known (the caller
    just materialized the frame), making the hint data-adaptive — on
    a 100-TB run the count exceeds the cap and the join falls back to
    the planner's shuffle strategy. Never a hard-coded local[n]
    assumption."""
    cap = int(os.environ.get("SPARK_GRAFT_BROADCAST_ROWS", "2000000"))
    return F.broadcast(df) if rows <= cap else df
