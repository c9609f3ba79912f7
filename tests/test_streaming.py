"""Structured Streaming tests: file source -> memory/foreachBatch sink,
driven synchronously with processAllAvailable()."""

import json

from pyspark.sql import functions as F

from hgcn_name_disambiguation_spark.fixtures.generator import (
    REPO_FILES_SCHEMA,
    generate_repo_files,
)
from hgcn_name_disambiguation_spark.plans.pipeline import run_pipeline
from hgcn_name_disambiguation_spark.streaming.incremental import (
    IncrementalDisambiguator,
    windowed_event_counts,
)


def test_windowed_event_counts(spark, tmp_path):
    src = str(tmp_path / "events_src")
    rows = [
        {"ts": f"2024-01-01 00:{m:02d}:00", "event_type": t, "value": 1.0}
        for m in range(0, 30, 2)
        for t in ["click", "view"]
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(df.schema).parquet(src)
    )
    agg = windowed_event_counts(stream, window="10 minutes", slide="10 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT window.start AS s, event_type, n FROM win_counts"
        ).collect()
    finally:
        q.stop()
    counts = {(str(r.s), r.event_type): r.n for r in got}
    # 5 events per type per 10-minute tumble
    assert counts[("2024-01-01 00:00:00", "click")] == 5
    assert counts[("2024-01-01 00:10:00", "view")] == 5
    assert counts[("2024-01-01 00:20:00", "click")] == 5


def test_incremental_matches_batch(spark, tmp_path):
    """Incremental foreachBatch ER == batch pipeline on the union —
    the correctness contract for the streaming mode."""
    rows = generate_repo_files(seed=11, blocks=3, pubs_per_block=15, skew_factor=2)
    half = len(rows) // 2
    src = str(tmp_path / "rf_src")
    store = str(tmp_path / "er_store")

    # two files = two micro-batches (maxFilesPerTrigger=1)
    spark.createDataFrame(rows[:half], REPO_FILES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(rows[half:], REPO_FILES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    inc = IncrementalDisambiguator(spark, store)
    stream = (
        spark.readStream.schema(REPO_FILES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = inc.attach(stream).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r.block_key, r.pub_id, r.cluster_id)
        for r in inc.clusters().select("block_key", "pub_id", "cluster_id").collect()
    )
    batch = run_pipeline(
        spark.createDataFrame(rows, REPO_FILES_SCHEMA)
    ).clustered
    want = sorted(
        (r.block_key, r.pub_id, r.cluster_id)
        for r in batch.select("block_key", "pub_id", "cluster_id").collect()
    )
    assert got == want
