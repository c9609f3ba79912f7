"""Incremental cluster assignment (operators/assign.py +
streaming.StreamingClusterAssigner): hand-computed channel math,
threshold/NULL semantics, hot-key capping, fixture-accuracy, and the
batch == stream contract."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from hgcn_name_disambiguation_spark.config import DEFAULT_CONFIG, PipelineConfig
from hgcn_name_disambiguation_spark.operators.assign import (
    assign_to_clusters,
    cluster_profiles,
    score_against_clusters,
)

PUB_SCHEMA = StructType(
    [
        StructField("block_key", StringType()),
        StructField("pub_id", StringType()),
        StructField("title", StringType()),
        StructField("authors", ArrayType(StringType())),
        StructField("venue", StringType()),
        StructField("title_toks", ArrayType(StringType())),
    ]
)


def _pub(bk, pid, toks, authors, venue, cluster=None):
    row = (bk, pid, " ".join(toks), authors, venue, toks)
    return row if cluster is None else row + (cluster,)


@pytest.fixture(scope="module")
def tiny(spark):
    """Snapshot: one block, two clusters.
    c1 = {p1: toks [alpha, beta], authors [ann], venue v1}
    c2 = {p2: toks [gamma, delta], authors [bob], venue v2}
    """
    snap_schema = StructType(PUB_SCHEMA.fields + [
        StructField("cluster_id", StringType())
    ])
    snap = spark.createDataFrame(
        [
            _pub("b", "p1", ["alpha", "beta"], ["ann"], "v1", "c1"),
            _pub("b", "p2", ["gamma", "delta"], ["bob"], "v2", "c2"),
        ],
        snap_schema,
    )
    return snap


def test_channel_math_hand_computed(spark, tiny):
    """New pub shares one token (alpha) + the coauthor with c1 and
    nothing with c2. n_block=2, every snapshot token df=1 ->
    idf = ln(3). Pub toks = [alpha, zeta]; zeta unseen -> idf =
    ln(3) too. T = ln3^2 / (sqrt(2)ln3 * sqrt(2)ln3) = 0.5;
    fused(c1) = (5*1 + 1*0.5 + 4*0) / 10 = 0.55."""
    new = spark.createDataFrame(
        [_pub("b", "n1", ["alpha", "zeta"], ["ann"], "vX")], PUB_SCHEMA
    )
    scored = score_against_clusters(
        new, cluster_profiles(tiny, DEFAULT_CONFIG), DEFAULT_CONFIG
    ).collect()
    by_cluster = {r.cluster_id: r for r in scored}
    assert set(by_cluster) == {"c1"}  # no shared anything with c2
    r = by_cluster["c1"]
    assert r.a == 1.0 and r.v == 0.0
    assert r.t == pytest.approx(0.5, abs=1e-12)
    assert r.fused == pytest.approx(0.55, abs=1e-12)

    out = assign_to_clusters(new, tiny, DEFAULT_CONFIG).collect()
    assert len(out) == 1
    assert out[0].cluster_id == "c1"
    assert out[0].fused == pytest.approx(0.55, abs=1e-12)


def test_threshold_null_and_tiebreak(spark, tiny):
    """A title-only match (fused <= 0.1) stays NULL at the default
    threshold; a venue tie between two clusters breaks toward the
    GREATEST cluster_id (the deterministic max(struct) rule)."""
    new = spark.createDataFrame(
        [_pub("b", "n2", ["alpha"], ["nobody"], "vX")], PUB_SCHEMA
    )
    out = assign_to_clusters(new, tiny, DEFAULT_CONFIG).collect()
    assert len(out) == 1 and out[0].cluster_id is None

    # tie: same venue in two clusters, no tokens, no authors
    snap_schema = tiny.schema
    snap2 = spark.createDataFrame(
        [
            _pub("b", "p1", ["alpha"], ["ann"], "v1", "c1"),
            _pub("b", "p2", ["beta"], ["bob"], "v1", "c2"),
        ],
        snap_schema,
    )
    new2 = spark.createDataFrame(
        [_pub("b", "n3", ["omega"], ["nobody"], "v1")], PUB_SCHEMA
    )
    out2 = assign_to_clusters(new2, snap2, DEFAULT_CONFIG).collect()
    assert out2[0].cluster_id == "c2"
    assert out2[0].fused == pytest.approx(0.4, abs=1e-12)


def test_hot_key_cap_drops_uninformative_author(spark):
    """An author present in > assign_hot_key_clusters clusters is
    dropped from the candidate index: no assignment through it."""
    cfg = PipelineConfig(assign_hot_key_clusters=2)
    snap_schema = StructType(PUB_SCHEMA.fields + [
        StructField("cluster_id", StringType())
    ])
    snap = spark.createDataFrame(
        [
            _pub("b", f"p{i}", [f"tok{i}"], ["hot"], f"v{i}", f"c{i}")
            for i in range(3)
        ],
        snap_schema,
    )
    new = spark.createDataFrame(
        [_pub("b", "n1", ["nothing"], ["hot"], "vX")], PUB_SCHEMA
    )
    out = assign_to_clusters(new, snap, cfg).collect()
    assert out[0].cluster_id is None  # 'hot' spans 3 > 2 clusters
    # under the default cap (64) the same pub assigns
    out2 = assign_to_clusters(new, snap, DEFAULT_CONFIG).collect()
    assert out2[0].cluster_id is not None


def test_fixture_holdout_accuracy(spark, fixture_repo_files):
    """Hold out every 7th pub of the labeled fixture, assign against
    the remaining clustered snapshot: every held-out pub must be
    assigned, and the assigned cluster's majority truth label must
    match the pub's own label (measured 1.0; floor 0.95)."""
    from hgcn_name_disambiguation_spark.operators.parse import (
        parse_publications,
    )
    from hgcn_name_disambiguation_spark.plans.pipeline import run_pipeline

    pubs = parse_publications(
        fixture_repo_files, DEFAULT_CONFIG, observe_name=None
    )
    new_pubs = pubs.where(F.xxhash64("pub_id") % 7 == 0).cache()
    res = run_pipeline(fixture_repo_files, DEFAULT_CONFIG)
    clustered = res.clustered.join(
        new_pubs.select("block_key", "pub_id"),
        ["block_key", "pub_id"],
        "left_anti",
    ).cache()
    out = assign_to_clusters(new_pubs, clustered, DEFAULT_CONFIG).cache()
    n_new = new_pubs.count()
    assigned = out.where(F.col("cluster_id").isNotNull())
    assert assigned.count() == n_new

    truth = res.clustered.select(
        "block_key", "pub_id", F.col("label").alias("true_label")
    )
    cl_maj = (
        res.clustered.groupBy("block_key", "cluster_id", "label")
        .count()
        .groupBy("block_key", "cluster_id")
        .agg(F.max(F.struct("count", "label")).alias("m"))
        .select(
            "block_key", "cluster_id", F.col("m.label").alias("cl_label")
        )
    )
    acc = (
        assigned.join(truth, ["block_key", "pub_id"])
        .join(cl_maj, ["block_key", "cluster_id"])
        .agg(
            F.avg(
                (F.col("true_label") == F.col("cl_label")).cast("double")
            ).alias("acc")
        )
        .first()
        .acc
    )
    assert acc >= 0.95, f"assignment accuracy regressed: {acc:.4f}"


def test_streaming_matches_batch(spark, tmp_path):
    """StreamingClusterAssigner over two micro-batches == batch
    assign_to_clusters on the union — the batch/stream contract."""
    from hgcn_name_disambiguation_spark.fixtures.generator import (
        REPO_FILES_SCHEMA,
        generate_repo_files,
    )
    from hgcn_name_disambiguation_spark.operators.parse import (
        parse_publications,
    )
    from hgcn_name_disambiguation_spark.plans.pipeline import run_pipeline
    from hgcn_name_disambiguation_spark.streaming.incremental import (
        StreamingClusterAssigner,
    )

    rows = generate_repo_files(seed=5, blocks=3, pubs_per_block=16, skew_factor=2)
    # split RAW rows: snapshot never saw the 'new' rows (the realistic
    # deployment shape), and no pub_id <-> row matching is needed
    import zlib

    new_rows = [r for r in rows if zlib.crc32(r["path"].encode()) % 5 == 0]
    snap_rows = [r for r in rows if zlib.crc32(r["path"].encode()) % 5 != 0]
    clustered = run_pipeline(
        spark.createDataFrame(snap_rows, REPO_FILES_SCHEMA), DEFAULT_CONFIG
    ).clustered.cache()

    src = str(tmp_path / "new_src")
    out_dir = str(tmp_path / "assign_out")
    half = max(1, len(new_rows) // 2)
    spark.createDataFrame(new_rows[:half], REPO_FILES_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(src)
    spark.createDataFrame(new_rows[half:], REPO_FILES_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(src)

    assigner = StreamingClusterAssigner(spark, clustered, out_dir)
    stream = (
        spark.readStream.schema(REPO_FILES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = assigner.attach(stream).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r.block_key, r.pub_id, r.cluster_id)
        for r in assigner.assignments()
        .select("block_key", "pub_id", "cluster_id")
        .collect()
    )
    new_pubs = parse_publications(
        spark.createDataFrame(new_rows, REPO_FILES_SCHEMA),
        DEFAULT_CONFIG,
        observe_name=None,
    )
    want = sorted(
        (r.block_key, r.pub_id, r.cluster_id)
        for r in assign_to_clusters(new_pubs, clustered, DEFAULT_CONFIG)
        .select("block_key", "pub_id", "cluster_id")
        .collect()
    )
    assert got == want and len(got) > 0


def test_assignment_partitioning_invariance(spark, tiny):
    """The assignment is a pure function of the DATA: repartitioning
    either side (and scrambling row order) must not change any
    (pub, cluster, fused) — the determinism property the max(struct)
    tie-break and the hash-free scoring exist to guarantee."""
    new = spark.createDataFrame(
        [
            _pub("b", "n1", ["alpha", "zeta"], ["ann"], "vX"),
            _pub("b", "n2", ["gamma"], ["bob"], "v2"),
            _pub("b", "n3", ["omega"], ["nobody"], "vY"),
        ],
        PUB_SCHEMA,
    )
    base = sorted(
        (r.block_key, r.pub_id, r.cluster_id, None if r.fused is None
         else round(r.fused, 12))
        for r in assign_to_clusters(new, tiny, DEFAULT_CONFIG).collect()
    )
    scrambled = sorted(
        (r.block_key, r.pub_id, r.cluster_id, None if r.fused is None
         else round(r.fused, 12))
        for r in assign_to_clusters(
            new.repartition(7, "pub_id").sortWithinPartitions(
                F.desc("pub_id")
            ),
            tiny.repartition(5).sortWithinPartitions(F.desc("pub_id")),
            DEFAULT_CONFIG,
        ).collect()
    )
    assert base == scrambled
