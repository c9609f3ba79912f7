"""Semantic cluster merge (operators/cluster_merge.py): centroid
cosine merging, focal-signature veto, eligibility gating."""

from pyspark.sql import functions as F

from hgcn_name_disambiguation_spark.operators.cluster_merge import (
    semantic_cluster_merge,
)


def _frames(spark, sig_rows=None):
    # block 'b': clusters c1 {p1,p2} and c2 {p3,p4} share a topic
    # direction; cluster c3 {p5} points elsewhere.
    clustered = spark.createDataFrame(
        [
            ("b", "p1", "c1"), ("b", "p2", "c1"),
            ("b", "p3", "c2"), ("b", "p4", "c2"),
            ("b", "p5", "c3"),
        ],
        ["block_key", "pub_id", "cluster_id"],
    )
    doc_vecs = spark.createDataFrame(
        [
            ("b", "p1", [1.0, 0.1]), ("b", "p2", [0.9, 0.0]),
            ("b", "p3", [1.0, 0.0]), ("b", "p4", [0.8, 0.1]),
            ("b", "p5", [0.0, 1.0]),
        ],
        ["block_key", "pub_id", "vec"],
    )
    sigs = spark.createDataFrame(
        sig_rows
        or [("b", p, None) for p in ["p1", "p2", "p3", "p4", "p5"]],
        "block_key string, pub_id string, sig array<string>",
    )
    return clustered, doc_vecs, sigs


def _clusters(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.cluster_id, set()).add(r.pub_id)
    return {frozenset(v) for v in out.values()}


def test_merge_by_centroid_cosine(spark):
    clustered, doc_vecs, sigs = _frames(spark)
    eligible = spark.createDataFrame([("b", 0.8)], ["block_key", "theta"])
    got = _clusters(semantic_cluster_merge(clustered, doc_vecs, sigs, eligible))
    # c1+c2 merge (centroid cos ~0.999 >= 0.8); c3 stays (cos ~0.07)
    assert frozenset({"p1", "p2", "p3", "p4"}) in got
    assert frozenset({"p5"}) in got


def test_merge_vetoed_by_incompatible_sigs(spark):
    sig_rows = [
        ("b", "p1", ["john", "a"]), ("b", "p2", None),
        ("b", "p3", ["john", "w"]), ("b", "p4", None),
        ("b", "p5", None),
    ]
    clustered, doc_vecs, sigs = _frames(spark, sig_rows)
    eligible = spark.createDataFrame([("b", 0.8)], ["block_key", "theta"])
    got = _clusters(semantic_cluster_merge(clustered, doc_vecs, sigs, eligible))
    # same centroids, but 'john a' vs 'john w' vetoes the merge
    assert frozenset({"p1", "p2"}) in got
    assert frozenset({"p3", "p4"}) in got


def test_ineligible_block_untouched(spark):
    clustered, doc_vecs, sigs = _frames(spark)
    eligible = spark.createDataFrame(
        [("other", 0.8)], ["block_key", "theta"]
    )
    got = _clusters(semantic_cluster_merge(clustered, doc_vecs, sigs, eligible))
    assert frozenset({"p1", "p2"}) in got and frozenset({"p3", "p4"}) in got


def test_compatible_sigs_do_not_veto(spark):
    sig_rows = [
        ("b", "p1", ["john", "a"]), ("b", "p2", None),
        ("b", "p3", ["j"]), ("b", "p4", None),  # initial-compatible
        ("b", "p5", None),
    ]
    clustered, doc_vecs, sigs = _frames(spark, sig_rows)
    eligible = spark.createDataFrame([("b", 0.8)], ["block_key", "theta"])
    got = _clusters(semantic_cluster_merge(clustered, doc_vecs, sigs, eligible))
    assert frozenset({"p1", "p2", "p3", "p4"}) in got
