"""End-to-end gates on the reference's REAL labeled AMiner corpus
(SURVEY §5; VERDICT r1 'prove F1 on real labeled data').

The reference's own archived AMiner runs
(``experimental-results/{name}_output.txt`` vs ``{name}_ans.txt``)
measure macro P 0.954 / R 0.856 / F1 0.892 over 100 blocks — with the
true per-block cluster count handed to GHAC (the reference's classify
mode, ``name_disambiguation.py:1229-1233``). The F1 >= 0.99 north-rule
bar is evidenced on the deterministic labeled fixtures
(test_pipeline_e2e); THESE tests pin the engine's measured floor on
the real corpus so regressions in parsing, tokenization, edge
building, fusion, or clustering show up as hard failures:

- XML ingestion parses every publication of every block bit-true
  (sha256 invariant vs the original reference bytes),
- unsupervised CC path:   macro precision >= 0.84, F1 >= 0.75 on the
  22-block subset (round-5 defaults measured 0.8474 / 0.7555 there —
  rescue-off, amb-tier semantic merge theta 0.90, mutual-top1+margin
  / maxdoc rules, 2-round fixpoint; full 114-block corpus: P 0.9253,
  F1 0.8398, every round-5 step zero blocks regressing > 0.02),
- fixed-k GHAC parity:    macro F1 >= 0.73 on the subset (measured
  0.758 there; the subset run has no doc_vecs, so the round-4
  capture-selection menu is structural-only and measures the same as
  round 3; reference's own archived runs 0.89).
  Subset macros differ from corpus macros because per-block F1 varies
  widely — the floors pin THIS subset's measured values.

A 20-block subset keeps the suite fast; the full 110-block numbers
live in REFERENCE_EVAL*.md (tools/eval_reference_corpus.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hgcn_name_disambiguation_spark.config import DEFAULT_CONFIG
from hgcn_name_disambiguation_spark.fixtures.reference_corpus import (
    iter_reference_rows,
    load_reference_repo_files,
    reference_archived_results,
    reference_available,
)
from hgcn_name_disambiguation_spark.operators.evaluate import pairwise_metrics
from hgcn_name_disambiguation_spark.operators.parity import ghac_clusters
from hgcn_name_disambiguation_spark.plans.pipeline import run_pipeline

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference corpus not mounted"
)

# deterministic subset: every 5th block by sorted name (22 of 110)
_ALL = sorted({r[1].split("/")[-1][:-4] for r in iter_reference_rows(
    subdirs=("raw-data",))})
SUBSET = _ALL[::5]


@pytest.fixture(scope="module")
def corpus(spark):
    rf = load_reference_repo_files(spark, subdirs=("raw-data",), names=SUBSET)
    rf = rf.cache()
    rf.count()
    return rf


@pytest.fixture(scope="module")
def result(corpus):
    return run_pipeline(corpus, DEFAULT_CONFIG)


def test_xml_ingestion_bit_true(corpus, result):
    """sha2(content) of every PARSED row survives to the clustered
    output unchanged (north-rule per-row invariant on real reference
    bytes), and the only dropped rows are exactly the ones the
    reference itself skips: publications with missing/empty id, label,
    or title text (``name_disambiguation.py:824-826`` — e.g. John
    Smith's two ``<title />`` records)."""
    out_sha = result.clustered.select("content_sha").distinct()
    src = corpus.select(
        F.sha2("content", 256).alias("content_sha"), "content"
    )
    # every output sha came from a source row
    assert out_sha.join(src, "content_sha", "left_anti").count() == 0
    # dropped rows are reference-skippable: no non-empty title AND id
    # AND label all present
    dropped = src.join(out_sha, "content_sha", "left_anti")
    complete = (
        F.col("content").rlike(r"(?s)<title>[^<]+</title>")
        & F.col("content").rlike(r"(?s)<id>[^<]+</id>")
        & F.col("content").rlike(r"(?s)<label>[^<]+</label>")
    )
    assert dropped.where(complete).count() == 0
    # labels and titles actually extracted on everything kept
    pubs = result.pubs
    assert pubs.where(F.col("label").isNull()).count() == 0
    assert pubs.where(F.col("title").isNull()).count() == 0


def test_cc_path_floor(result):
    m = result.metrics.agg(
        F.avg("precision").alias("p"), F.avg("f1").alias("f")
    ).first()
    assert m.p >= 0.84, f"macro precision regressed: {m.p:.4f}"
    assert m.f >= 0.75, f"macro F1 regressed: {m.f:.4f}"


def test_ghac_fixed_k_floor(result):
    g = ghac_clusters(
        result.pubs, result.scored, DEFAULT_CONFIG, k_from_labels=True
    )
    cl = (
        g.join(
            result.pubs.select("block_key", "pub_id", "label"),
            ["block_key", "pub_id"],
        )
        .join(
            result.clustered.select(
                "block_key", "pub_id", F.col("cluster_id").alias("cc")
            ),
            ["block_key", "pub_id"],
        )
        .select(
            "block_key",
            "pub_id",
            "label",
            # operator contract: hac_cluster = -1 marks blocks above
            # the dense cap — fall back to the CC assignment there
            F.when(
                F.col("hac_cluster") >= 0,
                F.concat(F.lit("h"), F.col("hac_cluster")),
            )
            .otherwise(F.concat(F.lit("c"), F.col("cc")))
            .alias("cluster_id"),
        )
    )
    m = pairwise_metrics(cl).agg(F.avg("f1").alias("f")).first()
    assert m.f >= 0.73, f"GHAC macro F1 regressed: {m.f:.4f}"


def test_archived_reference_results_parse():
    """The archived-results reader finds the reference's own AMiner
    runs and their metrics land in the published range."""
    res = reference_archived_results()
    assert len(res) >= 90
    f1 = sum(v[2] for v in res.values()) / len(res)
    assert 0.85 <= f1 <= 0.95
