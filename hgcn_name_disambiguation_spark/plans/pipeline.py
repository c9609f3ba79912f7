"""End-to-end disambiguation pipeline (SURVEY §7.2 M0-M5).

One Spark job over ALL name blocks at once — the reference's per-name
sequential loop (``name_disambiguation.py:785``,
``batch_disambiguation.py:94-101``) becomes a single DAG where
``block_key`` is just a column. Stages:

  repo_files --parse--> pubs --edges--> combined_edges --fuse-->
  scored pairs --threshold--> match graph --CC--> clustered pubs
  --evaluate--> per-block P/R/F1

Each stage is exposed separately for checkpoint/resume (plans.stages);
this module is the pure dataflow.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..operators.candidate_pairs import combined_edges
from ..operators.clustering import assign_clusters, refine_clusters
from ..operators.evaluate import metrics_summary, pairwise_metrics
from ..operators.parse import parse_publications
from ..operators.scoring import enrich_scores, fuse_scores, threshold_matches


@dataclass
class PipelineResult:
    pubs: DataFrame
    edges: DataFrame
    scored: DataFrame
    matches: DataFrame
    clustered: DataFrame
    metrics: DataFrame


def compute_matches(
    pubs: DataFrame,
    edges: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> tuple[DataFrame, DataFrame]:
    """Score edges and threshold them into the match graph, honoring
    ``config.enrich``. Single source of truth for the score→match step
    so batch (run_pipeline) and streaming (streaming.incremental) stay
    result-identical on the same input + config."""
    scored = fuse_scores(edges, config)
    if config.enrich:
        scored = enrich_scores(scored, pubs, config)
        matches = threshold_matches(scored, config, score_col="score_enriched")
    else:
        matches = threshold_matches(scored, config)
    return scored, matches


def cluster_matches(
    pubs: DataFrame,
    scored: DataFrame,
    matches: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Match graph -> cluster assignment, honoring
    ``config.cluster_refine_rounds`` (shared by batch + streaming)."""
    clustered = assign_clusters(pubs, matches, config)
    if config.cluster_refine_rounds > 0:
        clustered = refine_clusters(clustered, scored, config)
    return clustered


def run_pipeline(
    repo_files: DataFrame, config: PipelineConfig = DEFAULT_CONFIG
) -> PipelineResult:
    pubs = parse_publications(repo_files, config)
    edges = combined_edges(pubs, config)
    scored, matches = compute_matches(pubs, edges, config)
    clustered = cluster_matches(pubs, scored, matches, config)
    metrics = pairwise_metrics(clustered)
    return PipelineResult(pubs, edges, scored, matches, clustered, metrics)


def verify_content_sha(repo_files: DataFrame, clustered: DataFrame) -> bool:
    """North-rule per-row invariant: every input row's sha2(content,256)
    survives to the clustered output unchanged (anti-join is empty both
    ways on the parsed-lang rows)."""
    src = repo_files.where(F.col("lang").isin("json", "xml")).select(
        F.sha2("content", 256).alias("content_sha")
    )
    out = clustered.select("content_sha")
    missing = src.exceptAll(out).count()
    extra = out.exceptAll(src).count()
    return missing == 0 and extra == 0


def summarize(result: PipelineResult) -> DataFrame:
    return metrics_summary(result.metrics)
