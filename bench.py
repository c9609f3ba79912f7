"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also reports candidate_pairs_per_sec for the ER pipeline (the
BASELINE.json headline metric) via the er_bench fixture when
SPARK_GRAFT_ER_BENCH=1 (see tools/bench_scaling.py for the N-vs-4N
parallelism run).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from hgcn_name_disambiguation_spark.session import get_spark

# Headline set: the flagship ER clustering + one per operator family.
BENCH_QUERIES = [
    "q01_pricing_summary",
    "q02_region_revenue",
    "q03_topk_per_group",
    "q05_majority_priority",
    "q07_rollup_revenue",
    "q08_sessionize",
    "q09_quality_stats",
    "q13_exact_dups",
    "q14_ngram_jaccard",
    "q15_emb_neardup_exact",
    "q16_knn_brute",
    "q17_er_metrics",
    "q18_er_clusters",
    "q19_minhash_lsh",
    "q20_simhash",
    "q21_knn_lsh",
    # auto-sized LSH twin: exercises the data-dependent plane sizing
    # (num_planes=None) so the scale path is benched, not just tested
    "q35_knn_lsh_auto",
    # round-3 graph ops: walk corpus, BFS negative weights, fused
    # feature propagation (iterative-join shapes)
    "q36_metapath_walks",
    "q37_bfs_negative_weights",
    "q38_feature_propagation",
    # round-4 training-triple emission (G3): window self-join +
    # deterministic distance-proportional negative draws
    "q49_walk_training_pairs",
    # round-3 semantic featurization (A3): per-component weighted agg
    "q41_semantic_docvecs",
    # curation ops: broadcast decontamination + repetition signals +
    # distributed-prefix-sum sequence packing
    "q42_contamination",
    "q44_repetition_filter",
    "q46_sequence_packing",
    "q48_pii_redaction",
    # round-4 LM quality scoring (corpus bigram model)
    "q50_bigram_logprob",
    # round-5 incremental cluster assignment (snapshot profiles +
    # stream-static candidate joins + one max(struct) argmax agg)
    "q51_cluster_assignment",
    # round-5 near-dup canonicalization: LSH pairs resolved through
    # large-star/small-star CC into a per-doc keep-list
    "q52_neardup_keep_list",
    # round-5 exact duplicated-substring spans (Lee et al. 2022):
    # corpus-wide gram-count shuffle + running-max span merge, and the
    # removal half (broadcast hit join + narrow token filter)
    "q53_dup_span_stats",
    "q54_remove_dup_spans",
    # round-5 tokenizer-prep OOV: top-K vocab (TakeOrdered) broadcast
    # against the token stream
    "q55_oov_stats",
    # round-5 dataset-mixing composition report (dup-key shuffle +
    # stratum agg) and the JSON+date scalar-function rollup
    "q56_corpus_composition",
    "q57_event_props_rollup",
    # round-5 embedding QA (brute leave-one-out kNN + label joins) and
    # DSIR data selection (hashed-ngram models broadcast as a 10^4-row
    # log-ratio table; TakeOrdered top-k flag)
    "q58_knn_label_agreement",
    "q59_dsir_selection",
    # round-5 temporal joins: as-of (union-scan + last-ignorenulls
    # window) and bucketed range join (2-row probe explode, equi-join)
    "q60_asof_last_view",
    "q61_range_join_error_attribution",
    # round-5 event-time windows (tumbling + hopping) and mutual-kNN
    # graph triangle counting (ID-oriented wedge join)
    "q62_event_time_windows",
    "q63_mutual_knn_triangles",
    # round-5 funnel analysis (per-step conditional-min aggs on one key)
    "q64_funnel_stages",
    # round-5 SemDeDup: hash-min-k centroid draw + one within-cell
    # theta self-join; kept = farthest-from-centroid per near-dup pair
    "q65_semantic_dedup",
    # round-5 integer-arithmetic PageRank (one join + one agg per
    # iteration over the sparse evidence graph)
    "q66_pagerank",
    # round-5 deterministic distinct-count sketch (md5 order
    # statistics: threshold sampling + KMV)
    "q67_distinct_sketch",
    # round-5 exact nearest-rank percentiles + weekly retention cohorts
    "q68_exact_percentiles",
    "q69_retention_cohorts",
    # round-5 profiling ops: skew diagnostic (count-shuffle +
    # TakeOrderedAndProject), lift-ranked salient terms, single-
    # exchange percentile-rank scaling
    "q70_key_skew_profile",
    "q72_distinctive_terms",
    "q73_rank_normalize",
    # round-5 corpus-diversity entropy (integer micro-nats)
    "q75_source_entropy",
    # round-5 MOSS winnowing clone detection (window-min fingerprints,
    # stop-fingerprint-capped inverted-index self-join) and the Hampel
    # per-source MAD outlier screen
    "q79_clone_pairs",
    "q80_mad_anomalies",
    # round-5 Fellegi-Sunter channel-weight estimation (one agg over
    # blocked labeled pairs) and hybrid retrieval (dense brute-kNN +
    # sparse TF-IDF inverted index, fused by integer-ppm RRF)
    "q81_fs_channel_weights",
    "q83_rrf_hybrid",
    # round-5 repo-level fork detection: per-file winnowing
    # fingerprints unioned per repo, stop-fp-capped self-join,
    # containment-thresholded transitive fork families via CC
    "q84_repo_fork_pairs",
    "q85_fork_families",
    # round-5 code-corpus curation: StarCoder-style quality screens
    # (narrow codegen scan) and latest-commit snapshot resolution
    # (one (repo, path) window shuffle + per-row sha256)
    "q86_code_quality",
    "q88_repo_snapshot",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) * 2, 16),
        # 20 queries run sequentially in ONE local-mode JVM and the
        # iterative ops (CC, walks, BFS) localCheckpoint per round —
        # those cached partitions accumulate across queries, and the
        # 1g default heap OOMs near the end at sf0.1. On a cluster the
        # executors are sized per-job; here the single JVM needs room.
        extra_conf={"spark.driver.memory": "8g"},
    )
    qs = entry_mod.queries()

    # SPARK_GRAFT_BENCH_REPEATS=k reports best-of-k per query. Host
    # noise on this box is measured >= 2x run-to-run, and the round-2
    # review traced two "regressions" to single-shot noise — default 2
    # trades ~90s of wall for repeat-stable numbers.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2")))
    timings: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        fn = qs[name]
        best, n = None, 0
        for _ in range(repeats):
            t0 = time.perf_counter()
            # count() forces full execution without driver-side collect
            n = fn(spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 3)
            best = dt if best is None else min(best, dt)
        timings[name] = best
        total += best
        print(f"# {name}: {best:.3f}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": int(cpus),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
