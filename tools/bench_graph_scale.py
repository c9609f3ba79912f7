"""Graph-operator scaling bench: walk / BFS / propagation /
training-pair wall-clock vs edge count (the iterative-join linearity
claim, VERDICT r3 ask #8; r4 ask #6 adds walk_training_pairs — the
heaviest headline query — to the measured curve).

No sf1 parquet exists in the driver testdata, so the input is the
sf0.1 documents table block-replicated K times (lang -> lang#k,
doc_id offset per copy): per-block structure is IDENTICAL across
copies, so candidate-pair and edge counts scale exactly K x — the
controlled variable the linearity claim needs. Deterministic, no
external data.

Usage: python tools/bench_graph_scale.py [--scales 1,2,4,8] [--repeats 1]
Prints one JSON line per (scale, op) and a summary with per-op
wall-vs-edges ratios normalized to scale 1. With --repeats N each op
is timed N times per scale and the MIN wall is reported (this host
has documented ~2x run-to-run noise windows; min-of-N is the
noise-robust statistic for a deterministic job).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from hgcn_name_disambiguation_spark.config import PipelineConfig  # noqa: E402
from hgcn_name_disambiguation_spark.functions.text import title_tokens  # noqa: E402
from hgcn_name_disambiguation_spark.operators.candidate_pairs import (  # noqa: E402
    combined_edges,
    token_idf_index,
)
from hgcn_name_disambiguation_spark.operators.propagate import (  # noqa: E402
    feature_propagation,
)
from hgcn_name_disambiguation_spark.operators.walks import (  # noqa: E402
    bfs_negative_weights,
    metapath_walks,
    walk_training_pairs,
)


def docs_as_pubs(docs):
    return docs.select(
        F.col("block_key"),
        F.col("doc_id").cast("string").alias("pub_id"),
        F.col("text").alias("title"),
        F.array(F.col("source")).alias("authors"),
        F.col("source").alias("venue"),
        title_tokens(F.col("text"), use_stemming=False).alias("title_toks"),
    )


def replicated(spark, sf_dir: str, k: int):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    copies = spark.range(k).select(F.col("id").cast("int").alias("_c"))
    return base.crossJoin(F.broadcast(copies)).select(
        F.concat_ws("#", F.col("lang"), F.col("_c")).alias("block_key"),
        (F.col("doc_id") + F.col("_c") * F.lit(10_000_000)).alias("doc_id"),
        "text",
        "source",
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,2,4,8")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--repeats", type=int, default=1)
    args = ap.parse_args(argv)

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("bench_graph_scale")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = PipelineConfig(max_token_df_per_block=40)

    def timed(thunk):
        """(min wall over --repeats, last row count)."""
        best, n = None, None
        for _ in range(max(1, args.repeats)):
            t0 = time.perf_counter()
            n = thunk()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best, n

    results = []
    for k in [int(s) for s in args.scales.split(",")]:
        docs = replicated(spark, args.sf_dir, k)
        pubs = docs_as_pubs(docs).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        edges = combined_edges(pubs, cfg).localCheckpoint(eager=True)
        n_edges = edges.count()
        t_edges = time.perf_counter() - t0

        t_walks, n_walks = timed(
            lambda: metapath_walks(
                pubs, edges, metapath=("A", "V"), walk_length=4,
                walks_per_node=2, hash_mode="xxhash64",
            ).count()
        )

        t_bfs, n_bfs = timed(
            lambda: bfs_negative_weights(edges, max_hops=2).count()
        )

        feats = token_idf_index(pubs, cfg).select(
            "block_key", "pub_id", F.col("tok").alias("token"),
            F.col("idf").alias("w"),
        )
        t_prop, n_prop = timed(
            lambda: feature_propagation(
                pubs.select("block_key", "pub_id"), edges, feats
            ).count()
        )

        # q49's shape: walks + BFS negatives feed the skip-gram
        # training-triple emission (the heaviest headline query)
        def _train():
            walks = metapath_walks(
                pubs, edges, metapath=("A", "V"), walk_length=4,
                walks_per_node=2, hash_mode="xxhash64",
            )
            neg = bfs_negative_weights(edges, max_hops=2)
            return walk_training_pairs(
                walks, neg, walk_length=4, negatives_per_pos=3,
                hash_mode="xxhash64",
            ).count()

        t_train, n_train = timed(_train)

        row = {
            "scale": k, "edges": n_edges, "edges_s": round(t_edges, 2),
            "walk_rows": n_walks, "walks_s": round(t_walks, 2),
            "bfs_rows": n_bfs, "bfs_s": round(t_bfs, 2),
            "prop_rows": n_prop, "prop_s": round(t_prop, 2),
            "train_rows": n_train, "train_s": round(t_train, 2),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    base = results[0]
    summary = {
        "metric": "graph_ops_scaling",
        "sf_dir": args.sf_dir,
        "rows": results,
        "wall_ratio_per_edge_ratio": {
            op: [
                round(
                    (r[f"{op}_s"] / base[f"{op}_s"])
                    / (r["edges"] / base["edges"]),
                    3,
                )
                for r in results
            ]
            for op in ("walks", "bfs", "prop", "train")
        },
        "repeats": args.repeats,
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
