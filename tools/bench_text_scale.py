"""Text/dedup-operator scaling bench: duplicated-span stats/removal,
OOV scoring, corpus composition, and production MinHash+LSH wall-clock
vs document count — the single-shuffle-family linearity claim for the
round-5 training-data ops.

Input is the sf0.1 documents table replicated K times with every
token SALTED by the copy index (tok -> tok_k): gram/shingle/token
vocabularies are disjoint across copies, so per-copy duplicate
structure is IDENTICAL and every corpus-wide count scales exactly K x
— the controlled variable a linearity claim needs. (Naive replication
would instead make every doc an exact dup of its K-1 copies and blow
up the duplicated-gram set superlinearly between K=1 and K>=2.)
Deterministic, no external data.

Usage: python tools/bench_text_scale.py [--scales 1,2,4,8] [--repeats 2]
Prints one JSON line per scale and a summary with per-op
wall-vs-docs ratios normalized to scale 1 (min-of-repeats walls; this
host has documented ~2x run-to-run noise windows).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from hgcn_name_disambiguation_spark.operators.curation import (  # noqa: E402
    corpus_composition,
)
from hgcn_name_disambiguation_spark.operators.dedup import (  # noqa: E402
    dup_span_stats,
    minhash_lsh_pairs,
    remove_dup_spans,
    repo_fork_pairs,
)
from hgcn_name_disambiguation_spark.operators.code_quality import (  # noqa: E402
    code_quality_metrics,
    latest_snapshot,
    scan_secrets,
)
from hgcn_name_disambiguation_spark.operators.textstats import (  # noqa: E402
    oov_stats,
)


def _as_code_files(d, path_mod: int | None = None):
    """Code-files shape from the salted docs: repos disjoint per copy,
    one path per doc (or per doc_id % path_mod inside each copy, so
    snapshot histories have a scale-constant version count while the
    file count grows K x)."""
    if path_mod is None:
        path = F.concat(F.lit("f"), F.col("doc_id").cast("string"))
        repo_key = F.pmod(F.pmod("doc_id", F.lit(10_000_000)), F.lit(40))
    else:
        # repo derives from the PATH residue (as q88 does) so each
        # (repo, path) key carries the full multi-version history
        path_res = F.pmod(F.pmod("doc_id", F.lit(10_000_000)), F.lit(path_mod))
        path = F.concat(
            F.lit("f"),
            F.expr("doc_id DIV 10000000").cast("string"),
            F.lit("_"),
            path_res.cast("string"),
        )
        repo_key = F.pmod(path_res, F.lit(40))
    return d.select(
        F.concat(
            F.lit("r"),
            F.expr("doc_id DIV 10000000").cast("string"),
            F.lit("_"),
            repo_key.cast("string"),
        ).alias("repo"),
        path.alias("path"),
        F.concat(
            F.lit("c"), F.lpad(F.col("doc_id").cast("string"), 10, "0")
        ).alias("commit"),
        F.col("text").alias("content"),
    )


def replicated_salted(spark, sf_dir: str, k: int):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    copies = spark.range(k).select(F.col("id").cast("int").alias("_c"))
    salted = F.concat_ws(
        " ",
        F.transform(
            F.split(F.col("text"), r"\s+"),
            lambda t: F.concat(t, F.lit("_"), F.col("_c").cast("string")),
        ),
    )
    return base.crossJoin(F.broadcast(copies)).select(
        (F.col("doc_id") + F.col("_c") * F.lit(10_000_000)).alias("doc_id"),
        salted.alias("text"),
        "lang",
        "source",
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,2,4,8")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args(argv)

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("bench_text_scale")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def timed(thunk):
        best, n = None, None
        for _ in range(max(1, args.repeats)):
            t0 = time.perf_counter()
            n = thunk()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best, n

    ops = {
        "span": lambda d: dup_span_stats(d, k=8, min_count=2).count(),
        "remove": lambda d: remove_dup_spans(d, k=8, min_count=2).count(),
        "oov": lambda d: oov_stats(d, vocab_size=1000).count(),
        "comp": lambda d: corpus_composition(d, dup_key_tokens=5).count(),
        "minhash": lambda d: minhash_lsh_pairs(
            d, n=3, num_hashes=64, bands=16, threshold=0.5,
            hash_mode="xxhash64",
        ).count(),
        # repo-level fork detection over the derived repo-files shape:
        # repos are per-copy disjoint (copy index folded into the repo
        # name) and fingerprints are salt-disjoint across copies, so
        # the fork-pair count scales exactly K x
        "fork": lambda d: repo_fork_pairs(
            d.select(
                F.concat(
                    F.lit("r"),
                    F.expr("doc_id DIV 10000000").cast("string"),
                    F.lit("_"),
                    F.pmod("doc_id", F.lit(40)).cast("string"),
                ).alias("repo"),
                F.concat(
                    F.lit("f"), F.col("doc_id").cast("string")
                ).alias("path"),
                F.col("text").alias("content"),
            ),
            max_hash_repos=20,
            min_shared=5,
        ).count(),
        # code-curation family: two narrow scan projections and the
        # single (repo, path) window shuffle of snapshot resolution
        "quality": lambda d: code_quality_metrics(_as_code_files(d)).count(),
        "secrets": lambda d: scan_secrets(_as_code_files(d)).count(),
        "snapshot": lambda d: latest_snapshot(
            _as_code_files(d, path_mod=197)
        ).count(),
    }

    results = []
    for k in [int(s) for s in args.scales.split(",")]:
        docs = replicated_salted(spark, args.sf_dir, k).localCheckpoint(
            eager=True
        )
        n_docs = docs.count()
        row = {"scale": k, "docs": n_docs}
        for name, op in ops.items():
            wall, n = timed(lambda op=op: op(docs))
            row[f"{name}_rows"] = n
            row[f"{name}_s"] = round(wall, 2)
        results.append(row)
        print(json.dumps(row), flush=True)

    base = results[0]
    summary = {
        "metric": "text_ops_scaling",
        "sf_dir": args.sf_dir,
        "rows": results,
        "wall_ratio_per_doc_ratio": {
            op: [
                round(
                    (r[f"{op}_s"] / base[f"{op}_s"])
                    / (r["docs"] / base["docs"]),
                    3,
                )
                for r in results
            ]
            for op in (
                "span", "remove", "oov", "comp", "minhash", "fork",
                "quality", "secrets", "snapshot",
            )
        },
        "repeats": args.repeats,
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
