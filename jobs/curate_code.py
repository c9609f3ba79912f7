"""spark-submit entry point for the CODE-corpus curation pipeline.

Chains the code-quality operators over the engine's north-rule table
shape — (repo, path, commit, lang, content) — the way a code
pretraining corpus is prepared:

  1. snapshot resolution   newest version per (repo, path), content
                           sha256 attached (the per-row invariant)
  2. exact dedup           keep one file per content sha across repos
                           (vendored/copied files collapse to one)
  3. quality screens       StarCoder-style line-length / alpha /
                           autogen keep decision
  4. secret gate           drop files carrying credential patterns
  5. license report        per-repo license family + corpus rollup
                           (side output — licensing is a REPORTING
                           concern here, not a row filter)

    spark-submit --master <cluster-or-local[N]> \
        --py-files dist/hgcn_name_disambiguation_spark.zip \
        jobs/curate_code.py \
        --input /path/to/repo_files_parquet --output /path/to/out \
        [--max-line-len 1000] [--min-alpha-ppm 250000]

The funnel (rows in -> rows out per stage) prints as one JSON line
and lands in ``<output>/funnel``; survivors in ``<output>/kept``;
the license report in ``<output>/licenses``. The session builder
sets NO master: spark-submit owns cluster sizing.

Scale notes: stage 1 is the single (repo, path) window shuffle, stage
2 one sha-keyed window — both AQE-skew-handled; stages 3-4 are narrow
codegen scans; stage 5 is bounded by repos x license labels. Nothing
driver-resident grows with the corpus.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def build_session(app_name: str, shuffle_partitions: int) -> SparkSession:
    return (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def curate_code(
    files: DataFrame,
    max_line_len: int = 1000,
    min_alpha_ppm: int = 250_000,
    min_chars: int = 20,
    max_chars: int = 1_000_000,
) -> tuple[DataFrame, DataFrame, list[tuple[str, int]]]:
    """The code funnel as a composable function (job + tests share it).

    Returns (kept files, per-repo license report, funnel counts).
    Kept-file columns: repo, path, commit, lang (when present),
    content_sha, content + the quality metric columns.
    """
    from hgcn_name_disambiguation_spark.operators.code_quality import (
        code_quality_metrics,
        latest_snapshot,
        license_composition,
        scan_secrets,
    )

    funnel: list[tuple[str, int]] = [("input", files.count())]

    # 1. snapshot resolution — latest_snapshot keys the winning
    # version; join back on the full key to carry lang + content
    # (broadcast never: both sides are corpus-sized; it's an equi-join
    # on the same (repo, path) key the window just partitioned by).
    # Input contract: (repo, path, commit) uniquely identifies a file
    # version — a dirty history export with duplicate keys and
    # differing content keeps all duplicates here (latest_snapshot
    # itself tie-breaks deterministically, but the join-back restores
    # every row of the winning key).
    winners = latest_snapshot(files).select("repo", "path", "commit")
    snapshot = files.join(winners, ["repo", "path", "commit"]).withColumn(
        "content_sha", F.sha2(F.col("content"), 256)
    ).persist()
    snap = snapshot
    funnel.append(("snapshot", snap.count()))

    # 2. cross-repo exact dedup on the content sha (deterministic
    # keeper: lexicographically smallest (repo, path))
    w = Window.partitionBy("content_sha").orderBy("repo", "path")
    snap = (
        snap.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .persist()
    )
    funnel.append(("exact_dedup", snap.count()))

    # 3. quality screens (content retained for the secret scan + sink)
    scored = code_quality_metrics(
        snap,
        max_line_len=max_line_len,
        min_alpha_ppm=min_alpha_ppm,
        min_chars=min_chars,
        max_chars=max_chars,
        drop_content=False,
    )
    scored = scored.where(F.col("keep") == 1).persist()
    funnel.append(("quality", scored.count()))

    # 4. secret gate
    kept = (
        scan_secrets(scored, drop_content=False)
        .where(F.col("has_secret") == 0)
        .drop("aws_keys", "private_keys", "hex40_tokens", "has_secret")
        .persist()
    )
    funnel.append(("secret_gate", kept.count()))

    # 5. license report over the POST-snapshot corpus (reporting, not
    # filtering: repos keep their files — including vendored copies
    # the cross-repo dedup later collapses, so the PRE-dedup snapshot
    # frame is the right input; the report is what a downstream
    # compliance pass consumes)
    licenses = license_composition(snapshot)
    return kept, licenses, funnel


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="repo-files parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--max-line-len", type=int, default=1000)
    ap.add_argument("--min-alpha-ppm", type=int, default=250_000)
    ap.add_argument("--min-chars", type=int, default=20)
    ap.add_argument("--max-chars", type=int, default=1_000_000)
    ap.add_argument("--shuffle-partitions", type=int, default=64)
    args = ap.parse_args(argv)

    spark = build_session("curate_code", args.shuffle_partitions)
    t0 = time.time()
    files = spark.read.parquet(args.input)
    kept, licenses, funnel = curate_code(
        files,
        max_line_len=args.max_line_len,
        min_alpha_ppm=args.min_alpha_ppm,
        min_chars=args.min_chars,
        max_chars=args.max_chars,
    )
    kept.write.mode("overwrite").parquet(f"{args.output}/kept")
    licenses.write.mode("overwrite").parquet(f"{args.output}/licenses")
    report = {
        "metric": "curate_code_funnel",
        "stages": {name: n for name, n in funnel},
        "wall_sec": round(time.time() - t0, 2),
    }
    # .text() so the sink holds the raw JSON line itself (a .json()
    # writer would nest it as a string inside another JSON object)
    spark.createDataFrame(
        [(json.dumps(report),)], "value string"
    ).coalesce(1).write.mode("overwrite").text(f"{args.output}/funnel")
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
