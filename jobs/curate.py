"""spark-submit entry point for the training-data curation pipeline.

Chains the dataset-curation operators over a documents table
(doc_id, text, lang, ...) the way a pretraining-corpus run does:

  1. exact dedup            keep one doc per normalized-content hash
  2. MinHash+LSH near-dedup drop near-duplicate cluster members
  3. decontamination        drop docs sharing n-gram spans with an
                            eval/benchmark set (--eval-set parquet)
  4. quality filtering      Gopher-style repetition flags
  5. stratified sampling    per-stratum md5-cutoff rates (--rates JSON)
  6. sequence packing       concat-then-chunk offsets for the survivors

    spark-submit --master <cluster-or-local[N]> \
        --py-files dist/hgcn_name_disambiguation_spark.zip \
        jobs/curate.py \
        --input /path/to/documents_parquet --output /path/to/out \
        [--eval-set /path/to/eval_parquet] [--rates '{"en":0.5}'] \
        [--seq-len 2048] [--ngram 5] [--jaccard 0.8]

Every stage is a counted, named step; the funnel (rows in -> rows out
per stage) prints as one JSON line and lands in ``<output>/funnel``.
Survivor docs + packing offsets land in ``<output>/packed``. The
session builder sets NO master: spark-submit owns cluster sizing.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def build_session(app_name: str, shuffle_partitions: int) -> SparkSession:
    return (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def curate(
    docs: DataFrame,
    eval_docs: DataFrame | None,
    rates: dict[str, float] | None,
    seq_len: int,
    ngram: int,
    jaccard: float,
    seed: int = 42,
    stratum_col: str = "lang",
) -> tuple[DataFrame, list[tuple[str, int]]]:
    """The funnel as a composable function (jobs + tests share it).

    Returns (packed survivors, [(stage, rows_after), ...]).
    """
    from hgcn_name_disambiguation_spark.operators.curation import (
        contamination_flags,
        pack_sequences,
        repetition_features,
        stratified_sample,
    )
    from hgcn_name_disambiguation_spark.operators.dedup import (
        dedup_clusters,
        exact_duplicates,
        minhash_lsh_pairs,
    )

    # each stage's surviving frame is persisted (MEMORY_AND_DISK):
    # the per-stage funnel counts and every downstream stage otherwise
    # recompute the whole upstream funnel once per action.
    funnel: list[tuple[str, int]] = [("input", docs.count())]

    # 1. exact dedup: drop every member of a dup group except keeper
    exact = exact_duplicates(docs)
    losers = exact.select(
        F.explode("member_ids").alias("doc_id"), "keeper_id"
    ).where(F.col("doc_id") != F.col("keeper_id")).select("doc_id")
    docs = docs.join(losers, "doc_id", "left_anti").persist()
    funnel.append(("exact_dedup", docs.count()))

    # 2. near-dedup: MinHash+LSH pairs -> CC groups -> keep min id.
    # dedup_clusters emits string ids; cast back to the input frame's
    # native doc_id type (a blind cast-to-long silently nulls every id
    # for string-keyed corpora and turns this stage into a no-op).
    doc_id_type = dict(docs.dtypes)["doc_id"]
    pairs = minhash_lsh_pairs(docs, n=ngram, threshold=jaccard)
    groups = dedup_clusters(pairs.select("id_a", "id_b")).withColumn(
        "doc_id", F.col("doc_id").cast(doc_id_type)
    )
    keepers = groups.groupBy("group_id").agg(
        F.min("doc_id").alias("keeper_id")
    )
    near_losers = (
        groups.join(keepers, "group_id")
        .where(F.col("doc_id") != F.col("keeper_id"))
        .select("doc_id")
    )
    docs = docs.join(near_losers, "doc_id", "left_anti").persist()
    funnel.append(("near_dedup", docs.count()))

    # 3. decontamination against the eval set (skip when none given)
    if eval_docs is not None:
        flags = contamination_flags(docs, eval_docs, n=ngram)
        docs = docs.join(
            flags.where(F.col("contaminated") == 1).select("doc_id"),
            "doc_id",
            "left_anti",
        ).persist()
        funnel.append(("decontaminate", docs.count()))

    # 4. repetition quality filter
    rep = repetition_features(docs)
    docs = docs.join(
        rep.where(F.col("repetitive") == 1).select("doc_id"),
        "doc_id",
        "left_anti",
    ).persist()
    funnel.append(("repetition_filter", docs.count()))

    # 5. stratified sampling (identity when no rates given)
    if rates:
        docs = stratified_sample(
            docs, rates, stratum_col=stratum_col, seed=seed
        )
        funnel.append(("stratified_sample", docs.count()))

    # 6. sequence packing over the survivors
    packed = pack_sequences(docs, seq_len=seq_len)
    funnel.append(("packed", packed.count()))
    return packed, funnel


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True)
    ap.add_argument("--eval-set", default=None,
                    help="benchmark/eval parquet (doc_id, text) to "
                    "decontaminate against; stage skipped when absent")
    ap.add_argument("--rates", default=None,
                    help='per-stratum sampling rates as JSON, e.g. '
                    '\'{"en": 0.5, "de": 0.25}\'; stage skipped when absent')
    ap.add_argument("--stratum-col", default="lang")
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--ngram", type=int, default=5)
    ap.add_argument("--jaccard", type=float, default=0.8)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--shuffle-partitions", type=int, default=64)
    args = ap.parse_args(argv)

    spark = build_session("curate", args.shuffle_partitions)
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.perf_counter()

    docs = spark.read.parquet(args.input)
    eval_docs = spark.read.parquet(args.eval_set) if args.eval_set else None
    rates = json.loads(args.rates) if args.rates else None

    packed, funnel = curate(
        docs, eval_docs, rates, args.seq_len, args.ngram, args.jaccard,
        seed=args.seed, stratum_col=args.stratum_col,
    )
    packed.write.mode("overwrite").parquet(f"{args.output}/packed")
    spark.createDataFrame(
        funnel, "stage string, rows long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{args.output}/funnel")

    print(json.dumps({
        "funnel": dict(funnel),
        "wall_s": round(time.perf_counter() - t0, 2),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
