"""Author-info lookup over an OpenAlex NDJSON snapshot — the engine's
analog of the reference's ``retrieve_name.py`` CLI (``:1-76``), which
GETs ``api.openalex.org/people/<id>`` and prints display name, summary
stats (h_index, i10_index, 2yr_mean_citedness) and affiliations.

The REST transport has no distributed analog worth building (one
driver-side GET); the snapshot form reads the same record from the
authors dump the S6 connector ingests, with the reference's field
defaults (missing stat -> "N/A", institution fields -> Unknown/N/A):

    spark-submit --py-files dist/hgcn_name_disambiguation_spark.zip \
        jobs/lookup_author.py --id A5029006010 --snapshot /path/to/dump

Accepts the bare id, the openalex.org URL form, or the reference's
api.openalex.org/people/ URL form.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession, functions as F, types as T

# superset of openalex.AUTHOR_SCHEMA: the lookup also surfaces the
# stats/affiliation fields retrieve_name.py prints (absent fields in a
# trimmed dump read as NULL -> printed as the reference's defaults)
LOOKUP_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("display_name", T.StringType()),
        T.StructField("works_count", T.LongType()),
        T.StructField(
            "summary_stats",
            T.StructType(
                [
                    T.StructField("h_index", T.LongType()),
                    T.StructField("i10_index", T.LongType()),
                    T.StructField("2yr_mean_citedness", T.DoubleType()),
                ]
            ),
        ),
        T.StructField(
            "affiliations",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "institution",
                            T.StructType(
                                [
                                    T.StructField("id", T.StringType()),
                                    T.StructField(
                                        "display_name", T.StringType()
                                    ),
                                    T.StructField(
                                        "country_code", T.StringType()
                                    ),
                                ]
                            ),
                        )
                    ]
                )
            ),
        ),
    ]
)


def normalize_author_id(raw: str) -> str:
    """Bare id from any of the accepted forms (retrieve_name.py:7-8
    prefixes the api URL; snapshot records carry the openalex.org
    URL)."""
    return raw.rstrip("/").rsplit("/", 1)[-1]


def get_author_info(spark: SparkSession, snapshot_dir: str, raw_id: str) -> dict:
    """The reference's response dict, from the snapshot. The id filter
    pushes down to the JSON scan — one bounded read, no shuffle."""
    aid = normalize_author_id(raw_id)
    df = (
        spark.read.schema(LOOKUP_SCHEMA)
        .json(f"{snapshot_dir}/authors.jsonl")
        .where(
            F.element_at(F.split(F.col("id"), "/"), -1) == F.lit(aid)
        )
        .limit(1)
    )
    rows = df.collect()
    if not rows:
        return {"error": f"author {aid} not found in snapshot"}
    r = rows[0]
    stats = r.summary_stats
    na = lambda v: "N/A" if v is None else v  # noqa: E731
    return {
        "author_name": r.display_name or "Unknown",
        "summary_stats": {
            "h_index": na(stats.h_index if stats else None),
            "i10_index": na(stats.i10_index if stats else None),
            "2yr_mean_citedness": na(
                stats["2yr_mean_citedness"] if stats else None
            ),
        },
        "institutions": [
            {
                "name": (a.institution.display_name if a.institution else None)
                or "Unknown",
                "id": (a.institution.id if a.institution else None) or "N/A",
                "country": (
                    a.institution.country_code if a.institution else None
                )
                or "N/A",
            }
            for a in (r.affiliations or [])
        ],
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--id", required=True,
                    help="OpenAlex author id (e.g. A5029006010) or URL")
    ap.add_argument("--snapshot", required=True,
                    help="snapshot dir containing authors.jsonl")
    ap.add_argument("--json", action="store_true",
                    help="emit the raw dict as one JSON line")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("lookup-author").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    info = get_author_info(spark, args.snapshot, args.id)
    if args.json:
        print(json.dumps(info))
    elif "error" in info:
        print("Error:", info["error"])
    else:
        # the reference CLI's print layout (retrieve_name.py:62-71)
        print("Author:", info["author_name"])
        print("Summary Stats:")
        for k, v in info["summary_stats"].items():
            print(f"  {k}: {v}")
        print("Affiliations:")
        for inst in info["institutions"]:
            print(f"  - {inst['name']} ({inst['country']}) | ID: {inst['id']}")
    spark.stop()
    return 0 if "error" not in info else 1


if __name__ == "__main__":
    sys.exit(main())
