"""S6/O3 — OpenAlex snapshot source: NDJSON dumps -> repo_files rows.

Reference parity (SURVEY §2.1 S6, §2.5 O3; ``openAlex_to_HGCN.py``):
the reference's CLI drives the live OpenAlex REST API — an author
*search* with cursor paging (``:14-119``), a works-per-author fetch
(``:121-191``), then XML + label-map emission (``:192-266``). The REST
transport is driver-side I/O with no distributed analog worth building;
OpenAlex publishes the same records as NDJSON snapshot dumps, which IS
the shape a 100-TB ingest reads. This module implements the
*semantics* of the reference's fetch+transform over such dumps:

- name matching (``:47-91``): candidate's first/last name tokens must
  equal the query's first/last tokens (query with one token: first-token
  match only). The reference parses names with ``HumanName``; for the
  plain "First [Middle] Last" display names in scope, that reduces to
  first/last whitespace token, which is what we compute JVM-side,
- ``max_results`` / ``max_works`` caps (``:29, 105-107, 130, 176-179``)
  — O3. The API returns relevance-ordered pages; a snapshot has no
  relevance score, so the caps take a deterministic proxy order
  (works_count DESC, id ASC for authors; year DESC, id ASC for works),
  documented here as the one intended deviation,
- label map (``:500-504``): author -> dense integer in match order,
- ``unique_works`` dedup, first author in label order wins
  (``:232-246``),
- field defaults (``:156-174``): null title -> "Untitled publication",
  missing venue -> "Unknown", missing year -> 0, org -> "null".

Output is a `repo_files`-shaped frame (lang='json') consumed by
`parse_publications` — mirroring the reference architecture where the
OpenAlex CLI writes files the main engine ingests. Everything is
built-in Catalyst expressions; the matched-author side of the works
join is broadcast (a capped author search is always dim-sized, even
when the works snapshot is petabytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

AUTHOR_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("display_name", T.StringType()),
        T.StructField("works_count", T.LongType()),
    ]
)

WORK_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("publication_year", T.IntegerType()),
        T.StructField(
            "authorships",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "author",
                            T.StructType(
                                [
                                    T.StructField("id", T.StringType()),
                                    T.StructField("display_name", T.StringType()),
                                ]
                            ),
                        )
                    ]
                )
            ),
        ),
        T.StructField(
            "primary_location",
            T.StructType(
                [
                    T.StructField(
                        "source",
                        T.StructType(
                            [T.StructField("display_name", T.StringType())]
                        ),
                    )
                ]
            ),
        ),
    ]
)

_ID_PREFIX = "https://openalex.org/"


def read_openalex_authors(spark: SparkSession, snapshot_dir: str) -> DataFrame:
    """Author NDJSON dump -> typed frame (explicit schema: one pass,
    no sampling inference job over a large snapshot)."""
    return spark.read.schema(AUTHOR_SCHEMA).json(f"{snapshot_dir}/authors.jsonl")


def read_openalex_works(spark: SparkSession, snapshot_dir: str) -> DataFrame:
    return spark.read.schema(WORK_SCHEMA).json(f"{snapshot_dir}/works.jsonl")


def _name_tokens(col) -> tuple:
    toks = F.split(F.trim(F.lower(col)), r"\s+")
    first = F.element_at(toks, 1)
    last = F.when(F.size(toks) > 1, F.element_at(toks, -1))
    return first, last


def match_openalex_authors(
    authors: DataFrame, query_name: str, max_results: int = 200
) -> DataFrame:
    """S6 name filter + O3 cap + label map.

    Returns (author_id, author_name, works_count, label) with label a
    dense 0-based integer in cap order — the reference's
    ``author_id_to_label`` (``openAlex_to_HGCN.py:500-504``).
    """
    q = query_name.strip().lower().split()
    q_first = q[0] if q else ""
    q_last = q[-1] if len(q) > 1 else ""

    first, last = _name_tokens(F.col("display_name"))
    cand = authors.select(
        F.replace(F.col("id"), F.lit(_ID_PREFIX), F.lit("")).alias("author_id"),
        F.col("display_name").alias("author_name"),
        F.coalesce("works_count", F.lit(0)).alias("works_count"),
        first.alias("_first"),
        last.alias("_last"),
    )
    if q_first and q_last:
        cand = cand.where(
            (F.col("_first") == q_first) & (F.col("_last") == q_last)
        )
    elif q_first:
        cand = cand.where(F.col("_first") == q_first)
    else:
        return cand.where(F.lit(False)).drop("_first", "_last").withColumn(
            "label", F.lit(0)
        )

    # Distributed top-k FIRST (orderBy+limit -> TakeOrderedAndProject:
    # per-partition top-k, no single-partition shuffle of the full
    # name-matched set — "john smith" matches thousands of authors in a
    # full snapshot). The dense 0-based label rank then runs its global
    # window over <= max_results rows only.
    order = [F.desc("works_count"), F.asc("author_id")]
    w = Window.orderBy(*order)
    return (
        cand.orderBy(*order)
        .limit(max_results)
        .withColumn("_rn", F.row_number().over(w))
        .select(
            "author_id",
            "author_name",
            "works_count",
            (F.col("_rn") - 1).alias("label"),
        )
    )


def openalex_records(
    matched_authors: DataFrame,
    works: DataFrame,
    query_name: str,
    max_works: int = 100,
) -> DataFrame:
    """Works snapshot ⋈ matched authors -> labeled publication records.

    Columns: block, pub_id, title, year, authors ARRAY<STRING>, venue,
    org, label — the engine's publication JSON record shape.
    """
    wk = works.select(
        F.replace(F.col("id"), F.lit(_ID_PREFIX), F.lit("")).alias("pub_id"),
        # defaults exactly as the reference emits them; the downstream
        # parser maps "Unknown"/"null" to NULL venue/org
        F.coalesce("title", F.lit("Untitled publication")).alias("title"),
        F.coalesce("publication_year", F.lit(0)).alias("year"),
        F.transform(
            "authorships", lambda a: a["author"]["display_name"]
        ).alias("authors"),
        F.transform(
            "authorships",
            lambda a: F.replace(a["author"]["id"], F.lit(_ID_PREFIX), F.lit("")),
        ).alias("author_ids"),
        F.coalesce(
            F.col("primary_location.source.display_name"), F.lit("Unknown")
        ).alias("venue"),
    )
    # membership: the reference fetches works *per matched author*
    # (filter=author.id); offline that's the authorship join. Matched
    # authors are capped → always broadcastable.
    memb = (
        wk.select("pub_id", "year", F.explode("author_ids").alias("author_id"))
        .join(
            F.broadcast(matched_authors.select("author_id", "label")),
            "author_id",
        )
    )
    # O3 per-author works cap, deterministic proxy for API page order
    w_author = Window.partitionBy("author_id").orderBy(
        F.desc("year"), F.asc("pub_id")
    )
    memb = memb.withColumn("_wrn", F.row_number().over(w_author)).where(
        F.col("_wrn") <= max_works
    )
    # unique_works dedup: first author in label order wins
    w_work = Window.partitionBy("pub_id").orderBy(F.asc("label"))
    owner = (
        memb.withColumn("_orn", F.row_number().over(w_work))
        .where(F.col("_orn") == 1)
        .select("pub_id", "label")
    )
    return owner.join(wk, "pub_id").select(
        F.lit(query_name).alias("block"),
        "pub_id",
        "title",
        "year",
        "authors",
        "venue",
        F.lit("null").alias("org"),
        F.col("label").cast("int").alias("label"),
    )


def openalex_repo_files(records: DataFrame, query_name: str) -> DataFrame:
    """Records -> repo_files rows (lang='json'), one content blob per
    publication, feeding `parse_publications` unchanged — the Spark
    analog of the reference's one-XML-file-per-name handoff."""
    return records.select(
        F.lit("openalex").alias("repo"),
        F.lit(f"snapshot/{query_name}.jsonl").alias("path"),
        F.lit("snapshot").alias("commit"),
        F.lit("json").alias("lang"),
        F.to_json(
            F.struct(
                "block", "pub_id", "title", "year", "authors", "venue",
                "org", "label",
            )
        ).alias("content"),
    )
