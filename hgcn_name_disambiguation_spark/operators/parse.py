"""M1 — ingest + normalize: repo_files -> typed publications frame.

Reference parity (SURVEY §2.1 S1-S2, §2.2 P1-P8):
- scan + sanitize + parse:  ``name_disambiguation.py:798-848``.
  Two content encodings, one scan (CASE on ``lang``):
  * ``lang='json'``: one `from_json` with an explicit schema —
    columnar, prunable; the reference's `&`-regex sanitization is
    unnecessary on JSON,
  * ``lang='xml'``: the reference's own ``<publication>`` element
    format (``raw-data/*.xml``, field map at
    ``name_disambiguation.py:818-848``), parsed with codegen'd
    regexp_extract per field after the reference's exact `&`->space
    sanitize (``:802``); the block name comes from the ``path`` file
    stem (the reference's one-file-per-name layout, ``:776-791``), so
    ``content`` stays VERBATIM reference bytes and the sha256
    invariant is checkable against the original files,
- malformed-row guards P6:  null-id/label/title rows are dropped AND
  counted via ``observe()`` metrics,
- "Untitled" default P8:    ``coalesce`` (``openAlex_to_HGCN.py:172-174``),
- pid de-dup S2:            the reference appends '1' to repeated ids
  (``name_disambiguation.py:830-831``); we suffix a stable occurrence
  index via row_number over (block, pub_id) — same effect, deterministic,
- per-row invariant:        ``sha2(content,256)`` carried through every
  stage (north-rule).

The blocking key (P5, ``openAlex_to_HGCN.py:49-91``) is computed here
so every downstream op is a plain groupBy/join on `block_key`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F, types as T

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..functions.names import block_key
from ..functions.text import title_tokens

PUBLICATION_JSON_SCHEMA = T.StructType(
    [
        T.StructField("block", T.StringType()),
        T.StructField("pub_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("authors", T.ArrayType(T.StringType())),
        T.StructField("venue", T.StringType()),
        T.StructField("org", T.StringType()),
        T.StructField("label", T.IntegerType()),
    ]
)


def _xml_rec() -> F.Column:
    """content (one ``<publication>`` XML element, reference format) ->
    struct matching PUBLICATION_JSON_SCHEMA. All codegen'd built-ins.

    Parity notes (``name_disambiguation.py:798-848``):
    - `&` -> ' ' on the WHOLE text before parsing (``:802``) — entity
      refs like ``&amp;`` deliberately degrade to `` amp;`` exactly as
      the reference's ET parse sees them,
    - literal ``null`` text (the reference's serialized None) -> NULL,
    - authors are the comma-joined string (``:828``, AMiner uses ','
      and OpenAlex ', ' — split + trim covers both),
    - block = file stem of ``path`` (one file per name block).
    """
    s = F.regexp_replace("content", "&", " ")

    def tag(name: str) -> F.Column:
        return F.regexp_extract(s, f"(?s)<{name}>(.*?)</{name}>", 1)

    def nn(c: F.Column) -> F.Column:
        t = F.trim(c)
        return F.when((t == "") | (t == "null"), F.lit(None)).otherwise(t)

    def int_of(c: F.Column) -> F.Column:
        t = F.trim(c)
        return F.when(t.rlike("^-?[0-9]+$"), t.cast("int"))

    authors = F.filter(
        F.transform(
            F.split(F.coalesce(nn(tag("authors")), F.lit("")), ","),
            lambda x: F.trim(x),
        ),
        lambda x: x != "",
    )
    return F.struct(
        nn(F.regexp_extract("path", r"([^/]+?)(?:\.xml)?$", 1)).alias("block"),
        nn(tag("id")).alias("pub_id"),
        nn(tag("title")).alias("title"),
        int_of(tag("year")).alias("year"),
        authors.alias("authors"),
        nn(tag("jconf")).alias("venue"),
        nn(tag("organization")).alias("org"),
        int_of(tag("label")).alias("label"),
    )


def parse_publications(
    repo_files: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
    observe_name: str | None = "parse_metrics",
) -> DataFrame:
    """repo_files(repo,path,commit,lang,content) -> typed pubs frame.

    Output columns:
      block_key, pub_id, title, title_toks ARRAY<STRING>, year,
      authors ARRAY<STRING>, venue STRING (nullable; null-ish venues
      nulled), org, label INT (nullable when unlabeled),
      content_sha STRING (north-rule invariant).
    """
    parsed = (
        repo_files
        # lang predicate — pushed to the scan by Catalyst; one scan,
        # per-row CASE picks the decoder.
        .where(F.col("lang").isin("json", "xml"))
        .withColumn(
            "rec",
            F.when(
                F.col("lang") == "json",
                F.from_json("content", PUBLICATION_JSON_SCHEMA),
            ).otherwise(_xml_rec()),
        )
        .withColumn("content_sha", F.sha2("content", 256))
    )

    # P6 malformed guards: from_json yields null struct on bad JSON;
    # missing id/title rows dropped (counted by the observation below).
    pubs = parsed.where(
        F.col("rec").isNotNull()
        & F.col("rec.pub_id").isNotNull()
        & F.col("rec.title").isNotNull()
        & F.col("rec.block").isNotNull()
    )

    venue_norm = F.lower(F.trim(F.col("rec.venue")))
    pubs = pubs.select(
        block_key(F.col("rec.block")).alias("block_key"),
        F.col("rec.pub_id").alias("pub_id_raw"),
        # P8 untitled default (openAlex_to_HGCN.py:172-174,244)
        F.coalesce(F.col("rec.title"), F.lit("untitled publication")).alias("title"),
        F.col("rec.year").alias("year"),
        F.coalesce(F.col("rec.authors"), F.array()).alias("authors"),
        F.when(
            venue_norm.isin(*config.venue_null_values) | venue_norm.isNull(),
            F.lit(None).cast("string"),
        )
        .otherwise(venue_norm)
        .alias("venue"),
        F.col("rec.org").alias("org"),
        F.col("rec.label").alias("label"),
        "content_sha",
    )

    # S2 pid de-dup: occurrence suffix, deterministic order by sha.
    w = Window.partitionBy("block_key", "pub_id_raw").orderBy("content_sha")
    pubs = (
        pubs.withColumn("_occ", F.row_number().over(w))
        .withColumn(
            "pub_id",
            F.when(F.col("_occ") == 1, F.col("pub_id_raw")).otherwise(
                F.concat_ws("#", "pub_id_raw", (F.col("_occ") - 1).cast("string"))
            ),
        )
        .drop("_occ", "pub_id_raw")
    )

    # P1-P4 tokenization chain (stemmed, stopword-free, distinct).
    pubs = pubs.withColumn(
        "title_toks",
        title_tokens(F.col("title"), config.use_stemming, config.stopwords),
    )

    if observe_name:
        pubs = pubs.observe(
            observe_name,
            F.count(F.lit(1)).alias("rows_parsed"),
            F.approx_count_distinct("block_key").alias("blocks"),
        )
    return pubs
