"""S6/O3 — OpenAlex snapshot connector: name matching, caps, label
map, unique-works dedup, defaults, and the repo_files handoff into
parse_publications (openAlex_to_HGCN.py:14-191,232-266 semantics)."""

import hashlib
import os
import shutil

from pyspark.sql import functions as F

from hgcn_name_disambiguation_spark.fixtures.openalex import (
    FIXTURE_DIR,
    QUERY_NAME,
    ensure_openalex_fixture,
)
from hgcn_name_disambiguation_spark.operators.openalex import (
    match_openalex_authors,
    openalex_records,
    openalex_repo_files,
    read_openalex_authors,
    read_openalex_works,
)
from hgcn_name_disambiguation_spark.operators.parse import parse_publications


def _frames(spark):
    d = ensure_openalex_fixture()
    return read_openalex_authors(spark, d), read_openalex_works(spark, d)


def test_fixture_deterministic(tmp_path):
    """Regenerating the snapshot yields identical bytes (both the
    Spark query and the DuckDB oracle lean on this)."""
    ensure_openalex_fixture()
    fresh = ensure_openalex_fixture(str(tmp_path / "oa"))
    for fn in ("authors.jsonl", "works.jsonl"):
        a = hashlib.sha256(open(os.path.join(FIXTURE_DIR, fn), "rb").read())
        b = hashlib.sha256(open(os.path.join(fresh, fn), "rb").read())
        assert a.hexdigest() == b.hexdigest(), fn
    shutil.rmtree(fresh, ignore_errors=True)


def test_name_match_and_cap(spark):
    """First/last-token rule (openAlex_to_HGCN.py:47-91): middle
    names match; reversed order, wrong first/last, single-token
    candidates don't. Cap keeps the top max_results by the documented
    deterministic order and labels them densely 0..n-1."""
    authors, _ = _frames(spark)
    m = match_openalex_authors(authors, QUERY_NAME, max_results=6)
    rows = {r["author_id"]: r for r in m.collect()}
    assert set(rows) == {"A11", "A12", "A13", "A14", "A15", "A16"}
    # A17/A18 matched the name rule but fall past the cap
    assert rows["A11"]["label"] == 0  # works_count 14, top
    assert rows["A16"]["label"] == 5
    # works_count tie (A12/A13 both 9) broken by id asc
    assert rows["A12"]["label"] == 1 and rows["A13"]["label"] == 2

    # uncapped: all 8 matches, none of the B-prefixed decoys
    all_m = {
        r["author_id"]
        for r in match_openalex_authors(authors, QUERY_NAME, 200).collect()
    }
    assert all_m == {f"A1{i}" for i in range(1, 9)}

    # single-token query: first-name-only rule
    single = {
        r["author_id"]
        for r in match_openalex_authors(authors, "wei", 200).collect()
    }
    assert "B21" in single and "B24" in single and "B23" not in single


def test_records_caps_dedup_defaults(spark):
    authors, works = _frames(spark)
    m = match_openalex_authors(authors, QUERY_NAME, max_results=6)
    recs = openalex_records(m, works, QUERY_NAME, max_works=8).cache()
    rows = {r["pub_id"]: r for r in recs.collect()}

    # per-author cap: label 0 (A11, 14+ works) keeps exactly 8
    assert sum(1 for r in rows.values() if r["label"] == 0) == 8
    # fetch-cap-then-dedup order (the reference's): W1000 is
    # co-authored by A11+A12 but A11's cap (year desc) drops it, so
    # the surviving owner is label 1 — not min-label-overall
    assert rows["W1000"]["label"] == 1
    # dedup: every pub_id appears once
    assert recs.groupBy("pub_id").count().where("count > 1").count() == 0
    # defaults
    assert rows["W1003"]["title"] == "Untitled publication"
    assert rows["W1003"]["venue"] == "Unknown"
    assert all(r["org"] == "null" for r in rows.values())
    assert any(r["year"] == 0 for r in rows.values())
    recs.unpersist()


def test_repo_files_roundtrip(spark):
    """Connector output feeds parse_publications unchanged: sha
    invariant present, 'Unknown' venue and literal-'null' org survive
    to the parser which nulls/guards them downstream."""
    authors, works = _frames(spark)
    m = match_openalex_authors(authors, QUERY_NAME, max_results=6)
    recs = openalex_records(m, works, QUERY_NAME, max_works=8)
    pubs = parse_publications(openalex_repo_files(recs, QUERY_NAME)).cache()
    n = pubs.count()
    assert n == recs.count()
    assert pubs.where(F.col("content_sha").isNull()).count() == 0
    # venue "Unknown" is a configured null value -> NULL venue
    assert pubs.where(F.col("venue") == "unknown").count() == 0
    assert pubs.where(F.col("venue").isNull()).count() > 0
    # block_key is the query name for every row
    assert pubs.select("block_key").distinct().collect()[0][0] == QUERY_NAME
    pubs.unpersist()


def test_plan_broadcasts_matched_authors(spark):
    """Scale shape: both joins build on the bounded side — the
    authorship join broadcasts the capped matched-author dim, and the
    final works join broadcasts the capped owner set (<= max_results
    * max_works rows) — so a petabyte works snapshot never shuffles."""
    authors, works = _frames(spark)
    m = match_openalex_authors(authors, QUERY_NAME, max_results=6)
    recs = openalex_records(m, works, QUERY_NAME, max_works=8)
    plan = recs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
