"""As-of join tests: hand-computed point-in-time semantics, the
equal-timestamp edge in both inclusive and strict modes, the
right-vs-right tie-break, unmatched rows, and partitioning invariance.
"""

from datetime import datetime

from pyspark.sql import functions as F

from hgcn_name_disambiguation_spark.operators.temporal import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01T00:10:00")),  # after v2
            (2, 100, _ts("2024-01-01T00:02:00")),  # between v1 and v2
            (3, 100, _ts("2024-01-01T00:00:30")),  # before any view? v1 at 00:01
            (4, 200, _ts("2024-01-01T00:05:00")),  # exactly at v4's ts
            (5, 300, _ts("2024-01-01T00:05:00")),  # user with no views
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, _ts("2024-01-01T00:01:00"), 11),
            (100, _ts("2024-01-01T00:05:00"), 12),
            (200, _ts("2024-01-01T00:05:00"), 21),
            (200, _ts("2024-01-01T00:05:00"), 22),  # same-ts tie: 22 wins
        ],
        "user_id long, ts timestamp, view_id long",
    )
    return left, right


def test_asof_inclusive_hand_computed(spark):
    left, right = _frames(spark)
    got = {
        r.event_id: r.r_view_id
        for r in asof_join(left, right, on="user_id", right_id="view_id")
        .collect()
    }
    assert got == {
        1: 12,  # latest view <= 00:10 is v12 at 00:05
        2: 11,  # only v11 at 00:01 precedes 00:02
        3: None,  # 00:00:30 precedes every view
        4: 22,  # same-instant views visible; tie -> highest view_id
        5: None,  # user 300 has no views at all
    }


def test_asof_strict_excludes_same_instant(spark):
    left, right = _frames(spark)
    got = {
        r.event_id: r.r_view_id
        for r in asof_join(
            left, right, on="user_id", right_id="view_id", strict=True
        ).collect()
    }
    # event 4 sits exactly at the views' ts: strict must NOT see them
    assert got[4] is None
    # all other matches unchanged (no other left row shares a view ts)
    assert got[1] == 12 and got[2] == 11 and got[3] is None


def test_asof_carries_all_payload_and_left_columns(spark):
    left, right = _frames(spark)
    r2 = right.withColumn("price", F.col("view_id") * 10)
    out = asof_join(left, r2, on="user_id", right_id="view_id")
    assert out.columns == [
        "event_id", "user_id", "ts", "r_view_id", "r_price",
    ]
    row = {r.event_id: r for r in out.collect()}
    assert row[1].r_price == 120 and row[5].r_price is None


def test_asof_invariant_under_repartitioning(spark):
    left, right = _frames(spark)
    base = sorted(
        (r.event_id, r.r_view_id)
        for r in asof_join(left, right, on="user_id", right_id="view_id")
        .collect()
    )
    shuffled = sorted(
        (r.event_id, r.r_view_id)
        for r in asof_join(
            left.repartition(7), right.repartition(5, "ts"),
            on="user_id", right_id="view_id",
        ).collect()
    )
    assert base == shuffled


def test_range_join_hand_computed(spark):
    """Bucketed range join vs a brute-force Python oracle, with rows
    placed adversarially around bucket boundaries (window = 100us so
    buckets are tiny) — including a right row exactly at left.ts
    (inclusive), exactly at left.ts - window (inclusive), and one just
    outside; and the exactly-once guarantee for same-bucket matches."""
    from hgcn_name_disambiguation_spark.operators.temporal import range_join

    # build from epoch micros via timestamp arithmetic in SQL to avoid
    # local-timezone surprises: store micros, derive ts column
    left_rows = [(1, 7, 1000), (2, 7, 250), (3, 8, 1000)]
    right_rows = [
        (10, 7, 1000),  # == left1.ts          -> match (inclusive)
        (11, 7, 900),   # in (ts-100, ts)      -> match
        (12, 7, 899),   # just outside         -> no
        (13, 7, 150),   # == left2.ts - 100    -> match (inclusive)
        (14, 7, 260),   # after left2          -> no (for left2)
        (15, 9, 1000),  # other user           -> no
    ]
    mk = lambda rows, idc: spark.createDataFrame(
        rows, f"{idc} long, user_id long, us long"
    ).select(idc, "user_id", F.expr(
        "timestampadd(MICROSECOND, us, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    ).alias("ts"))
    left = mk(left_rows, "event_id")
    right = mk(right_rows, "rid")

    got = sorted(
        (r.event_id, r.r_rid)
        for r in range_join(left, right, on="user_id", window_us=100).collect()
    )
    brute = sorted(
        (le, rr)
        for (le, lu, lt) in left_rows
        for (rr, ru, rt) in right_rows
        if lu == ru and lt - 100 <= rt <= lt
    )
    assert got == brute == [(1, 10), (1, 11), (2, 13)]


def test_temporal_plans_never_nested_loop(spark):
    """Scale contract: range_join compiles to an equi-join (never a
    cartesian / broadcast-nested-loop theta-join), and asof_join
    compiles to a single window pass with NO join operator at all."""
    from hgcn_name_disambiguation_spark.operators.temporal import range_join

    left, right = _frames(spark)
    rplan = (
        range_join(left, right.select("user_id", "ts", "view_id"),
                   on="user_id", window_us=60_000_000)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in rplan
    assert "BroadcastNestedLoopJoin" not in rplan
    assert "Join" in rplan  # it IS a real (equi) join

    aplan = (
        asof_join(left, right, on="user_id", right_id="view_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in aplan and "Join" not in aplan


def test_funnel_stages_hand_computed(spark):
    """Funnel ordering semantics: a click BEFORE the first view must
    not count; a same-instant next step counts (>=); funnel breaks
    stay NULL; users never entering stage 0 report stage 0."""
    from hgcn_name_disambiguation_spark.operators.temporal import (
        funnel_stages,
    )

    mk = F.expr(
        "timestampadd(MICROSECOND, us, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    )
    rows = [
        # u1: click@5 (too early), view@10, click@20, purchase@30 -> 3
        (1, 5, "click"), (1, 10, "view"), (1, 20, "click"),
        (1, 30, "purchase"),
        # u2: view@10, purchase@20 but NO click -> stage 1
        (2, 10, "view"), (2, 20, "purchase"),
        # u3: view and click at the SAME instant -> >= lets it count
        (3, 10, "view"), (3, 10, "click"),
        # u4: clicks only -> stage 0
        (4, 10, "click"),
    ]
    e = spark.createDataFrame(
        rows, "user_id long, us long, event_type string"
    ).select("user_id", mk.alias("ts"), "event_type")
    got = {
        r.user_id: (r.stage, r.us_view, r.us_click, r.us_purchase)
        for r in funnel_stages(
            e, steps=["view", "click", "purchase"]
        ).collect()
    }
    assert got == {
        1: (3, 10, 20, 30),
        2: (1, 10, None, None),
        3: (2, 10, 10, None),
        4: (0, None, None, None),
    }
