from __future__ import annotations

from pyspark.sql import functions as F

from hgcn_name_disambiguation_spark.operators.graph import pagerank


def _path_edges(spark):
    # undirected path 1 - 2 - 3 in one block
    rows = [("b", "1", "2"), ("b", "2", "3")]
    return spark.createDataFrame(rows, ["block_key", "id_a", "id_b"])


def test_pagerank_hand_computed(spark):
    """Exact integer expectations for the 1-2-3 path, worked by hand:
    teleport = 150000; contribution = (85 * rank) // (100 * deg)."""
    out = {
        r.node_id: r for r in pagerank(_path_edges(spark), iterations=3).collect()
    }
    assert len(out) == 3
    assert out["1"].deg == 1 and out["2"].deg == 2 and out["3"].deg == 1
    # iter1: ends 575000, middle 1850000
    # iter2: ends 936250, middle 1127500
    # iter3: ends 150000 + (85*1127500)//200          = 629187
    #        middle 150000 + 2*((85*936250)//100)     = 1741624
    assert out["1"].rank_micro == 629187
    assert out["3"].rank_micro == 629187
    assert out["2"].rank_micro == 1741624
    # floor losses only: total mass within 3 micro-units of 3 * 10^6
    total = sum(r.rank_micro for r in out.values())
    assert 3_000_000 - 3 <= total <= 3_000_000


def test_pagerank_partition_invariance(spark):
    """Integer arithmetic => bit-identical under repartitioning and
    row order; isolated blocks don't interact."""
    e = _path_edges(spark).unionByName(
        spark.createDataFrame(
            [("c", "x", "y")], ["block_key", "id_a", "id_b"]
        )
    )
    a = sorted(map(tuple, pagerank(e, iterations=3).collect()))
    b = sorted(
        map(
            tuple,
            pagerank(
                e.repartition(7).sortWithinPartitions(F.desc("id_a")),
                iterations=3,
            ).collect(),
        )
    )
    assert a == b
    by_node = {(t[0], t[1]): t[3] for t in a}
    # the 2-node block is symmetric: both nodes keep the full mass split
    assert by_node[("c", "x")] == by_node[("c", "y")]
    # block "b" matches the hand-computed run exactly (no cross-block bleed)
    assert by_node[("b", "2")] == 1741624
