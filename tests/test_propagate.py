"""G4 effective-computation test: fused normalized-adjacency feature
propagation vs hand-computed values on a 2-node graph."""

import pytest

from hgcn_name_disambiguation_spark.operators.propagate import (
    feature_propagation,
)


def test_feature_propagation_hand_computed(spark):
    """p1-p2 coauthor edge (w=1) only. Channel A: deg=2 both (edge +
    self-loop), every normalized weight 1/2. Channels T/V: self-loops
    only (identity). Features: p1={t1: 2}, p2={t2: 3}. Fused 5/1/4:
      out(p1,t1) = (5*(.5*2) + 1*2 + 4*2)/10 = 1.5
      out(p1,t2) = (5*(.5*3)) / 10          = 0.75
      out(p2,t2) = (5*(.5*3) + 1*3 + 4*3)/10 = 2.25
      out(p2,t1) = (5*(.5*2)) / 10          = 0.5
    """
    pubs = spark.createDataFrame(
        [("b", "p1"), ("b", "p2")], ["block_key", "pub_id"]
    )
    edges = spark.createDataFrame(
        [("b", "p1", "p2", 1.0, 0.0, 0.0)],
        ["block_key", "id_a", "id_b", "w_coauthor", "w_title", "w_venue"],
    )
    feats = spark.createDataFrame(
        [("b", "p1", "t1", 2.0), ("b", "p2", "t2", 3.0)],
        ["block_key", "pub_id", "token", "w"],
    )
    got = {
        (r.pub_id, r.token): r.value
        for r in feature_propagation(pubs, edges, feats).collect()
    }
    expect = {
        ("p1", "t1"): 1.5,
        ("p1", "t2"): 0.75,
        ("p2", "t2"): 2.25,
        ("p2", "t1"): 0.5,
    }
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k
