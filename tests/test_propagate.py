"""G4 effective-computation test: fused normalized-adjacency feature
propagation vs hand-computed values on a 2-node graph, exact
cal_gcn_matrix (GCN.py:31-42) semantics: I + D^-1/2 A D^-1/2 with
D = rowsum(A) (degrees exclude self-loops; the self-feature enters
unnormalized)."""

import pytest

from hgcn_name_disambiguation_spark.operators.propagate import (
    feature_propagation,
)


def test_feature_propagation_hand_computed(spark):
    """p1-p2 coauthor edge (w=1) only. Channel A: d=1 both (real edges
    only), normalized edge weight 1/sqrt(1*1)=1, plus the unit I term.
    Channels T/V: no edges -> identity only. Features: p1={t1: 2},
    p2={t2: 3}. Fused 5/1/4:
      out(p1,t1) = (5*2 + 1*2 + 4*2)/10 = 2.0   (I term everywhere)
      out(p1,t2) = (5*(1*3)) / 10       = 1.5   (A-channel neighbor)
      out(p2,t2) = (5*3 + 1*3 + 4*3)/10 = 3.0
      out(p2,t1) = (5*(1*2)) / 10       = 1.0
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
        ("p1", "t1"): 2.0,
        ("p1", "t2"): 1.5,
        ("p2", "t2"): 3.0,
        ("p2", "t1"): 1.0,
    }
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k


def test_feature_propagation_degree_weighted(spark):
    """3-node path p1-p2-p3 (coauthor w=1 each edge): d(p1)=d(p3)=1,
    d(p2)=2, so the p1->p2 normalized weight is 1/sqrt(2). A
    degree-3-node's self-contribution stays exactly 1.0 (not 1/(d+1))
    — the numeric point of cal_gcn_matrix parity. Only channel A has
    edges; T/V are identity.
      out(p2,t1) = 5*(1/sqrt(2))*2 / 10 = sqrt(2)/10 * 5 ... computed
      below analytically.
    """
    import math

    pubs = spark.createDataFrame(
        [("b", "p1"), ("b", "p2"), ("b", "p3")], ["block_key", "pub_id"]
    )
    edges = spark.createDataFrame(
        [
            ("b", "p1", "p2", 1.0, 0.0, 0.0),
            ("b", "p2", "p3", 1.0, 0.0, 0.0),
        ],
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
    inv = 1.0 / math.sqrt(2.0)
    expect = {
        # self term is unit-weight in every channel: (5+1+4)/10 = 1
        ("p1", "t1"): 2.0,
        ("p2", "t2"): 3.0,
        # neighbor terms only through channel A (weight 5/10)
        ("p1", "t2"): 0.5 * inv * 3.0,
        ("p2", "t1"): 0.5 * inv * 2.0,
        ("p3", "t2"): 0.5 * inv * 3.0,
    }
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k
