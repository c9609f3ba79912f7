"""Closed-form pairwise P/R/F1 vs the reference's O(n^2) formula
re-implemented as oracle (name_disambiguation.py:111-133)."""

import itertools
import random

from hgcn_name_disambiguation_spark.operators.evaluate import (
    metrics_summary,
    pairwise_metrics,
)


def _oracle_prf(truth, pred):
    tp = tp_fp = tp_fn = 0
    for i, j in itertools.combinations(range(len(truth)), 2):
        same_t = truth[i] == truth[j]
        same_p = pred[i] == pred[j]
        tp += same_t and same_p
        tp_fp += same_p
        tp_fn += same_t
    p = tp / tp_fp if tp_fp else 1.0
    r = tp / tp_fn if tp_fn else 1.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return p, r, f1


def test_pairwise_metrics_matches_bruteforce(spark):
    rng = random.Random(3)
    rows = []
    expected = {}
    for b in ["blk1", "blk2"]:
        truth = [rng.randrange(4) for _ in range(30)]
        pred = [t if rng.random() < 0.8 else rng.randrange(4) for t in truth]
        expected[b] = _oracle_prf(truth, pred)
        rows += [(b, f"p{i}", t, f"c{p}") for i, (t, p) in enumerate(zip(truth, pred))]

    df = spark.createDataFrame(rows, ["block_key", "pub_id", "label", "cluster_id"])
    got = {r.block_key: (r.precision, r.recall, r.f1)
           for r in pairwise_metrics(df).collect()}
    for b, (p, r_, f1) in expected.items():
        gp, gr, gf = got[b]
        assert abs(gp - p) < 1e-9 and abs(gr - r_) < 1e-9 and abs(gf - f1) < 1e-9

    summary = metrics_summary(pairwise_metrics(df)).first()
    want_f1 = sum(v[2] for v in expected.values()) / 2
    assert abs(summary.avg_f1 - want_f1) < 1e-9
    assert summary.n_blocks == 2
