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


def test_fs_channel_weights_hand_computed(spark):
    from hgcn_name_disambiguation_spark.operators.evaluate import (
        fs_channel_weights,
    )
    import math

    # channel A: m = 3/4, u = 1/4; channel B: m_num = 0 (clamped to 1).
    rows = [
        (True, "A", True), (True, "A", True), (True, "A", True),
        (True, "A", False),
        (False, "A", True), (False, "A", False), (False, "A", False),
        (False, "A", False),
        (True, "B", False), (True, "B", False),
        (False, "B", True), (False, "B", False),
    ]
    df = spark.createDataFrame(rows, ["truth", "channel", "agree"])
    out = {r["channel"]: r for r in fs_channel_weights(df).collect()}
    a = out["A"]
    assert (a["n_match"], a["n_unmatch"], a["m_num"], a["u_num"]) == (
        4, 4, 3, 1,
    )
    assert (a["m_ppm"], a["u_ppm"]) == (750000, 250000)
    fln = lambda c: math.floor(1_000_000 * math.log(c))
    assert a["weight_micro_nats"] == fln(3) - fln(4) - fln(1) + fln(4)
    b = out["B"]
    assert (b["m_num"], b["u_num"], b["m_ppm"]) == (0, 1, 0)
    # clamp: ln(max(0,1)) = 0 -> weight = -fln(2) - fln(1) + fln(2) = 0
    assert b["weight_micro_nats"] == fln(1) - fln(2) - fln(1) + fln(2)
