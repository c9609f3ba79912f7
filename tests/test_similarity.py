"""Similarity-search tests: LSH/IVF recall vs the exact brute force."""

import math

import pytest

from hgcn_name_disambiguation_spark.operators.similarity import (
    allpairs_cosine_blocked,
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    # 80 vectors on a smooth curve: neighbors are deterministic
    rows = [
        (i, [math.cos(0.08 * i + 0.5 * j) for j in range(16)]) for i in range(80)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).cache()


@pytest.fixture(scope="module")
def queries(emb):
    from pyspark.sql import functions as F

    return emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _brute_oracle(emb_rows, query_rows, k):
    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        return num / den

    out = {}
    for qid, qv in query_rows:
        scored = sorted(
            ((round(cos(qv, cv), 6), nid) for nid, cv in emb_rows),
            key=lambda t: (-t[0], t[1]),
        )
        out[qid] = [nid for _, nid in scored[:k]]
    return out


def test_brute_force_matches_python_oracle(spark, emb, queries):
    erows = [(r.vec_id, r.embedding) for r in emb.collect()]
    qrows = [(r.query_id, r.embedding) for r in queries.collect()]
    want = _brute_oracle(erows, qrows, 5)
    got = {}
    for r in brute_force_topk(emb, queries, k=5).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.nbr_id))
    got = {q: [n for _, n in sorted(v)] for q, v in got.items()}
    assert got == want


def test_lsh_recall_against_exact(spark, emb, queries):
    exact = {
        (r.query_id, r.nbr_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.nbr_id)
        for r in lsh_topk(emb, queries, k=5, num_tables=6, num_planes=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall}"


def test_allpairs_blocked_matches_python_oracle(spark, emb):
    """Blocked GEMM all-pairs == naive python all-pairs, any block count."""

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        return num / den

    erows = [(r.vec_id, r.embedding) for r in emb.collect()]
    want = {
        (ia, ib): round(cos(va, vb), 4)
        for i, (ia, va) in enumerate(erows)
        for ib, vb in erows[i + 1:]
        if round(cos(va, vb), 4) >= 0.5
    }
    for nb in (1, 3, 8):
        got = {
            (r.id_a, r.id_b): r.cos_sim
            for r in allpairs_cosine_blocked(
                emb, threshold=0.5, num_blocks=nb, round_to=4
            ).collect()
        }
        assert set(got) == set(want), f"num_blocks={nb}"
        assert all(abs(got[k] - want[k]) < 1e-9 for k in want), f"num_blocks={nb}"


def test_ivf_recall_against_exact(spark, emb, queries):
    exact = {
        (r.query_id, r.nbr_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.nbr_id)
        for r in ivf_topk(emb, queries, k=5, num_cells=8, nprobe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF recall {recall}"


def test_hyperplanes_not_degenerate():
    """Regression for the round-1/2 ramp bug: components varied as
    j*101 (mod M), making every plane a near-constant vector (scalar
    multiple of the all-ones direction), so every sign bit reduced to
    sign(sum(v)) and the whole index collapsed to ~2 buckets. Planes
    must be mutually near-orthogonal and buckets must actually spread."""
    import numpy as np

    from hgcn_name_disambiguation_spark.operators.dedup import _hyperplane
    from hgcn_name_disambiguation_spark.operators.similarity import (
        _hyperplanes,
    )

    for planes in (
        np.array(_hyperplanes(1, 8, 64, seed=42)[0]),
        np.array([_hyperplane(42, 0, i, 64) for i in range(8)]),
    ):
        unit = planes / np.linalg.norm(planes, axis=1, keepdims=True)
        g = unit @ unit.T
        off = np.abs(g[~np.eye(len(g), dtype=bool)])
        # 64-dim random directions: |cos| concentrates near 1/sqrt(64);
        # the degenerate ramp gave ~1.0 for every pair
        assert off.max() < 0.5, f"planes nearly collinear: {off.max():.3f}"

        # sign-bucket spread over deterministic pseudo-random vectors
        rng = np.random.default_rng(7)
        vecs = rng.standard_normal((4000, 64))
        bits = (vecs @ planes.T >= 0).astype(int)
        buckets = bits @ (1 << np.arange(8))
        n_distinct = len(np.unique(buckets))
        top_share = np.bincount(buckets).max() / len(buckets)
        assert n_distinct > 128, f"only {n_distinct} buckets occupied"
        assert top_share < 0.05, f"top bucket holds {top_share:.1%}"


def test_label_agreement_hand_computed(spark):
    """Composition math on a hand-built neighbor frame, then the full
    brute-force path on two clean clusters (every point's 2 NNs are
    its own cluster-mates; exclude_self keeps the query out)."""
    from hgcn_name_disambiguation_spark.operators.similarity import (
        brute_force_topk,
        label_agreement,
    )

    topk = spark.createDataFrame(
        [(1, 2), (1, 3)], "query_id long, nbr_id long"
    )
    labels = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1)], "vec_id long, label int"
    )
    got = label_agreement(topk, labels).collect()
    assert [(r.vec_id, r.label, r.n_neighbors, r.n_same_label) for r in got] == [
        (1, 0, 2, 1)
    ]

    vecs = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.01], 0),
        (2, [0.98, 0.02], 0),
        (10, [0.0, 1.0], 1),
        (11, [0.01, 0.99], 1),
        (12, [0.02, 0.98], 1),
    ]
    e = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>, label int"
    )
    tk = brute_force_topk(
        e,
        e.selectExpr("vec_id as query_id", "embedding"),
        k=2,
        exclude_self=True,
    )
    out = {
        r.vec_id: (r.label, r.n_neighbors, r.n_same_label)
        for r in label_agreement(tk, e.select("vec_id", "label")).collect()
    }
    assert out == {i: (0 if i < 10 else 1, 2, 2) for i in [0, 1, 2, 10, 11, 12]}


def test_mutual_topk_edges_and_triangles(spark):
    """Hand-built graphs: mutuality filter (asymmetric pairs drop),
    and exactly-once triangle counting on K3 + pendant + isolate."""
    from hgcn_name_disambiguation_spark.operators.similarity import (
        mutual_topk_edges,
        triangle_counts,
    )

    topk = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 2)],  # 1<->2 mutual; 1->3, 3->2 not
        "query_id long, nbr_id long",
    )
    assert [(r.a, r.b) for r in mutual_topk_edges(topk).collect()] == [(1, 2)]

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "a long, b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "vec_id long")
    got = {
        r.vec_id: (r.degree, r.n_triangles)
        for r in triangle_counts(edges, nodes=nodes).collect()
    }
    assert got == {1: (2, 1), 2: (2, 1), 3: (3, 1), 4: (1, 0), 5: (0, 0)}

    # K4: 4 triangles total, every node in 3 of them, degree 3
    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)], "a long, b long"
    )
    g4 = {r.vec_id: (r.degree, r.n_triangles)
          for r in triangle_counts(k4).collect()}
    assert g4 == {i: (3, 3) for i in range(4)}


def test_sparse_tfidf_topk_hand_checked(spark):
    from hgcn_name_disambiguation_spark.operators.similarity import (
        sparse_tfidf_topk,
    )

    # doc 1 and 2 share rare tokens; doc 3 shares only a stop token
    # (df == 4 > max_df=3 after including docs 4); doc 4 is noise.
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma common"),
            (2, "alpha beta delta common"),
            (3, "epsilon zeta eta common"),
            (4, "theta iota kappa common"),
        ],
        ["doc_id", "text"],
    )
    out = sparse_tfidf_topk(df, k=3, max_df=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["nbr_id"], r["score"])
        )
    # 'common' (df=4) is pruned, so 3 and 4 have no neighbors at all
    assert 3 not in by_q and 4 not in by_q
    assert by_q[1][0][1] == 2 and by_q[2][0][1] == 1
    assert by_q[1][0][2] == by_q[2][0][2] > 0  # symmetric score


def test_rrf_fuse_hand_computed(spark):
    from hgcn_name_disambiguation_spark.operators.similarity import rrf_fuse

    dense = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], ["query_id", "nbr_id", "rank"]
    )
    sparse = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2)], ["query_id", "nbr_id", "rank"]
    )
    out = {
        r["nbr_id"]: (r["rrf_ppm"], r["fused_rank"])
        for r in rrf_fuse([dense, sparse], k=3, c=60).collect()
    }
    # 11 in both lists: 1e6//61 + 1e6//62 beats 10's 1e6//61 alone.
    assert out[11] == (1_000_000 // 61 + 1_000_000 // 62, 1)
    assert out[10] == (1_000_000 // 61, 2)
    assert out[12] == (1_000_000 // 62, 3)
