"""CC large-star/small-star vs brute-force oracle (SURVEY §5.1)."""

import random

from hgcn_name_disambiguation_spark.operators.clustering import (
    connected_components,
)


def _oracle_components(edges, nodes):
    """Union-find oracle."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # min-id per component
    return {n: find(n) for n in nodes}


def test_cc_matches_union_find_oracle(spark):
    rng = random.Random(7)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges = []
    # several chains/rings/stars + noise
    for i in range(0, 40):
        edges.append((nodes[i], nodes[i + 1]))  # one long chain 0..40
    for i in range(50, 60):
        edges.append((nodes[50], nodes[i]))  # star
    for _ in range(60):
        u, v = rng.sample(range(61, 119), 2)
        edges.append((nodes[u], nodes[v]))

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r.node: r.component for r in connected_components(df).collect()
    }
    touched = sorted({u for e in edges for u in e})
    want = _oracle_components(edges, touched)
    want = {n: want[n] for n in touched}
    assert got == want


def test_cc_deterministic_under_permutation(spark):
    edges = [("b", "a"), ("c", "b"), ("x", "y"), ("z", "x")]
    df1 = spark.createDataFrame(edges, ["src", "dst"])
    df2 = spark.createDataFrame(list(reversed(edges)), ["src", "dst"])
    r1 = sorted(map(tuple, connected_components(df1).collect()))
    r2 = sorted(map(tuple, connected_components(df2).collect()))
    assert r1 == r2
    assert ("c", "a") in r1 and ("z", "x") in r1
