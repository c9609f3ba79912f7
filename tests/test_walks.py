"""G1/G2 metapath walk tests: deterministic weight-proportional hop
choice, channel switching, rotating metapath start, dead-end
termination — asserted against a pure-Python replication of the
cumulative-threshold draw."""

import hashlib

from pyspark.sql import functions as F

from hgcn_name_disambiguation_spark.operators.walks import metapath_walks


def _pubs(spark):
    rows = [("b", p) for p in ["p1", "p2", "p3", "p4"]]
    return spark.createDataFrame(rows, ["block_key", "pub_id"])


def _edges(spark):
    # channels: A = {p1-p2 (w=1), p1-p3 (w=3)}, T = {p2-p3}, V = {p3-p4}
    rows = [
        ("b", "p1", "p2", 1.0, 0.0, 0.0),
        ("b", "p1", "p3", 3.0, 0.0, 0.0),
        ("b", "p2", "p3", 0.0, 2.0, 0.0),
        ("b", "p3", "p4", 0.0, 0.0, 1.0),
    ]
    return spark.createDataFrame(
        rows, ["block_key", "id_a", "id_b", "w_coauthor", "w_title", "w_venue"]
    )


def _draw(wid, step, nbrs_w, seed=42):
    """The engine's deterministic weight-proportional hop, replicated:
    u = first-6-hex(md5(seed:walk:step)) / 16^6; first neighbor in dst
    order whose cumulative weight crosses u * total. Python floats ARE
    IEEE doubles, so this matches the engine bit-for-bit."""
    h = hashlib.md5(f"{seed}:{wid}:{step}".encode()).hexdigest()
    u = int(h[:6], 16) / 16 ** 6
    items = sorted(nbrs_w)
    tot = 0.0
    for _, w in items:
        tot += w
    t = u * tot
    cum = 0.0
    for nb, w in items:
        cum += w
        if cum > t:
            return nb
    return items[-1][0]


def _py_walks(metapath, walk_length, walks_per_node, seed=42):
    """Pure-Python replication over the fixture graph."""
    adj = {
        "A": {"p1": [("p2", 1.0), ("p3", 3.0)], "p2": [("p1", 1.0)],
              "p3": [("p1", 3.0)], "p4": []},
        "T": {"p1": [], "p2": [("p3", 2.0)], "p3": [("p2", 2.0)],
              "p4": []},
        "V": {"p1": [], "p2": [], "p3": [("p4", 1.0)],
              "p4": [("p3", 1.0)]},
    }
    out = []
    for w in range(walks_per_node):
        for start in ["p1", "p2", "p3", "p4"]:
            wid = f"{start}#{w}"
            node = start
            out.append(("b", wid, 0, node))
            for s in range(walk_length):
                ch = metapath[(w + s) % len(metapath)]
                nbrs = adj[ch][node]
                if not nbrs:
                    break
                node = _draw(wid, s + 1, nbrs, seed)
                out.append(("b", wid, s + 1, node))
    return sorted(out)


def test_walks_match_python_replication(spark):
    got = metapath_walks(
        _pubs(spark),
        _edges(spark),
        metapath=("A", "T", "V"),
        walk_length=3,
        walks_per_node=2,
        hash_mode="md5",
    ).collect()
    got = sorted((r.block_key, r.walk_id, r.step, r.node) for r in got)
    assert got == _py_walks(("A", "T", "V"), 3, 2)


def test_walks_channel_and_termination(spark):
    out = metapath_walks(
        _pubs(spark),
        _edges(spark),
        metapath=("A", "T", "V"),
        walk_length=3,
        walks_per_node=1,
        hash_mode="md5",
    )
    rows = {(r.walk_id, r.step): r.node for r in out.collect()}
    # p4 has no A neighbor: walk 0 from p4 terminates at step 0
    assert ("p4#0", 0) in rows and ("p4#0", 1) not in rows
    # p2's A step must go to p1 (its only A neighbor), then p1 has no
    # T neighbor -> terminate
    assert rows[("p2#0", 1)] == "p1" and ("p2#0", 2) not in rows
    # p1's walk: A step to p2 or p3; if p2 -> T to p3 -> V to p4 (the
    # full metapath chain exists); if p3 -> T to p2 -> no V neighbor
    first = rows[("p1#0", 1)]
    assert first in {"p2", "p3"}
    if first == "p2":
        assert rows[("p1#0", 2)] == "p3" and rows[("p1#0", 3)] == "p4"
    else:
        assert rows[("p1#0", 2)] == "p2" and ("p1#0", 3) not in rows


def test_walks_xxhash_mode_same_shape(spark):
    """Production hash mode: identical row SHAPE (same starts, same
    termination structure depends on hash values, but step-0 coverage
    and schema are invariant) and fully deterministic."""
    mk = lambda: metapath_walks(  # noqa: E731
        _pubs(spark),
        _edges(spark),
        metapath=("A", "V"),
        walk_length=2,
        walks_per_node=1,
        hash_mode="xxhash64",
    )
    a = sorted(map(tuple, mk().collect()))
    b = sorted(map(tuple, mk().collect()))
    assert a == b
    starts = [r for r in a if r[2] == 0]
    assert len(starts) == 4
    out = mk()
    assert out.columns == ["block_key", "walk_id", "step", "node"]
    assert out.schema["step"].dataType.simpleString() == "int"


def test_walks_hop_is_weight_proportional(spark):
    """p1's A neighbors: p2 (w=1) vs p3 (w=9). Over 400 independent
    (walk, step) draws the hit rate on p3 must track w/(sum w) = 0.9
    — the uniform-hop version would sit at 0.5."""
    pubs = spark.createDataFrame(
        [("b", f"s{i:03d}") for i in range(200)] + [("b", "p2"), ("b", "p3")],
        ["block_key", "pub_id"],
    )
    # every start node connects to p2 (w=1) and p3 (w=9) on channel A
    rows = [
        ("b", f"s{i:03d}", dst, w, 0.0, 0.0)
        for i in range(200)
        for dst, w in (("p2", 1.0), ("p3", 9.0))
    ]
    edges = spark.createDataFrame(
        rows, ["block_key", "id_a", "id_b", "w_coauthor", "w_title", "w_venue"]
    )
    out = metapath_walks(
        pubs, edges, metapath=("A",), walk_length=1, walks_per_node=2,
        hash_mode="md5",
    )
    hops = [
        r.node
        for r in out.where(
            (F.col("step") == 1) & F.col("walk_id").startswith("s")
        ).collect()
    ]
    assert len(hops) == 400
    frac_p3 = hops.count("p3") / len(hops)
    assert 0.85 <= frac_p3 <= 0.95, frac_p3


def test_bfs_negative_weights_path_graph(spark):
    """Path graph p1-p2-p3-p4-p5 + disconnected island p6-p7:
    dist(p1,p3)=2, (p1,p4)=3, (p2,p5)=3, (p1,p5)=4 capped out at
    max_hops=3; no cross-component rows; dist<=1 pairs excluded."""
    from hgcn_name_disambiguation_spark.operators.walks import (
        bfs_negative_weights,
    )

    rows = [
        ("b", a, b_, 1.0, 0.0, 0.0)
        for a, b_ in [("p1", "p2"), ("p2", "p3"), ("p3", "p4"), ("p4", "p5"), ("p6", "p7")]
    ]
    edges = spark.createDataFrame(
        rows, ["block_key", "id_a", "id_b", "w_coauthor", "w_title", "w_venue"]
    )
    got = {
        (r.src, r.dst): r.dist
        for r in bfs_negative_weights(edges, max_hops=3).collect()
    }
    expect = {
        ("p1", "p3"): 2, ("p3", "p1"): 2,
        ("p2", "p4"): 2, ("p4", "p2"): 2,
        ("p3", "p5"): 2, ("p5", "p3"): 2,
        ("p1", "p4"): 3, ("p4", "p1"): 3,
        ("p2", "p5"): 3, ("p5", "p2"): 3,
    }
    assert got == expect  # (p1,p5) dist 4 capped; islands never cross


def test_walk_training_pairs_reference_semantics(spark):
    """G3 triples: positives = window-1/2 pairs of the realized corpus;
    3 negatives per positive drawn distance-proportionally from u_i's
    neg_weight rows; stuck walks emit one win=0 negative batch; the
    draw replicates in pure Python (pins the hash semantics)."""
    import hashlib

    from hgcn_name_disambiguation_spark.operators.walks import (
        bfs_negative_weights,
        walk_training_pairs,
    )

    pubs = spark.createDataFrame(
        [("b", p) for p in ["p1", "p2", "p3", "p4", "p5"]],
        ["block_key", "pub_id"],
    )
    rows = [
        ("b", "p1", "p2", 1.0, 0.0, 0.0),
        ("b", "p2", "p3", 1.0, 0.0, 0.0),
        ("b", "p3", "p4", 0.0, 0.0, 1.0),
        ("b", "p4", "p5", 1.0, 0.0, 0.0),
    ]
    edges = spark.createDataFrame(
        rows, ["block_key", "id_a", "id_b", "w_coauthor", "w_title", "w_venue"]
    )
    walks = metapath_walks(
        pubs, edges, metapath=("A", "V"), walk_length=3, walks_per_node=1,
        hash_mode="md5",
    )
    neg = bfs_negative_weights(edges, max_hops=3)
    got = walk_training_pairs(
        walks, neg, walk_length=3, negatives_per_pos=3, hash_mode="md5"
    ).collect()

    corpus = {}
    for r in walks.collect():
        corpus[(r.walk_id, r.step)] = r.node
    # positives == exactly the window-1/2 pairs of the realized corpus
    want_pos = set()
    for (wid, s), n in corpus.items():
        for d in (1, 2):
            if (wid, s + d) in corpus:
                want_pos.add((wid, s, d, n, corpus[(wid, s + d)]))
    got_pos = {
        (r.walk_id, r.step, r.win, r.u_i, r.u_j)
        for r in got if r.label == 1
    }
    assert got_pos == want_pos

    # negative draws: replicate in Python over the dist frame
    dist = {}
    for r in neg.collect():
        dist.setdefault(r.src, []).append((r.dst, r.neg_weight))

    def py_draw(wid, s, win, k):
        h = hashlib.md5(f"42:{wid}:{s}:{win}:{k}:0".encode()).hexdigest()
        u = int(h[:6], 16) / 16 ** 6
        items = sorted(dist[corpus[(wid, s)]])
        cum, tot = 0.0, 0.0
        for _, w in items:
            tot += w
        t = u * tot
        for nb, w in items:
            cum += w
            if cum > t:
                return nb
        return items[-1][0]

    negs = [r for r in got if r.label == -1]
    # every anchor with a distance distribution gets exactly 3 negatives
    anchors = {(r.walk_id, r.step, r.win) for r in negs}
    for r in negs:
        assert r.k in (0, 1, 2)
        assert r.u_j == py_draw(r.walk_id, r.step, r.win, r.k)
    for a in anchors:
        assert sum(1 for r in negs if (r.walk_id, r.step, r.win) == a) == 3
    # stuck batches exist: win=0 anchors at terminal steps < walk_length
    stuck = {(r.walk_id, r.step) for r in negs if r.win == 0}
    for wid, s in stuck:
        assert (wid, s) in corpus and (wid, s + 1) not in corpus and s < 3
