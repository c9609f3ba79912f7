"""Dedup operator tests with brute-force oracles (SURVEY §5.1 model)."""

import itertools

import pytest
from pyspark.sql import functions as F

from hgcn_name_disambiguation_spark.operators.dedup import (
    dedup_clusters,
    embedding_neardup_pairs,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingle_index,
    simhash_pairs,
    simhash_table,
)


def _corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base + " today"),  # near dup
        (3, "a completely different sentence about spark shuffles and joins"),
        (4, "a completely different sentence about spark shuffles and aggs"),
        (5, "singleton text with unique vocabulary entirely its own zone"),
        (6, "The  Quick  Brown Fox jumps over the lazy dog near the river bank"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _brute_jaccard(rows, n=3):
    def sh(t):
        w = " ".join(t.lower().split()).split(" ")
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    sets = {i: sh(t) for i, t in rows}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union:
            out[(a, b)] = inter / union
    return out


def test_exact_duplicates(spark):
    groups = exact_duplicates(_corpus(spark)).collect()
    assert len(groups) == 1
    g = groups[0]
    # 0, 1 byte-identical; 6 identical after whitespace/case normalize
    assert g.member_ids == [0, 1, 6] and g.keeper_id == 0 and g.n_dups == 3


def test_shingle_index_matches_bruteforce(spark):
    rows = [(r.doc_id, r.text) for r in _corpus(spark).collect()]
    got = shingle_index(_corpus(spark)).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, set()).add(r.shingle)
    want = {
        i: {
            " ".join(" ".join(t.lower().split()).split(" ")[j : j + 3])
            for j in range(len(t.split()) - 2)
        }
        for i, t in rows
    }
    assert by_doc == want


def test_ngram_jaccard_exact_vs_bruteforce(spark):
    rows = [(r.doc_id, r.text) for r in _corpus(spark).collect()]
    want = {
        p: round(v, 6) for p, v in _brute_jaccard(rows).items() if v >= 0.3
    }
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(_corpus(spark), threshold=0.3).collect()
    }
    assert got == pytest.approx(want)


def test_minhash_lsh_finds_near_dups(spark):
    pairs = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_lsh_pairs(_corpus(spark), threshold=0.5).collect()
    }
    # exact dups must collide with est ~1.0
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 6)] == 1.0
    # near dup (jaccard ~0.8) found
    assert (0, 2) in pairs
    # singleton never pairs
    assert not any(5 in p for p in pairs)


def test_simhash_hamming_properties(spark):
    sims = {r.doc_id: r.sim for r in simhash_table(_corpus(spark)).collect()}
    assert sims[0] == sims[1] == sims[6]  # identical after normalize
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")  # noqa: E731
    assert ham(sims[0], sims[2]) <= 8  # near dup, few bits differ
    assert ham(sims[0], sims[5]) > 8  # unrelated, many bits differ
    pairs = {
        (r.id_a, r.id_b)
        for r in simhash_pairs(_corpus(spark), max_hamming=3).collect()
    }
    assert (0, 1) in pairs and (0, 6) in pairs and (1, 6) in pairs


def test_embedding_neardup_and_clusters(spark):
    import math

    vecs = []
    # cluster A: 3 near-identical vectors; cluster B: 2; plus noise
    for i, base in [(0, 0.0), (1, 0.01), (2, -0.01)]:
        vecs.append((i, [math.cos(base + j * 0.1) for j in range(8)]))
    for i, base in [(10, 2.0), (11, 2.02)]:
        vecs.append((i, [math.cos(base + j * 0.37) for j in range(8)]))
    vecs.append((20, [float(j % 2) * 2 - 1 for j in range(8)]))
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])

    pairs = embedding_neardup_pairs(df, threshold=0.99, num_planes=4)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert {(0, 1), (0, 2), (1, 2), (10, 11)} <= got
    assert not any(20 in p for p in got)

    clusters = {
        r.doc_id: r.group_id for r in dedup_clusters(pairs).collect()
    }
    assert clusters["0"] == clusters["1"] == clusters["2"] == "0"
    assert clusters["10"] == clusters["11"] == "10"


def test_simhash_paired_chunks_equivalent(spark):
    """The 2-of-6 chunk-pair index (the >=10^8-doc scale path) must
    return the IDENTICAL verified pair set as the 4x16 index — the
    pigeonhole only changes candidate generation, never the exact
    Hamming verify."""
    c = _corpus(spark)
    small = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_pairs(c, max_hamming=3, paired_chunks=False).collect()
    }
    large = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_pairs(c, max_hamming=3, paired_chunks=True).collect()
    }
    assert small == large and len(small) > 0

    with pytest.raises(ValueError):
        simhash_pairs(c, max_hamming=4, paired_chunks=True)


def test_embedding_neardup_multitable_recall(spark):
    """More tables can only ADD verified pairs (dedup before the exact
    verify), and auto plane sizing floors at 8 on a small corpus."""
    import math

    vecs = [
        (i, [math.cos(0.002 * i + j * 0.1) for j in range(8)])
        for i in range(30)
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    one = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(
            df, threshold=0.999, num_planes=12, num_tables=1
        ).collect()
    }
    four = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(
            df, threshold=0.999, num_planes=12, num_tables=4
        ).collect()
    }
    assert one <= four
    assert len(four) >= len(one)
    # auto sizing: small corpus -> 8 planes == 1-table baseline shape
    auto = embedding_neardup_pairs(df, threshold=0.999)
    assert auto.count() >= 0


def test_minhash_md5_mode_matches_semantics(spark):
    """md5 hash mode (the oracle-checkable family) runs the identical
    banding/verify algorithm: near-dup docs collide and est_jaccard
    approximates the true Jaccard regardless of hash family."""
    pairs = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_lsh_pairs(
            _corpus(spark), threshold=0.5, hash_mode="md5"
        ).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0  # identical docs
    assert all(v >= 0.5 for v in pairs.values())


def test_simhash_md5_mode(spark):
    from hgcn_name_disambiguation_spark.operators.dedup import simhash_table

    sims = {
        r.doc_id: r.sim
        for r in simhash_table(_corpus(spark), hash_mode="md5").collect()
    }
    assert sims[0] == sims[1] == sims[6]  # identical after normalize
    assert all(0 <= v < (1 << 60) for v in sims.values())
    pairs = {
        (r.id_a, r.id_b)
        for r in simhash_pairs(
            _corpus(spark), max_hamming=3, hash_mode="md5"
        ).collect()
    }
    assert (0, 1) in pairs and (0, 6) in pairs


def test_canonical_keep_list_chain_and_singleton(spark):
    """Transitive chain (1-2, 2-3) collapses to keep_id 1; the
    untouched doc 4 keeps itself; numeric min wins even where the
    string min differs ('10' < '9' lexicographically)."""
    from hgcn_name_disambiguation_spark.operators.dedup import (
        canonical_keep_list,
    )

    docs = spark.createDataFrame(
        [(1,), (2,), (3,), (4,), (9,), (10,)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (9, 10)], "id_a long, id_b long"
    )
    out = {
        r.doc_id: (r.keep_id, r.is_canonical)
        for r in canonical_keep_list(docs, pairs).collect()
    }
    assert out == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        4: (4, True),
        9: (9, True),
        10: (9, False),
    }

def test_dup_span_stats_hand_computed(spark):
    """k=3 grams over tiny docs: 'a b c' appears in docs 1 and 2
    (cross-doc dup); doc 3 repeats 'x y z' twice internally with the
    bridging grams also duplicated-free; doc 4 is too short; doc 5 has
    no duplicated gram. Overlapping hits merge into spans."""
    from hgcn_name_disambiguation_spark.operators.dedup import (
        dup_span_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "z z a b c"),
            (3, "x y z x y z"),
            (4, "a b"),
            (5, "p q r s"),
            (6, "a b c d"),
            (7, "b c d e f"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_tokens, r.n_dup_grams, r.dup_tokens, r.has_dup_span)
        for r in dup_span_stats(docs, k=3, min_count=2).collect()
    }
    # doc 1: 'a b c' (also docs 2/6), 'b c d' (6/7), 'c d e' (7) ->
    # hits 0/1/2 merge into one span covering all 5 tokens
    assert out[1] == (5, 3, 5, 1)
    # doc 2: 'a b c' at pos 2 -> 3 tokens
    assert out[2] == (5, 1, 3, 1)
    # doc 3: 'x y z' at pos 0 and 3 appear twice corpus-wide; the
    # bridging grams 'y z x' / 'z x y' appear once each -> hits at
    # pos 0 and 3, spans [0,3)+[3,6) adjacent, 6 tokens covered
    assert out[3] == (6, 2, 6, 1)
    # doc 4: shorter than k -> no grams
    assert out[4] == (2, 0, 0, 0)
    assert out[5] == (4, 0, 0, 0)
    # doc 6: 'a b c' (docs 1/2/6) at pos 0 and 'b c d' (docs 6/7) at
    # pos 1 OVERLAP: [0,3) u [1,4) covers 4 tokens, not 6
    assert out[6] == (4, 2, 4, 1)
    # doc 7: 'b c d' at 0 and 'c d e' at 1 -> [0,4) = 4 tokens
    assert out[7] == (5, 2, 4, 1)


def test_dup_span_stats_hash_mode_matches(spark):
    """hash_grams=True (the 100-TB shuffle-bytes mode) must produce
    identical stats on collision-free input."""
    from hgcn_name_disambiguation_spark.operators.dedup import (
        dup_span_stats,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i} common phrase here tail{i % 3}") for i in range(30)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, dup_span_stats(docs, k=2).collect()))
    b = sorted(map(tuple, dup_span_stats(docs, k=2, hash_grams=True).collect()))
    assert a == b

def test_remove_dup_spans_hand_computed(spark):
    """Same corpus as the span-stats test: removal drops exactly the
    covered positions and re-joins the survivors in order."""
    from hgcn_name_disambiguation_spark.operators.dedup import (
        remove_dup_spans,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "z z a b c"),
            (3, "x y z x y z"),
            (4, "a b"),
            (5, "p q r s"),
            (6, "a b c d"),
            (7, "b c d e f"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_tokens, r.n_tokens_kept, r.clean_text)
        for r in remove_dup_spans(docs, k=3, min_count=2).collect()
    }
    assert out[1] == (5, 0, "")          # hits 0/1/2 cover everything
    assert out[2] == (5, 2, "z z")       # hit at 2 covers positions 2-4
    assert out[3] == (6, 0, "")          # hits 0 and 3 cover all 6
    assert out[4] == (2, 2, "a b")       # shorter than k: untouched
    assert out[5] == (4, 4, "p q r s")   # no duplicated gram
    assert out[6] == (4, 0, "")          # hits 0/1 cover 0-3
    assert out[7] == (5, 1, "f")         # hits 0/1 cover 0-3, keep 4


def _emb_corpus(spark):
    # three tight pairs at distinct angles + two isolated points;
    # within any cell the pairs are >=0.99 cosine, cross-pair <0.9
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.04, 0.0, 0.0]),     # near-dup of 0, closer probe
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.999, 0.04, 0.0]),     # near-dup of 2
        (4, [0.0, 0.0, 1.0, 1.0]),
        (5, [0.5, 0.5, 0.5, 0.5]),        # isolated-ish
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def test_semantic_dedup_hand_computed(spark):
    from hgcn_name_disambiguation_spark.operators.dedup import semantic_dedup

    # single cell => pure pairwise semantics, rule checkable by hand
    out = {
        r.vec_id: r
        for r in semantic_dedup(
            _emb_corpus(spark), theta=0.95, num_cells=1
        ).collect()
    }
    assert len(out) == 6
    # pairs (0,1) and (2,3) are >=0.95; of each pair exactly the member
    # FARTHER from the centroid survives; 4 and 5 are untouched
    assert out[4].kept and out[4].n_theta_nbrs == 0
    assert out[5].kept and out[5].n_theta_nbrs == 0
    assert out[0].n_theta_nbrs == 1 and out[1].n_theta_nbrs == 1
    assert out[0].kept != out[1].kept
    assert out[2].kept != out[3].kept


def test_semantic_dedup_prod_mode_invariance(spark):
    """xxhash64 + auto-sized cells: deterministic under repartitioning
    and row order, and md5/xxhash64 modes agree on pure-pairwise
    (single-cell) semantics."""
    from hgcn_name_disambiguation_spark.operators.dedup import semantic_dedup

    e = _emb_corpus(spark)
    a = semantic_dedup(e, theta=0.95, num_cells=None, rows_per_cell=2)
    b = semantic_dedup(
        e.repartition(7).sortWithinPartitions(F.desc("vec_id")),
        theta=0.95,
        num_cells=None,
        rows_per_cell=2,
    )
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    # auto-sizing engaged: 6 rows / 2 per cell >= 3 cells minimum 4
    cells = {t[1] for t in ra}
    assert len(cells) >= 2

    m1 = sorted(map(tuple, semantic_dedup(e, theta=0.95, num_cells=1, hash_mode="md5").collect()))
    m2 = sorted(map(tuple, semantic_dedup(e, theta=0.95, num_cells=1, hash_mode="xxhash64").collect()))
    assert m1 == m2


def test_winnow_guarantee_and_tie_rule(spark):
    """Every window of `window` consecutive k-gram positions contains a
    selected fingerprint (the winnowing guarantee), in BOTH hash modes,
    and the selection is repartition-invariant."""
    from hgcn_name_disambiguation_spark.operators.dedup import (
        winnow_fingerprints,
    )

    words = [f"w{i % 7}" for i in range(40)]  # repeats force hash ties
    rows = [
        (1, " ".join(words)),
        (2, "Mixed CASE text, with-punct! " + " ".join(words[:20])),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    k, w = 4, 5
    for mode in ("xxhash64", "md5"):
        fps = winnow_fingerprints(df, k=k, window=w, hash_mode=mode)
        got = sorted(
            (r["doc_id"], r["fp_pos"], r["fp_hash"]) for r in fps.collect()
        )
        by_doc = {}
        for d, p, h in got:
            by_doc.setdefault(d, set()).add(p)
        for doc_id, text in rows:
            nk = len([t for t in text.lower().split() if True])
            # token count after the operator's own normalization:
            import re

            toks = [
                t
                for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split()
                if t
            ]
            nkg = len(toks) - k + 1
            sel = by_doc[doc_id]
            assert sel, f"doc {doc_id} selected nothing"
            for start in range(0, nkg - w + 1):
                assert any(
                    start <= p <= start + w - 1 for p in sel
                ), f"window at {start} uncovered for doc {doc_id}"
        # repartition invariance
        again = sorted(
            (r["doc_id"], r["fp_pos"], r["fp_hash"])
            for r in winnow_fingerprints(
                df.repartition(7), k=k, window=w, hash_mode=mode
            ).collect()
        )
        assert again == got


def test_winnow_short_docs(spark):
    from hgcn_name_disambiguation_spark.operators.dedup import (
        winnow_fingerprints,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c"),          # 3 tokens < k=4 -> no k-grams
            (2, "a b c d"),        # exactly one k-gram -> one fp at pos 0
            (3, "a b c d e f"),    # 3 k-grams < window=5 -> global min only
        ],
        ["doc_id", "text"],
    )
    out = winnow_fingerprints(df, k=4, window=5).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["fp_pos"])
    assert 1 not in by_doc
    assert by_doc[2] == [0]
    assert len(by_doc[3]) == 1 and 0 <= by_doc[3][0] <= 2


def test_clone_pairs_detects_and_scores(spark):
    """Identical docs -> containment 1e6; a doc sharing a long prefix
    is paired; an unrelated doc is not."""
    from hgcn_name_disambiguation_spark.operators.dedup import clone_pairs

    base = " ".join(f"tok{i}" for i in range(30))
    other = " ".join(f"zzz{i}" for i in range(30))
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base),                               # exact clone
            (3, base + " tail9 tail8 tail7"),        # superset clone
            (4, other),                              # unrelated
        ],
        ["doc_id", "text"],
    )
    # max_hash_docs=50 keeps all; min_shared=2 standard
    out = {
        (r["id_a"], r["id_b"]): r
        for r in clone_pairs(df, max_hash_docs=50, min_shared=2).collect()
    }
    assert (1, 2) in out and out[(1, 2)]["containment_ppm"] == 1_000_000
    assert (1, 3) in out and out[(1, 3)]["containment_ppm"] == 1_000_000
    assert all(4 not in pair for pair in out)


def test_clone_pairs_stop_fingerprint_cap(spark):
    """A fingerprint present in more docs than max_hash_docs is dropped
    before the self-join: with the cap at 2, three identical docs share
    NO eligible fingerprints and no pair is emitted."""
    from hgcn_name_disambiguation_spark.operators.dedup import clone_pairs

    base = " ".join(f"tok{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, base)], ["doc_id", "text"]
    )
    assert clone_pairs(df, max_hash_docs=2, min_shared=1).count() == 0
    assert clone_pairs(df, max_hash_docs=3, min_shared=1).count() == 3


def test_clone_pairs_over_repo_files_table(spark, fixture_repo_files):
    """clone_pairs runs directly over the north-rule input shape
    (repo, path, commit, lang, content): same-entity files in the ER
    fixture share topic vocabulary, so winnowing finds clone pairs,
    and every reported pair shares >= min_shared fingerprints by
    construction (sanity re-derive on a sample)."""
    from hgcn_name_disambiguation_spark.operators.dedup import (
        clone_pairs,
        winnow_fingerprints,
    )
    from pyspark.sql import functions as F

    rf = fixture_repo_files.select(
        F.concat_ws("/", "repo", "path", "commit").alias("doc_id"),
        F.col("content").alias("text"),
    )
    pairs = clone_pairs(rf, max_hash_docs=30, min_shared=2)
    got = pairs.limit(5).collect()
    assert pairs.count() >= 1
    fps = (
        winnow_fingerprints(rf)
        .groupBy("doc_id")
        .agg(F.collect_set("fp_hash").alias("hs"))
    )
    hs = {r["doc_id"]: set(r["hs"]) for r in fps.collect()}
    for r in got:
        assert len(hs[r["id_a"]] & hs[r["id_b"]]) >= 2


def test_repo_fork_pairs_detects_forked_repo(spark):
    """A repo whose files are copies of another repo's files scores
    containment 1e6 against it; an unrelated repo pairs with neither.
    Fingerprints are per-FILE, so a renamed path still matches."""
    from hgcn_name_disambiguation_spark.operators.dedup import (
        repo_fork_pairs,
    )

    fa = " ".join(f"alpha{i}" for i in range(40))
    fb = " ".join(f"beta{i}" for i in range(40))
    fz = " ".join(f"zeta{i}" for i in range(40))
    files = spark.createDataFrame(
        [
            ("origin", "src/a.py", fa),
            ("origin", "src/b.py", fb),
            ("fork", "lib/renamed_a.py", fa),   # fork: same content,
            ("fork", "lib/renamed_b.py", fb),   # different paths
            ("other", "x.py", fz),              # unrelated
        ],
        ["repo", "path", "content"],
    )
    out = {
        (r["repo_a"], r["repo_b"]): r
        for r in repo_fork_pairs(
            files, max_hash_repos=10, min_shared=2
        ).collect()
    }
    assert ("fork", "origin") in out
    assert out[("fork", "origin")]["containment_ppm"] == 1_000_000
    assert all("other" not in pair for pair in out)


def test_repo_fork_pairs_stop_fingerprint_cap(spark):
    """A fingerprint present in more repos than max_hash_repos (a
    shared license header) is dropped before the self-join: with the
    cap at 2, three repos sharing one header file produce no pairs."""
    from hgcn_name_disambiguation_spark.operators.dedup import (
        repo_fork_pairs,
    )

    header = " ".join(f"license{i}" for i in range(40))
    files = spark.createDataFrame(
        [(f"r{j}", "LICENSE", header) for j in range(3)],
        ["repo", "path", "content"],
    )
    assert (
        repo_fork_pairs(files, max_hash_repos=2, min_shared=1).count() == 0
    )
    assert (
        repo_fork_pairs(files, max_hash_repos=3, min_shared=1).count() == 3
    )


def test_fork_families_transitive_and_singletons(spark):
    """fork_families closes fork edges transitively (a fork of a fork
    joins the original's family) and unions non-forked repos back as
    their own singleton families."""
    from hgcn_name_disambiguation_spark.operators.dedup import (
        fork_families,
    )
    from pyspark.sql import functions as F

    pairs = spark.createDataFrame(
        [
            ("a", "b", 900_000),
            ("b", "c", 800_000),   # chain a-b-c => one family
            ("c", "d", 10_000),    # below threshold: d stays out
        ],
        ["repo_a", "repo_b", "containment_ppm"],
    ).withColumn("shared_fps", F.lit(9)) \
     .withColumn("fp_a", F.lit(10)).withColumn("fp_b", F.lit(10))
    repos = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("e",)], ["repo"]
    )
    fam = {
        r["repo"]: r["family_id"]
        for r in fork_families(
            pairs, repos, min_containment_ppm=500_000
        ).collect()
    }
    assert fam == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "e"}
