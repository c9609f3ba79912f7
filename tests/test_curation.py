"""Curation operator tests with brute-force Python oracles.

Covers the three dataset-curation extensions (operators/curation.py):
benchmark decontamination, deterministic stratified sampling, and
Gopher-style repetition filtering.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from hgcn_name_disambiguation_spark.operators.curation import (
    contamination_flags,
    repetition_features,
    sample_cutoff_hex,
    stratified_sample,
)


def _shingles(text, n):
    w = " ".join(text.lower().split()).split(" ")
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


BENCH = "alpha beta gamma delta epsilon zeta eta theta"


def _corpus(spark):
    rows = [
        # contains the full benchmark span -> fully contaminated
        (0, BENCH),
        # copied 5-token span from the benchmark inside fresh text
        # (7 tokens -> 3 shingles, 1 hit -> ratio 1/3 >= 0.2)
        (1, "then beta gamma delta epsilon zeta tail"),
        # shares only a 4-token span: below n=5, must NOT flag
        (2, "some filler gamma delta epsilon zeta filler closing words here"),
        # clean
        (3, "completely unrelated sentence about spark shuffles and joins"),
        # too short for any 5-gram: zero shingles, never contaminated
        (4, "tiny doc"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_contamination_matches_brute_force(spark):
    docs = _corpus(spark)
    ev = spark.createDataFrame([(100, BENCH)], ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in contamination_flags(docs, ev, n=5, ratio_threshold=0.2)
        .collect()
    }
    ev_sh = _shingles(BENCH, 5)
    for doc_id, text in docs.collect():
        sh = _shingles(text, 5) if len(text.split()) >= 5 else set()
        ov = len(sh & ev_sh)
        r = got[doc_id]
        assert r["n_shingles"] == len(sh)
        assert r["overlap_shingles"] == ov
        assert r["contamination_micro"] == ov * 1_000_000 // max(len(sh), 1)
        want_flag = int(len(sh) > 0 and ov / max(len(sh), 1) >= 0.2)
        assert r["contaminated"] == want_flag
    assert got[0]["contaminated"] == 1
    assert got[1]["contaminated"] == 1
    assert got[2]["contaminated"] == 0
    assert got[3]["contaminated"] == 0
    assert got[4]["contaminated"] == 0 and got[4]["n_shingles"] == 0


def test_contamination_plan_broadcasts_eval_side(spark):
    docs = _corpus(spark)
    ev = docs.where(F.col("doc_id") == 0)
    plan = contamination_flags(docs, ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_stratified_sample_matches_hash_rule(spark):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    rates = {"en": 0.5, "de": 0.2, "fr": 0.0}
    kept = {
        r["doc_id"]
        for r in stratified_sample(df, rates, seed=7).select("doc_id").collect()
    }
    expect = set()
    for i, lang in rows:
        hx = hashlib.md5(f"7:{i}".encode()).hexdigest()[:15]
        if hx < sample_cutoff_hex(rates[lang]):
            expect.add(i)
    assert kept == expect
    assert not any(i % 3 == 2 for i in kept)  # fr rate 0.0 -> empty
    # approximate rate sanity on the en stratum (100 rows at 0.5)
    n_en = sum(1 for i in kept if i % 3 == 0)
    assert 30 <= n_en <= 70


def test_stratified_sample_nested_and_deterministic(spark):
    rows = [(i, "en") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    small = {
        r["doc_id"]
        for r in stratified_sample(df, {"en": 0.2}, seed=7).collect()
    }
    big = {
        r["doc_id"]
        for r in stratified_sample(df, {"en": 0.6}, seed=7).collect()
    }
    again = {
        r["doc_id"]
        for r in stratified_sample(df, {"en": 0.2}, seed=7).collect()
    }
    assert small <= big  # nested samples across rates
    assert small == again  # rerun-stable
    # rate 1.0 keeps everything (the 'g' supremum cutoff)
    assert stratified_sample(df, {"en": 1.0}, seed=7).count() == 200
    # and a narrow plan: no shuffle anywhere
    plan = (
        stratified_sample(df, {"en": 0.2}, seed=7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_pack_sequences_prefix_sum(spark):
    from hgcn_name_disambiguation_spark.operators.curation import (
        pack_sequences,
    )

    rows = [(i, " ".join(["tok"] * (3 + (i * 7) % 11))) for i in range(97)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def brute():
        out, off = {}, 0
        for i, text in rows:
            n = len(text.split())
            out[i] = (n, off, off // 64, (off + n - 1) // 64)
            off += n
        return out

    want = brute()
    for ranges in (2, 7, 32):  # layout-invariance: same answer at any
        got = {
            r["doc_id"]: (
                r["n_tokens"],
                r["start_offset"],
                r["start_chunk"],
                r["end_chunk"],
            )
            for r in pack_sequences(
                df, seq_len=64, num_ranges=ranges
            ).collect()
        }
        assert got == want
    # chunk stream is gap-free: consecutive docs abut exactly
    offs = sorted(v[1] for v in want.values())
    lens = {v[1]: v[0] for v in want.values()}
    assert all(
        offs[i + 1] == offs[i] + lens[offs[i]] for i in range(len(offs) - 1)
    )


def test_redact_text(spark):
    from hgcn_name_disambiguation_spark.operators.curation import (
        redact_text,
    )

    rows = [
        (0, "reach me at first.last+tag@sub.example.co.uk or "
            "http://plain.org/x today"),
        (1, "card 1234567890123456 and pin 123 stay; short 12345678 stays"),
        (2, "see https://a.b/c?d=1&e=2 twice https://z.z/1"),
        (3, "nothing sensitive here at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in redact_text(df).collect()}
    assert got[0]["text_redacted"] == "reach me at <EMAIL> or <URL> today"
    assert (got[0]["n_emails"], got[0]["n_urls"]) == (1, 1)
    # 16-digit run masked; 3- and 8-digit runs kept (< 9 digits)
    assert got[1]["text_redacted"] == (
        "card <NUM> and pin 123 stay; short 12345678 stays"
    )
    assert got[1]["n_longnums"] == 1
    assert got[2]["text_redacted"] == "see <URL> twice <URL>"
    assert got[2]["n_urls"] == 2
    assert got[3]["text_redacted"] == rows[3][1]
    assert (got[3]["n_emails"], got[3]["n_urls"], got[3]["n_longnums"]) == (
        0, 0, 0,
    )


def test_curate_funnel_end_to_end(spark):
    """jobs/curate.py funnel: each stage removes exactly the docs
    planted for it; the survivors come out packed."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "curate_job",
        os.path.join(os.path.dirname(__file__), "..", "jobs", "curate.py"),
    )
    curate_job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(curate_job)

    base = " ".join(f"w{i}" for i in range(40))
    base2 = " ".join(f"v{i}" for i in range(40))
    clean = lambda s: " ".join(  # noqa: E731
        f"{s}tok{i}" for i in range(20)
    )
    rows = [
        (0, base, "en"),                       # keeper of exact-dup pair
        (1, base, "en"),                       # exact dup -> dropped
        (2, base2 + " tail", "en"),            # keeper of near-dup pair
        (3, base2 + " tial", "en"),            # near dup -> dropped
        (4, "x0 x1 " + BENCH + " x2", "en"),   # contaminated -> dropped
        (5, " ".join(["spam"] * 20), "en"),    # repetitive -> dropped
        (6, clean("a"), "en"),                 # survives
        (7, clean("b"), "en"),                 # survives
        (8, clean("c"), "de"),                 # sampled out (de rate 0)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    ev = spark.createDataFrame([(100, BENCH)], ["doc_id", "text"])

    packed, funnel = curate_job.curate(
        docs, ev, {"en": 1.0, "de": 0.0}, seq_len=16, ngram=3, jaccard=0.5
    )
    stages = dict(funnel)
    assert stages["input"] == 9
    assert stages["exact_dedup"] == 8        # -d1
    assert stages["near_dedup"] == 7         # -d3
    assert stages["decontaminate"] == 6      # -d4
    assert stages["repetition_filter"] == 5  # -d5
    assert stages["stratified_sample"] == 4  # -d8
    assert stages["packed"] == 4
    kept = {r["doc_id"] for r in packed.collect()}
    assert kept == {0, 2, 6, 7}


def test_curate_near_dedup_with_string_doc_ids(spark):
    """Regression: the near-dedup stage must work for non-numeric
    string doc_ids (a blind cast-to-long nulls every id and silently
    turns the stage into a no-op)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "curate_job_s",
        os.path.join(os.path.dirname(__file__), "..", "jobs", "curate.py"),
    )
    curate_job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(curate_job)

    base = " ".join(f"v{i}" for i in range(40))
    rows = [
        ("doc/a", base + " tail", "en"),   # keeper (min string id)
        ("doc/b", base + " tial", "en"),   # near dup -> dropped
        ("doc/c", " ".join(f"u{i}" for i in range(30)), "en"),  # survives
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    packed, funnel = curate_job.curate(
        docs, None, None, seq_len=16, ngram=3, jaccard=0.5
    )
    stages = dict(funnel)
    assert stages["near_dedup"] == 2
    kept = {r["doc_id"] for r in packed.collect()}
    assert kept == {"doc/a", "doc/c"}


def test_repetition_features_brute_force(spark):
    rows = [
        (0, "spam spam spam spam spam spam"),
        # 15 unique tokens -> dup 0, top bigram 1/14 < 0.10
        (1, "all words here are totally unique tokens friend every single "
            "one distinct from previous neighbors"),
        (2, "ab cd ab cd ab cd ab cd ef"),
        (3, "one"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in repetition_features(df).collect()}
    for doc_id, text in rows:
        toks = text.split()
        bigrams = [
            f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
        ]
        dup = 1.0 - len(set(toks)) / len(toks)
        top = (
            max(bigrams.count(b) for b in set(bigrams)) / len(bigrams)
            if bigrams
            else 0.0
        )
        r = got[doc_id]
        assert r["n_tokens"] == len(toks)
        # exact integer micro-units: floor(1e6 * num / den)
        dup_micro = (len(toks) - len(set(toks))) * 1_000_000 // len(toks)
        top_micro = (
            max(bigrams.count(b) for b in set(bigrams))
            * 1_000_000
            // len(bigrams)
            if bigrams
            else 0
        )
        assert r["dup_token_micro"] == dup_micro
        assert r["top_bigram_micro"] == top_micro
        assert r["repetitive"] == int(dup > 0.65 or top > 0.10)
    assert got[0]["repetitive"] == 1  # one token repeated throughout
    assert got[1]["repetitive"] == 0
    assert got[2]["repetitive"] == 1  # dominant bigram
    assert got[3]["repetitive"] == 0 and got[3]["top_bigram_micro"] == 0


def test_bigram_logprob_hand_computed(spark):
    """Add-one-smoothed corpus bigram model vs hand arithmetic."""
    import math

    from hgcn_name_disambiguation_spark.operators.curation import (
        bigram_logprob,
    )

    # corpus: bigrams = d0: (a b), (b a); d1: (a b); d2: none
    rows = [(0, "a b a"), (1, "a b"), (2, "solo")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in bigram_logprob(df).collect()}
    # vocab = {a, b, solo} -> V=3
    # counts: (a,b)=2, (b,a)=1; continuations: a·=2, b·=1
    # scores are integer micro-nats: floor(1e6*ln p) per bigram,
    # exact integer sum, floored mean (engine-stable, the q42 fix).
    p_ab = (2 + 1) / (2 + 3)
    p_ba = (1 + 1) / (1 + 3)
    m_ab = math.floor(1e6 * math.log(p_ab))
    m_ba = math.floor(1e6 * math.log(p_ba))
    d0 = math.floor((m_ab + m_ba) / 2)
    assert got[0].n_bigrams == 2
    assert got[0].avg_logprob_micro == d0
    assert got[1].n_bigrams == 1
    assert got[1].avg_logprob_micro == m_ab
    assert got[1].ppl_micro == -got[1].avg_logprob_micro
    # single-token doc: no bigrams, NULL scores
    assert got[2].n_bigrams == 0 and got[2].avg_logprob_micro is None
    # fluency ordering: the repeated in-corpus bigram scores higher
    assert got[1].avg_logprob_micro >= d0


def test_corpus_composition_hand_computed(spark):
    """Cross-source dups count in every stratum; truncated dup key
    manufactures dups the full-text key doesn't see."""
    from hgcn_name_disambiguation_spark.operators.curation import (
        corpus_composition,
    )

    docs = spark.createDataFrame(
        [
            (1, "x y", "s1", "en"),
            (2, "x y", "s1", "en"),
            (3, "x y", "s2", "fr"),
            (4, "a b c", "s2", "fr"),
            (5, "a b d", "s2", "fr"),
        ],
        "doc_id long, text string, source string, lang string",
    )
    full = {
        (r.source, r.lang): (r.n_docs, r.n_tokens, r.n_dup_docs, r.n_unique_texts)
        for r in corpus_composition(docs).collect()
    }
    # 'x y' occurs 3x corpus-wide: both s1 docs AND the s2 copy flag
    assert full[("s1", "en")] == (2, 4, 2, 1)
    assert full[("s2", "fr")] == (3, 8, 1, 3)

    trunc = {
        (r.source, r.lang): (r.n_dup_docs, r.n_unique_texts)
        for r in corpus_composition(docs, dup_key_tokens=2).collect()
    }
    # keyed on first 2 tokens, 'a b c'/'a b d' collapse into a dup pair
    assert trunc[("s2", "fr")] == (3, 2)
    assert trunc[("s1", "en")] == (2, 1)


def test_importance_weights_python_replica(spark):
    """DSIR scores replicated exactly in pure Python (same md5
    bucketing, same per-term floor(1e6*ln) integer arithmetic), plus
    the semantic check: the doc made of target words outscores the
    disjoint one, and select_k=1 flags exactly it."""
    import math

    from hgcn_name_disambiguation_spark.operators.curation import (
        importance_weights,
    )

    raw_rows = [
        (0, "spark shuffle join"),       # target-like
        (1, "llama gnu zebra"),          # disjoint from target
        (2, "spark zebra join"),         # mixed
    ]
    tgt_rows = [(10, "spark join shuffle"), (11, "spark shuffle")]
    B = 10_000
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(tgt_rows, "doc_id long, text string")

    def ngrams(text):
        w = " ".join(text.lower().split()).split(" ")
        return w + [f"{a} {b}" for a, b in zip(w, w[1:])]

    def bucket(ng):
        return int(hashlib.md5(ng.encode()).hexdigest()[:15], 16) % B

    def counts(rows):
        out = {}
        for _id, text in rows:
            for ng in ngrams(text):
                out[bucket(ng)] = out.get(bucket(ng), 0) + 1
        return out

    rc, tc = counts(raw_rows), counts(tgt_rows)
    tr, tt = sum(rc.values()), sum(tc.values())
    fl = lambda x: math.floor(1e6 * math.log(x))
    lr = {
        b: fl(tc.get(b, 0) + 1.0) - fl(tt + float(B))
        - fl(rc[b] + 1.0) + fl(tr + float(B))
        for b in rc
    }
    expected = {}
    for _id, text in raw_rows:
        per_doc = {}
        for ng in ngrams(text):
            per_doc[bucket(ng)] = per_doc.get(bucket(ng), 0) + 1
        expected[_id] = (
            sum(per_doc.values()),
            sum(c * lr[b] for b, c in per_doc.items()),
        )

    got = {
        r.doc_id: (r.n_feats, r.logratio_micro, r.selected)
        for r in importance_weights(
            raw, tgt, num_buckets=B, hash_mode="md5", select_k=1
        ).collect()
    }
    assert {k: v[:2] for k, v in got.items()} == expected
    # target-like doc scores highest and is the one selected
    assert got[0][1] > got[2][1] > got[1][1]
    assert [k for k, v in got.items() if v[2] == 1] == [0]


def test_importance_weights_scores_only_and_xxhash_mode(spark):
    """select_k=None returns scores without the flag column, and the
    production xxhash64 mode runs with the same schema + row count."""
    from hgcn_name_disambiguation_spark.operators.curation import (
        importance_weights,
    )

    raw = spark.createDataFrame(
        [(0, "a b"), (1, "c d"), (2, "a d")], "doc_id long, text string"
    )
    tgt = spark.createDataFrame([(9, "a b")], "doc_id long, text string")
    s = importance_weights(raw, tgt, num_buckets=64, hash_mode="md5")
    assert s.columns == ["doc_id", "n_feats", "logratio_micro"]
    p = importance_weights(raw, tgt, num_buckets=64, select_k=2)
    assert p.columns == ["doc_id", "n_feats", "logratio_micro", "selected"]
    rows = p.collect()
    assert len(rows) == 3 and sum(r.selected for r in rows) == 2


def test_importance_weights_plan_broadcasts_model(spark):
    """The scale contract: the log-ratio model table (bounded by
    num_buckets rows) rides a broadcast join into the doc-feature
    frame — the corpus is never shuffled by bucket for scoring."""
    from hgcn_name_disambiguation_spark.operators.curation import (
        importance_weights,
    )

    raw = spark.createDataFrame(
        [(i, f"w{i} w{i+1} common") for i in range(20)],
        "doc_id long, text string",
    )
    tgt = raw.where(F.col("doc_id") < 3)
    plan = (
        importance_weights(raw, tgt, num_buckets=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
