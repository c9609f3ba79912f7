"""textstats + report + multimodal plumbing tests."""

import pytest
from pyspark.sql import functions as F

from hgcn_name_disambiguation_spark.operators import textstats
from hgcn_name_disambiguation_spark.operators.multimodal import (
    extract_image_features,
    fake_media_table,
    sample_video_frames,
)
from hgcn_name_disambiguation_spark.operators.report import (
    clusters_report,
    dense_cluster_index,
    majority_vote_assignment,
    venue_paper_counts,
    with_singleton_topup,
)


def test_quality_and_tokens(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox!! (it jumps)"), (2, "word")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in textstats.quality_features(df).collect()}
    assert out[1].n_words == 6
    assert out[1].punct_ratio == pytest.approx(4 / 32, abs=1e-6)  # !!()
    assert out[2].n_words == 1 and out[2].punct_ratio == 0.0
    toks = df.select(
        "doc_id",
        textstats.whitespace_token_count(F.col("text")).alias("ws"),
        textstats.bpe_token_count(F.col("text")).alias("bpe"),
    ).collect()
    got = {r.doc_id: (r.ws, r.bpe) for r in toks}
    assert got[1] == (6, 10)  # the,quick,brown,fox,!,!,(,it,jumps,)
    assert got[2] == (1, 1)


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "el gato de la casa que los perros"),
            (3, "der hund und die katze das ist"),
            (4, "xyzzy plugh qwark"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.lang
        for r in df.select(
            "doc_id", textstats.language_id(F.col("text")).alias("lang")
        ).collect()
    }
    assert got == {1: "en", 2: "es", 3: "de", 4: "und"}


def test_majority_vote_and_topup(spark):
    rows = [
        # block, pub, label, cluster
        ("b", "p1", 1, "c1"),
        ("b", "p2", 1, "c1"),
        ("b", "p3", 1, "c2"),
        ("b", "p4", 2, "c2"),
        ("b", "p5", 2, "c2"),
    ]
    df = spark.createDataFrame(rows, ["block_key", "pub_id", "label", "cluster_id"])
    assign = majority_vote_assignment(df)
    got = {(r.block_key, r.author_id): r.cluster_id for r in assign.collect()}
    assert got == {("b", 1): "c1", ("b", 2): "c2"}

    all_ids = spark.createDataFrame(
        [("b", 1), ("b", 2), ("b", 3)], ["block_key", "author_id"]
    )
    topped = with_singleton_topup(assign, all_ids)
    got = {r.author_id: r.cluster_id for r in topped.collect()}
    assert got[3] == "singleton-3" and len(got) == 3


def test_dense_index_and_report(spark):
    rows = [
        ("b", "p1", "cB"), ("b", "p2", "cB"), ("b", "p3", "cB"),
        ("b", "p4", "cA"), ("b", "p5", "cA"), ("b", "p6", "cC"),
    ]
    df = spark.createDataFrame(rows, ["block_key", "pub_id", "cluster_id"])
    dense = {
        r.cluster_id: r.dense_id
        for r in dense_cluster_index(df).select("cluster_id", "dense_id").distinct().collect()
    }
    # size desc: cB(3)->0, cA(2)->1, cC(1)->2
    assert dense == {"cB": "0", "cA": "1", "cC": "2"}
    rep = {r.cluster_id: r.member_ids for r in clusters_report(df).collect()}
    assert rep["0"] == ["p1", "p2", "p3"] and rep["2"] == ["p6"]


def test_multimodal_plumbing(spark):
    media = fake_media_table(spark, n=30)
    feats = extract_image_features(media, dim=16, fake=True)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(r.ok and len(r.feat) == 16 for r in rows)
    # determinism: same payload -> same features across runs
    again = {r.media_id: r.feat for r in extract_image_features(media, 16, True).collect()}
    assert all(again[r.media_id] == r.feat for r in rows)

    # stub path: fake=False surfaces NotImplementedError per row, not a crash
    stub = extract_image_features(media, dim=16, fake=False).collect()
    assert all((not r.ok) and "not in this container" in r.err for r in stub)

    frames = sample_video_frames(media, every_ms=1000).collect()
    vids = media.where(F.col("kind") == "video").count()
    assert len(frames) == vids * 5  # 5000ms / 1000ms


def test_audio_windows_and_features(spark):
    import numpy as np

    from hgcn_name_disambiguation_spark.operators.multimodal import (
        extract_audio_features,
        segment_audio_windows,
    )

    media = fake_media_table(spark, n=30)
    n_audio = media.where(F.col("kind") == "audio").count()
    # payload 128 bytes -> 64 int16 samples @ 16 kHz -> 4 ms -> 4
    # windows at window_ms=1, aligned with the feature kernel below
    wins = segment_audio_windows(media, window_ms=1).collect()
    assert len(wins) == n_audio * 4
    assert {w.win_start_ms for w in wins} == {0, 1, 2, 3}

    feats = extract_audio_features(media, window_ms=1).collect()
    assert len(feats) == n_audio * 4
    by_key = {(r.media_id, r.win_start_ms): r for r in feats}
    # hand-computed oracle on one clip: real PCM math, not a stub
    payload = {
        r["media_id"]: bytes(r["payload"])
        for r in media.where(F.col("kind") == "audio").collect()
    }
    mid, buf = next(iter(sorted(payload.items())))
    samples = np.frombuffer(buf, dtype="<i2").astype(np.float64) / 32768.0
    for w0 in range(4):
        seg = samples[w0 * 16 : (w0 + 1) * 16]  # 16 samples per ms
        r = by_key[(mid, w0)]
        assert r.n_samples == len(seg)
        assert r.rms == pytest.approx(float(np.sqrt(np.mean(seg**2))))
        zcr = float(np.mean(np.signbit(seg[1:]) != np.signbit(seg[:-1])))
        assert r.zcr == pytest.approx(zcr)


def test_audio_feature_key_unique_for_nondivisible_rates(spark):
    """Regression: at sr=2500/window_ms=1 the old start formula
    (w0*1000//sr) floored windows 0 and 1 both to 0 ms; starts must be
    window_index*window_ms — unique and agreeing with
    segment_audio_windows' stepping."""
    from hgcn_name_disambiguation_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_features,
    )

    # 10 int16 samples @ 2500 Hz; window_ms=1 -> win=2 samples -> 5 windows
    payload = bytes(range(20))
    media = spark.createDataFrame(
        [{
            "media_id": "m1",
            "kind": "audio",
            "payload": payload,
            "meta": {
                "width": None, "height": None, "sample_rate": 2500,
                "duration_ms": None, "codec": "pcm",
            },
        }],
        MEDIA_SCHEMA,
    )
    feats = extract_audio_features(media, window_ms=1).collect()
    starts = [r.win_start_ms for r in feats]
    assert sorted(starts) == [0, 1, 2, 3, 4]


def test_venue_paper_counts(spark):
    """A10: regenerates the reference's confNum venue->count artifact
    shape; NULL venues (placeholder affiliations) are excluded."""
    df = spark.createDataFrame(
        [("b", "p1", "icde"), ("b", "p2", "icde"), ("b", "p3", "kdd"),
         ("b", "p4", None)],
        ["block_key", "pub_id", "venue"],
    )
    out = {r.venue: r.paper_count for r in venue_paper_counts(df).collect()}
    assert out == {"icde": 2, "kdd": 1}


def test_vocab_top_k_and_oov_stats(spark):
    """Tie-break (count DESC, token ASC) pins the cutoff; OOV counts
    are against the fitted vocab; a frozen vocab overrides the fit."""
    from hgcn_name_disambiguation_spark.operators.textstats import (
        oov_stats,
        vocab_top_k,
    )

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "d")],
        "doc_id long, text string",
    )
    vocab = {
        r.token: (r.n_occurrences, r.rank)
        for r in vocab_top_k(docs, vocab_size=2).collect()
    }
    # a and b both occur twice; both beat c/d (once); a ranks first
    assert vocab == {"a": (2, 1), "b": (2, 2)}

    oov = {
        r.doc_id: (r.n_tokens, r.n_oov)
        for r in oov_stats(docs, vocab_size=2).collect()
    }
    assert oov == {1: (3, 0), 2: (2, 1), 3: (1, 1)}

    frozen = spark.createDataFrame([("d",)], "token string")
    oov2 = {
        r.doc_id: (r.n_tokens, r.n_oov)
        for r in oov_stats(docs, vocab=frozen).collect()
    }
    assert oov2 == {1: (3, 3), 2: (2, 2), 3: (1, 0)}
