"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque BINARY columns + typed metadata structs; all
transforms are Arrow-batched `mapInPandas` stages so a 100-TB media
table streams through Python workers batch-by-batch without ever
materializing a partition as one object.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container,
so the IMAGE decode kernel is STUBBED: `decode_image` raises
NotImplementedError unless `fake=True`, in which case a deterministic
fake decoder (seeded from the content hash) produces stable
"features" — the Spark-side plumbing (schema, batching, partitioning,
UDF signatures) is real and tested either way. The AUDIO path is NOT
a stub: raw 16-bit PCM interpretation is pure arithmetic, so
`extract_audio_features` computes real per-window RMS/zero-crossing
features (compressed codecs would still need ffmpeg-class decoders).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("feat", T.ArrayType(T.FloatType()), True),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("err", T.StringType(), True),
    ]
)


def _fake_feature(
    payload: bytes, dim: int = 16, hash_name: str = "sha256"
) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: dim floats
    derived from a content hash — stable across runs/partitions.

    ``hash_name='md5hex'`` hashes the UPPERCASE hex of the payload
    instead (md5(hex(payload)) is expressible in DuckDB SQL, where
    sha256-of-BLOB is not — the oracle twin q47 rides this), with
    components pre-rounded to 6 dp so the float32 schema round-trips
    the same 6-dp value the double-precision oracle computes."""
    data = payload or b""
    if hash_name == "md5hex":
        h = hashlib.md5(data.hex().upper().encode()).digest()
        return [
            round((h[i % len(h)] / 255.0) * 2.0 - 1.0, 6) for i in range(dim)
        ]
    h = hashlib.sha256(data).digest()
    return [((h[i % 32] / 255.0) * 2.0 - 1.0) for i in range(dim)]


def decode_image(
    payload: bytes, fake: bool = False, hash_name: str = "sha256"
) -> list[float]:
    """STUB: real impl would be PIL.Image.open + resize + normalize.
    The image libraries are not available in this environment."""
    if fake:
        return _fake_feature(payload, hash_name=hash_name)
    raise NotImplementedError(
        "image decoding requires PIL/opencv — not in this container; "
        "pass fake=True for deterministic plumbing tests"
    )


def extract_image_features(
    media: DataFrame,
    dim: int = 16,
    fake: bool = True,
    batch_limit: int = 1024,
    hash_name: str = "sha256",
) -> DataFrame:
    """mapInPandas feature extraction: BINARY payload -> ARRAY<FLOAT>.

    Batches are re-chunked to <= batch_limit rows so worker memory is
    bounded by batch_limit * payload size, not partition size —
    the pattern that matters at 100 TB (spark.sql.execution.arrow.
    maxRecordsPerBatch governs the Arrow reader; this guards the
    output side).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                feats, oks, errs = [], [], []
                for payload in chunk["payload"]:
                    try:
                        feats.append(
                            decode_image(
                                payload, fake=fake, hash_name=hash_name
                            )[:dim]
                        )
                        oks.append(True)
                        errs.append(None)
                    except NotImplementedError as e:  # stub path
                        feats.append(None)
                        oks.append(False)
                        errs.append(str(e))
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "feat": feats,
                        "ok": oks,
                        "err": errs,
                    }
                )

    cols = media.select("media_id", "payload")
    return cols.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("win_start_ms", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zcr", T.DoubleType(), True),
    ]
)


def segment_audio_windows(media: DataFrame, window_ms: int = 1000) -> DataFrame:
    """Audio window segmentation from metadata — pure relational.

    One row per (media_id, win_start_ms) fixed-length window, duration
    derived from the payload size under the raw-PCM contract
    (16-bit mono: n_samples = length/2, duration_ms =
    n_samples * 1000 / sample_rate). The explode mirrors
    sample_video_frames: JVM-side sequence(), no Python, so a 100-TB
    audio table segments in one narrow pass.
    """
    sr = F.coalesce(F.col("meta.sample_rate"), F.lit(16000))
    n_samples = (F.length("payload") / 2).cast("long")
    duration_ms = (n_samples * 1000 / sr).cast("long")
    ts = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(duration_ms - 1, F.lit(0).cast("long")),
        F.lit(window_ms).cast("long"),
    )
    return (
        media.where(F.col("kind") == "audio")
        .select("media_id", F.explode(ts).alias("win_start_ms"))
    )


def extract_audio_features(
    media: DataFrame,
    window_ms: int = 1000,
    batch_limit: int = 1024,
) -> DataFrame:
    """Per-window RMS + zero-crossing rate over raw-PCM payloads.

    Unlike the image path this is NOT a stub: interpreting a BINARY
    payload as 16-bit little-endian mono PCM is pure arithmetic (no
    codec), done vectorized in numpy per Arrow batch. Compressed
    codecs (mp3/opus/...) would need ffmpeg-class decoders — not in
    this container — and fail rows with ok=False in decode terms; the
    synthetic tables carry raw PCM, so the whole path exercises real
    math end-to-end. Same bounded-chunk batching discipline as
    extract_image_features.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                out: dict[str, list] = {
                    "media_id": [],
                    "win_start_ms": [],
                    "n_samples": [],
                    "rms": [],
                    "zcr": [],
                }
                for mid, payload, sr in zip(
                    chunk["media_id"], chunk["payload"], chunk["sample_rate"]
                ):
                    sr = int(sr) if sr and sr > 0 else 16000
                    buf = bytes(payload or b"")
                    samples = np.frombuffer(
                        buf[: len(buf) - (len(buf) % 2)], dtype="<i2"
                    ).astype(np.float64) / 32768.0
                    win = max(1, int(round(sr * window_ms / 1000.0)))
                    # window start = index * window_ms (NOT w0*1000//sr,
                    # which can floor successive windows to the same ms
                    # for sub-ms windows / non-divisible rates): keeps
                    # (media_id, win_start_ms) unique and agrees with
                    # segment_audio_windows' exact window_ms stepping.
                    for wi, w0 in enumerate(range(0, len(samples), win)):
                        seg = samples[w0 : w0 + win]
                        out["media_id"].append(mid)
                        out["win_start_ms"].append(int(wi * window_ms))
                        out["n_samples"].append(len(seg))
                        out["rms"].append(float(np.sqrt(np.mean(seg**2))))
                        out["zcr"].append(
                            float(np.mean(np.signbit(seg[1:]) != np.signbit(seg[:-1])))
                            if len(seg) > 1
                            else 0.0
                        )
                yield pd.DataFrame(out)

    cols = media.where(F.col("kind") == "audio").select(
        "media_id",
        "payload",
        F.coalesce(F.col("meta.sample_rate"), F.lit(16000)).alias("sample_rate"),
    )
    return cols.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, fake: bool = True
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp,
    computed from meta.duration_ms (pure relational explode — the
    decode of each frame is the stubbed kernel above)."""
    ts = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return (
        media.where(F.col("kind") == "video")
        .select("media_id", F.explode(ts).alias("frame_ms"))
    )


def fake_media_table(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media rows for plumbing tests."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4
        rows.append(
            {
                "media_id": f"m{i:04d}",
                "kind": kind,
                "payload": bytes(payload),
                "meta": {
                    "width": 64 if kind == "image" else None,
                    "height": 64 if kind == "image" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                    "duration_ms": 5000 if kind == "video" else None,
                    "codec": "fake",
                },
            }
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
