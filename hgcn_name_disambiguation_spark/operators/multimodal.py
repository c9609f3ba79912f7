"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque BINARY columns + typed metadata structs; all
transforms are Arrow-batched `mapInPandas` stages so a 100-TB media
table streams through Python workers batch-by-batch without ever
materializing a partition as one object.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container,
so the decode kernels are STUBBED: `decode_image` raises
NotImplementedError unless `fake=True`, in which case a deterministic
fake decoder (seeded from the content hash) produces stable
"features" — the Spark-side plumbing (schema, batching, partitioning,
UDF signatures) is real and tested either way.
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


def _fake_feature(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: dim floats
    derived from sha256(payload) — stable across runs/partitions."""
    h = hashlib.sha256(payload or b"").digest()
    return [((h[i % 32] / 255.0) * 2.0 - 1.0) for i in range(dim)]


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """STUB: real impl would be PIL.Image.open + resize + normalize.
    The image libraries are not available in this environment."""
    if fake:
        return _fake_feature(payload)
    raise NotImplementedError(
        "image decoding requires PIL/opencv — not in this container; "
        "pass fake=True for deterministic plumbing tests"
    )


def extract_image_features(
    media: DataFrame, dim: int = 16, fake: bool = True, batch_limit: int = 1024
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
                        feats.append(decode_image(payload, fake=fake)[:dim])
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
