"""Multimodal column support: opaque binary payloads + typed metadata.

Pattern (BASELINE.json north star): image/audio/video content lives in an
opaque ``binary`` column with a typed metadata struct alongside; decode /
feature-extract / resize / frame-sample are Arrow-batched pandas functions
over ``mapInPandas``. The decode libraries (PIL/ffmpeg/torchaudio) are not in
this environment, so the decode step is STUBBED: ``fake_decode`` derives
deterministic pseudo-metadata from the payload hash (real Spark plumbing —
schema, batching, partitioning — with a fake kernel), and ``decode_image``
raises ``NotImplementedError`` until a codec is wired in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature_norm", T.DoubleType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", mime: str = "text/plain") -> DataFrame:
    """Materialize an opaque binary ``payload`` column + ``meta`` struct
    (byte_len, content_sha256, mime) — all JVM-side."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.length(F.col("payload")).cast("long").alias("byte_len"),
            F.sha2(F.col("payload"), 256).alias("content_sha256"),
            F.lit(mime).alias("mime"),
        ),
    )


def decode_image(payload: bytes) -> dict:
    """Real decoder slot — wire PIL/opencv here on a cluster image."""
    raise NotImplementedError("no image codec in this environment; use fake_decode for plumbing tests")


def fake_decode(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Deterministic stand-in decoder over ``mapInPandas``: metadata derived
    from the payload's md5 (stable across runs/engines). Batch shape and
    Arrow transfer are identical to a real decoder's."""
    id_name, payload_name = id_col, payload_col

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf[payload_name].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_name],
                    "width": digests.map(lambda h: 64 + int(h[0:2], 16)).astype("int32"),
                    "height": digests.map(lambda h: 64 + int(h[2:4], 16)).astype("int32"),
                    "n_frames": digests.map(lambda h: 1 + int(h[4:5], 16)).astype("int32"),
                    "feature_norm": digests.map(lambda h: round(int(h[5:9], 16) / 65535.0, 6)),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode_batches, DECODED_SCHEMA)


def frame_sample(df: DataFrame, every_nth: int = 2, id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling plumbing over decoded metadata: explode n_frames into
    frame indices, keep every Nth (JVM-side sequence/explode — the real
    per-frame decode would be a second mapInPandas over (payload, frame_idx))."""
    return (
        df.withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)))
        .filter(F.col("frame_idx") % every_nth == 0)
        .select(id_col, "frame_idx", "width", "height")
    )
