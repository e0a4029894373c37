"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride along as ``binary`` columns with a metadata
struct; decode / feature-extraction run as Arrow-batched pandas
transforms over ``mapInPandas``. The decode libraries (PIL/ffmpeg/...)
are not present in this container, so the decode step is STUBBED with a
deterministic fake featurizer — the Spark-side plumbing (schema,
batching, partitioning, UDF signatures) is real and tested; swap
``_fake_decode`` for a real decoder in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("mime", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ])),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media table from the documents table: payload = utf-8 bytes
    of the text (a stand-in for real image/audio bytes), metadata derived
    deterministically. Demonstrates the schema and partitioning story."""
    payload = F.encode(F.col(text_col), "utf-8")
    n_bytes = F.length(payload).cast("long")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            n_bytes.alias("n_bytes"),
            (F.pmod(F.crc32(payload), F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(F.crc32(F.reverse(F.col(text_col))), F.lit(1080)) + 1).cast("int").alias("height"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for image/audio decode+embed. Real decoders
    (PIL, torchaudio, ffmpeg) are unavailable in this container."""
    acc, feats = 0, []
    for i, b in enumerate(payload[:64]):
        acc = (acc * 31 + b) & 0x7FFFFFFF
        feats.append(float(acc % 1000) / 1000.0)
    feats.extend([0.0] * (64 - len(feats)))
    return feats


def extract_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Feature extraction over Arrow batches. ``real_decode=True`` raises
    NotImplementedError (decode libs absent) — the gate is explicit."""
    if real_decode:
        raise NotImplementedError("image/audio decode libraries not available in this container")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "mime": [m["mime"] for m in pdf["meta"]],
                "n_bytes": [int(m["n_bytes"]) for m in pdf["meta"]],
                # md5-based digest (first 60 bits): the one payload hash
                # both Spark and DuckDB can reproduce bit-identically
                "checksum": [int(hashlib.md5(bytes(p)).hexdigest()[:15], 16)
                             for p in pdf["payload"]],
                "feature": [_fake_decode(p) for p in pdf["payload"]],
            })
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def frame_sample(media: DataFrame, every_n: int = 10, max_frames: int = 8) -> DataFrame:
    """Video frame sampling plumbing: one input row fans out to its
    sampled frames (row explosion INSIDE mapInPandas, so a long video
    never materializes all frames at once — batches stay Arrow-sized).
    The frame decode is stubbed (no ffmpeg here): frames are fixed-size
    byte slices of the payload standing in for decoded frames; the
    sampling arithmetic, fan-out shape, and schema are real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(len(payload) // 16, 1)  # stub: 16 bytes = one "frame"
                sampled = list(range(0, n_frames, every_n))[:max_frames]
                for fi in sampled:
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(bytes(payload[fi * 16:(fi + 1) * 16]))
            yield pd.DataFrame({"doc_id": ids, "frame_index": idxs, "frame": frames})

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_stub(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize plumbing: passes payloads through a pandas batch stage
    that would call the decoder; gated explicitly (libs absent)."""
    raise NotImplementedError(
        "image decode/resize libraries (PIL/opencv) not available in this container; "
        "plumbing shape mirrors extract_features/frame_sample"
    )
