"""Multimodal column plumbing (SURVEY §7 M4): image/audio/video as opaque
``binary`` payloads with typed metadata structs.

The container has no image/audio libraries, so the actual byte decoding is
stubbed: ``decode_media`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, in which case it derives metadata and a
fixed-size feature vector from the bytes alone (stable across runs). The
Spark-side plumbing — schema, Arrow batch shape, ``mapInPandas`` 1->N frame
sampling, partitioning — is real and tested; swapping in PIL/librosa later
only changes the inner pure function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_TYPES = ("image", "audio", "video")

MEDIA_SCHEMA = (
    "media_id bigint, media_type string, payload binary, "
    "meta struct<n_bytes: bigint, magic: string>"
)

FEATURE_DIM = 16


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Build a deterministic media table from the documents fixture: payload
    is the utf-8 text bytes, media_type cycles by id. Stands in for
    spark.read.format('binaryFile') over an object store."""
    payload = F.encode("text", "UTF-8")
    mtype = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mtype.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
            F.upper(F.hex(F.encode(F.substring("text", 1, 2), "UTF-8"))).alias("magic"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real decoder (PIL/librosa not installed)."""
    digest = hashlib.sha256(payload).digest()
    return {
        "width": 64 + digest[0] % 512,
        "height": 64 + digest[1] % 512,
        "duration_ms": int.from_bytes(digest[2:4], "big"),
    }


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    digest = hashlib.sha256(b"feat" + payload).digest()
    return [round(b / 255.0, 6) for b in digest[:dim]]


def decode_media(df: DataFrame, *, deterministic_fake: bool = False) -> DataFrame:
    """Decode payload -> typed metadata + feature vector via mapInPandas.

    Real decoding requires PIL/librosa (absent here): pass
    deterministic_fake=True for the byte-derived stand-in, otherwise this
    raises NotImplementedError at plan execution.
    """
    out_schema = (
        "media_id bigint, media_type string, width int, height int, "
        f"duration_ms bigint, features array<double>"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real media decoding needs PIL/librosa; run with deterministic_fake=True"
                )
            metas = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "duration_ms": [m["duration_ms"] for m in metas],
                    "features": [_fake_features(bytes(p)) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(batches, schema=out_schema)


def sample_frames(df: DataFrame, *, n_frames: int = 4) -> DataFrame:
    """1->N frame sampling for video rows via mapInPandas (flat map): each
    video yields n_frames rows with a frame index and a byte-slice 'frame'."""
    out_schema = "media_id bigint, frame_idx int, frame binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vids = pdf[pdf["media_type"] == "video"]
            if vids.empty:
                yield pd.DataFrame({"media_id": [], "frame_idx": [], "frame": []})
                continue
            rows = []
            for mid, payload in zip(vids["media_id"], vids["payload"]):
                data = bytes(payload)
                step = max(len(data) // n_frames, 1)
                for i in range(n_frames):
                    rows.append((mid, i, data[i * step : (i + 1) * step]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return df.mapInPandas(batches, schema=out_schema)
