"""Round-12 registrations, batch 1: real multimodal header metadata.

``multimodal_metadata`` closes the long-standing multimodal partial
(r11 verdict order #5) without PIL/librosa: PNG IHDR and RIFF/WAVE
headers are fixed-layout byte structures, so their metadata fields —
the part of "decode" a catalog/curation pipeline actually needs — parse
with pure byte arithmetic. The query synthesizes a deterministic media
table from the documents fixture (REAL container bytes: PNG signature +
IHDR with a true CRC32 + IEND for even doc_ids, canonical RIFF/WAVE PCM
for odd), then recovers every field BY PARSING THE BYTES JVM-side
(substr + hex + conv + crc32 inside whole-stage codegen — see
operators/multimodal.py::parse_media_headers). The DuckDB oracle
re-derives the same fields arithmetically from doc_id, so any
construction/parse asymmetry (endianness, offsets, chunk sizes, CRC
range) surfaces as a value mismatch; the construction itself is pinned
byte-identical to stdlib struct.pack forms in tests/test_text_multimodal.py,
closing the symmetric-bug loophole.

Scale posture (100 TB of real media): header parsing reads a fixed
~45-byte prefix per row — with parquet/binaryFile sources this is a
map-only projection, no shuffle, no Python. The full-decode path
(pixels/samples) remains NotImplementedError until the media libraries
exist; see operators/multimodal.py::decode_media.

Semantic contract with the reference engine: a map-only job (emit2 per
record with no reduce phase) — `/root/reference/MapReduceClient.h:49`,
the SearchMRC projection shape `SearchMRC.cpp:78-98`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t

# deterministic field derivations (arithmetic on doc_id, replicated in SQL):
# even doc_id -> PNG, odd -> WAV
_BIT_DEPTHS = (1, 2, 4, 8, 16)
_COLOR_TYPES = (0, 2, 3, 4, 6)
_SAMPLE_RATES = (8000, 16000, 22050, 44100, 48000)
_BITS_PER_SAMPLE = (8, 16, 24, 32)


def media_fields_frame(docs: DataFrame) -> DataFrame:
    """(media_id, is_png, width, height, bit_depth, color_type,
    n_channels, sample_rate, bits_per_sample, data_bytes): the
    deterministic header-field plan for the synthetic media table."""
    did = F.col("doc_id")
    pick = lambda vals, idx: F.element_at(  # noqa: E731
        F.array(*[F.lit(v) for v in vals]), (idx + 1).cast("int")
    )
    return docs.select(
        did.alias("media_id"),
        (did % 2 == 0).alias("is_png"),
        (F.lit(16) + (did * 7) % 1024).cast("bigint").alias("width"),
        (F.lit(16) + (did * 13) % 768).cast("bigint").alias("height"),
        pick(_BIT_DEPTHS, F.floor((did % 10) / 2)).cast("bigint").alias("bit_depth"),
        pick(_COLOR_TYPES, F.floor(did / 10) % 5).cast("bigint").alias("color_type"),
        (F.lit(1) + F.floor(did / 2) % 2).cast("bigint").alias("n_channels"),
        pick(_SAMPLE_RATES, F.floor((did % 10) / 2)).cast("bigint").alias("sample_rate"),
        pick(_BITS_PER_SAMPLE, F.floor(did / 10) % 4)
        .cast("bigint")
        .alias("bits_per_sample"),
        (F.lit(64) + did % 256).cast("bigint").alias("data_bytes"),
    )


def synthesize_media_files(docs: DataFrame) -> DataFrame:
    """(media_id, payload): REAL PNG header bytes for even ids, REAL
    canonical WAV bytes for odd — built JVM-side (hex assembly + unhex +
    crc32), byte-identical to the struct.pack forms (pytest-pinned)."""
    from mapreducefw_spark.operators.multimodal import (
        png_payload_col,
        wav_payload_col,
    )

    f = media_fields_frame(docs)
    payload = F.when(
        F.col("is_png"),
        png_payload_col(
            F.col("width"), F.col("height"), F.col("bit_depth"), F.col("color_type")
        ),
    ).otherwise(
        wav_payload_col(
            F.col("sample_rate"),
            F.col("n_channels"),
            F.col("bits_per_sample"),
            F.col("data_bytes"),
        )
    )
    return f.select("media_id", payload.alias("payload"))


@register(
    "multimodal_metadata",
    oracle=f"""
WITH fields AS (
  SELECT doc_id AS media_id,
         doc_id % 2 = 0 AS is_png,
         CAST(16 + (doc_id * 7) % 1024 AS BIGINT) AS width,
         CAST(16 + (doc_id * 13) % 768 AS BIGINT) AS height,
         CAST(list_extract({list(_BIT_DEPTHS)},
              CAST((doc_id % 10) // 2 AS INTEGER) + 1) AS BIGINT) AS bit_depth,
         CAST(list_extract({list(_COLOR_TYPES)},
              CAST((doc_id // 10) % 5 AS INTEGER) + 1) AS BIGINT) AS color_type,
         CAST(1 + (doc_id // 2) % 2 AS BIGINT) AS n_channels,
         CAST(list_extract({list(_SAMPLE_RATES)},
              CAST((doc_id % 10) // 2 AS INTEGER) + 1) AS BIGINT) AS sample_rate,
         CAST(list_extract({list(_BITS_PER_SAMPLE)},
              CAST((doc_id // 10) % 4 AS INTEGER) + 1) AS BIGINT) AS bits_per_sample,
         CAST(64 + doc_id % 256 AS BIGINT) AS data_bytes
  FROM documents
)
SELECT media_id,
       CASE WHEN is_png THEN 'png' ELSE 'wav' END AS kind,
       CASE WHEN is_png THEN CAST(45 AS BIGINT)
            ELSE 44 + data_bytes END AS n_bytes,
       CASE WHEN is_png THEN width END AS width,
       CASE WHEN is_png THEN height END AS height,
       CASE WHEN is_png THEN bit_depth END AS bit_depth,
       CASE WHEN is_png THEN color_type END AS color_type,
       CASE WHEN is_png THEN TRUE END AS crc_ok,
       CASE WHEN NOT is_png THEN n_channels END AS n_channels,
       CASE WHEN NOT is_png THEN sample_rate END AS sample_rate,
       CASE WHEN NOT is_png THEN bits_per_sample END AS bits_per_sample,
       CASE WHEN NOT is_png THEN data_bytes END AS data_bytes,
       CASE WHEN NOT is_png THEN
         ROUND(data_bytes * 1000.0
               / (sample_rate * n_channels * (bits_per_sample // 8)), 6)
       END AS duration_ms
FROM fields
ORDER BY media_id
""",
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata for a binary media column WITHOUT media libraries:
    build real PNG/WAV bytes from the documents fixture, then parse every
    field back out of the bytes JVM-side (parse_media_headers). The
    oracle re-derives the fields arithmetically from doc_id — a
    construction/parse asymmetry in either direction diverges. Map-only,
    no shuffle (the ORDER BY is presentation); ~45-byte prefix reads per
    row at 100 TB."""
    from mapreducefw_spark.operators.multimodal import parse_media_headers

    media = synthesize_media_files(t(spark, sf_dir, "documents"))
    parsed = parse_media_headers(media)
    return parsed.select(
        "media_id",
        "kind",
        "n_bytes",
        "width",
        "height",
        "bit_depth",
        "color_type",
        "crc_ok",
        "n_channels",
        "sample_rate",
        "bits_per_sample",
        F.when(F.col("kind") == "wav", F.col("data_bytes")).alias("data_bytes"),
        "duration_ms",
    ).orderBy("media_id")
