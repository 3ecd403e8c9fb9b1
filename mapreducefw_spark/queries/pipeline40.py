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


# ------------------- ANSI MERGE (round-12, batch 2) ------------------------


@register(
    "merge_into_orders_upsert",
    oracle="""
WITH tgt AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
  FROM orders
),
src AS (
  SELECT o_orderkey, 'U' AS op, o_totalprice + 1000 AS new_price
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey, 'D' AS op, CAST(NULL AS DOUBLE) AS new_price
  FROM orders WHERE o_orderkey % 11 = 0 AND o_orderkey % 7 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, 'I' AS op, 99999.0 + (o_orderkey % 100)
  FROM orders WHERE o_orderkey % 13 = 0
),
j AS (
  SELECT t.o_orderkey AS t_key, t.o_custkey, t.o_orderstatus, t.o_totalprice,
         t.o_orderpriority, s.o_orderkey AS s_key, s.op, s.new_price
  FROM tgt t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey
)
SELECT COALESCE(t_key, s_key) AS o_orderkey,
       CASE WHEN t_key IS NULL THEN -1 ELSE o_custkey END AS o_custkey,
       CASE WHEN t_key IS NULL THEN 'N'
            WHEN s_key IS NOT NULL AND op = 'U' AND o_totalprice < 200000
              THEN 'M'
            ELSE o_orderstatus END AS o_orderstatus,
       CASE WHEN t_key IS NULL THEN new_price
            WHEN s_key IS NOT NULL AND op = 'U' AND o_totalprice < 200000
              THEN new_price
            ELSE o_totalprice END AS o_totalprice,
       CASE WHEN t_key IS NULL THEN '5-LOW'
            WHEN s_key IS NOT NULL AND op = 'U' AND o_totalprice >= 200000
              THEN '9-MERGED'
            WHEN s_key IS NULL AND o_orderstatus = 'F' AND t_key % 10 = 3
              THEN 'X-STALE'
            ELSE o_orderpriority END AS o_orderpriority
FROM j
WHERE NOT (t_key IS NOT NULL AND s_key IS NOT NULL AND op = 'D')
  AND NOT (t_key IS NULL AND op <> 'I')
ORDER BY o_orderkey
""",
)
def merge_into_orders_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI MERGE over the orders snapshot (operators/merge.py), all three
    clause families + first-true-wins dispatch + the SQLSTATE-21000
    cardinality guard live in the plan:

      MERGE INTO orders t USING changes s ON t.o_orderkey = s.o_orderkey
      WHEN MATCHED AND s.op = 'D' THEN DELETE
      WHEN MATCHED AND s.op = 'U' AND t.o_totalprice < 200000
        THEN UPDATE SET o_totalprice = s.new_price, o_orderstatus = 'M'
      WHEN MATCHED THEN UPDATE SET o_orderpriority = '9-MERGED'
      WHEN NOT MATCHED AND s.op = 'I' THEN INSERT
        (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority)
        VALUES (s.o_orderkey, -1, 'N', s.new_price, '5-LOW')
      WHEN NOT MATCHED BY SOURCE AND t.o_orderstatus = 'F'
        AND t.o_orderkey % 10 = 3 THEN UPDATE SET o_orderpriority = 'X-STALE'

    The change set is synthesized deterministically from orders (%7 ->
    updates, %11 -> deletes, %13 -> inserts at shifted keys), so the
    DuckDB oracle replays the merge as an explicit FULL OUTER JOIN + CASE
    dispatch. Scale: ONE full-outer sort-merge join on the key = one scan
    of each side; clause dispatch is pure projection (codegen); the
    cardinality guard windows over the GB-scale source only."""
    from mapreducefw_spark.operators.merge import (
        merge_into,
        when_matched_delete,
        when_matched_update,
        when_not_matched_by_source_update,
        when_not_matched_insert,
    )

    orders = t(spark, sf_dir, "orders")
    tgt = orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    src = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            F.lit("U").alias("op"),
            (F.col("o_totalprice") + 1000).alias("new_price"),
        )
        .unionByName(
            orders.filter(
                (F.col("o_orderkey") % 11 == 0) & (F.col("o_orderkey") % 7 != 0)
            ).select(
                "o_orderkey",
                F.lit("D").alias("op"),
                F.lit(None).cast("double").alias("new_price"),
            )
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 13 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                F.lit("I").alias("op"),
                (F.lit(99999.0) + F.col("o_orderkey") % 100).alias("new_price"),
            )
        )
    )
    merged = merge_into(
        tgt,
        src,
        ["o_orderkey"],
        matched=[
            when_matched_delete(F.col("s.op") == "D"),
            when_matched_update(
                {
                    "o_totalprice": F.col("s.new_price"),
                    "o_orderstatus": F.lit("M"),
                },
                (F.col("s.op") == "U") & (F.col("t.o_totalprice") < 200000),
            ),
            when_matched_update({"o_orderpriority": F.lit("9-MERGED")}),
        ],
        not_matched=[
            when_not_matched_insert(
                {
                    "o_orderkey": F.col("s.o_orderkey"),
                    "o_custkey": F.lit(-1).cast("bigint"),
                    "o_orderstatus": F.lit("N"),
                    "o_totalprice": F.col("s.new_price"),
                    "o_orderpriority": F.lit("5-LOW"),
                },
                F.col("s.op") == "I",
            )
        ],
        not_matched_by_source=[
            when_not_matched_by_source_update(
                {"o_orderpriority": F.lit("X-STALE")},
                (F.col("t.o_orderstatus") == "F")
                & (F.col("t.o_orderkey") % 10 == 3),
            )
        ],
    )
    return merged.orderBy("o_orderkey")
