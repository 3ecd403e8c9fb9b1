"""Language-ID heuristic, quality features, and multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from mapreducefw_spark.operators import multimodal, text


def test_detect_language_markers(spark):
    rows = [
        (1, "the cat and the dog sat in the house"),
        (2, "der hund und die katze ist nicht ein problem"),
        (3, "el perro y la casa de que es un gato"),
        (4, "le chat et les chiens est une maison"),
        (5, "zzz qqq www"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {r.id: r.lang for r in df.select("id", text.detect_language("text").alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "es", 4: "fr", 5: "und"}


def test_quality_features(spark):
    df = spark.createDataFrame([(1, "a a a a"), (2, "w x y z")], "id int, text string")
    rows = {r.id: r for r in text.quality_features(df).collect()}
    assert rows[1].n_tokens == 4 and rows[1].type_token_ratio == 0.25
    assert rows[2].type_token_ratio == 1.0
    assert rows[1].avg_word_len == 1.0


def test_rolling_fingerprint_stable(spark):
    df = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten"),
         (2, "one two three four five six seven eight nine ten"),
         (3, "totally different content here with many other words now")],
        "id int, text string",
    )
    fps = {r.id: r.fp for r in df.select("id", text.rolling_fingerprint("text").alias("fp")).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    from mapreducefw_spark.queries._util import t

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    return multimodal.synthesize_media(docs).cache()


def test_media_schema_and_meta(media):
    assert dict(media.dtypes)["payload"] == "binary"
    row = media.orderBy("media_id").first()
    assert row.meta.n_bytes == len(bytes(row.payload))


def test_decode_stub_raises_without_fake(media):
    with pytest.raises(Exception) as ei:
        multimodal.decode_media(media, deterministic_fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "real media decoding" in str(ei.value)


def test_fake_decode_deterministic_features(media):
    a = multimodal.decode_media(media, deterministic_fake=True).orderBy("media_id").collect()
    b = multimodal.decode_media(media, deterministic_fake=True).orderBy("media_id").collect()
    assert [r.features for r in a] == [r.features for r in b]
    assert all(len(r.features) == multimodal.FEATURE_DIM for r in a)
    assert all(r.width >= 64 and r.height >= 64 for r in a)


def test_frame_sampling_one_to_n(media):
    frames = multimodal.sample_frames(media, n_frames=4)
    n_videos = media.filter(F.col("media_type") == "video").count()
    got = frames.groupBy("media_id").count().collect()
    assert len(got) == n_videos
    assert all(r["count"] == 4 for r in got)


def test_pii_counts_and_redaction(spark):
    rows = [
        (1, "mail me at jane.doe+spam@example.co.uk or call 555-123-4567"),
        (2, "server at 10.0.255.1 responded; backup 192.168.1.2 did not"),
        (3, "no pii here, just words and numbers like 12345"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {
        r.id: r
        for r in df.select(
            "id",
            *[c.alias(n) for n, c in text.pii_counts("text").items()],
            text.redact_pii("text").alias("red"),
        ).collect()
    }
    assert (out[1].n_email, out[1].n_phone, out[1].n_ip) == (1, 1, 0)
    assert "[EMAIL]" in out[1].red and "[PHONE]" in out[1].red
    assert "jane" not in out[1].red and "4567" not in out[1].red
    assert out[2].n_ip == 2 and out[2].red.count("[IP]") == 2
    assert (out[3].n_email, out[3].n_ip, out[3].n_phone) == (0, 0, 0)
    assert out[3].red == rows[2][1]


def test_bpe_pretokens(spark):
    df = spark.createDataFrame(
        [(1, "I can't stop... counting 123 tokens!")], "id int, text string"
    )
    [r] = df.select(text.bpe_pretokens("text").alias("tk")).collect()
    assert r.tk == [
        "I", " can", "'t", " stop", "...", " counting", " 123", " tokens", "!",
    ]


def test_ngram_contamination_finds_planted_overlap(spark):
    from mapreducefw_spark.operators.dedup import ngram_contamination

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(1, base + " extra tail words here"),      # shares many 5-grams
         (2, "totally unrelated words one two three four five six seven")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, base)], "doc_id long, text string")
    got = {
        (r.corpus_doc, r.bench_doc): r.n_shared
        for r in ngram_contamination(corpus, bench, n=5).collect()
    }
    assert got == {(1, 100): 6}  # 10-token overlap -> 6 shared 5-grams


# ------- round-12: real PNG/WAV header construction + parsing -------------


def _field_plan(doc_id: int) -> dict:
    """Pure-Python mirror of pipeline40.media_fields_frame."""
    return {
        "is_png": doc_id % 2 == 0,
        "width": 16 + (doc_id * 7) % 1024,
        "height": 16 + (doc_id * 13) % 768,
        "bit_depth": (1, 2, 4, 8, 16)[(doc_id % 10) // 2],
        "color_type": (0, 2, 3, 4, 6)[(doc_id // 10) % 5],
        "n_channels": 1 + (doc_id // 2) % 2,
        "sample_rate": (8000, 16000, 22050, 44100, 48000)[(doc_id % 10) // 2],
        "bits_per_sample": (8, 16, 24, 32)[(doc_id // 10) % 4],
        "data_bytes": 64 + doc_id % 256,
    }


def _ref_payload(doc_id: int) -> bytes:
    f = _field_plan(doc_id)
    if f["is_png"]:
        return multimodal.make_png_header_bytes(
            f["width"], f["height"], f["bit_depth"], f["color_type"]
        )
    return multimodal.make_wav_header_bytes(
        f["sample_rate"], f["n_channels"], f["bits_per_sample"], f["data_bytes"]
    )


def test_spark_built_media_bytes_identical_to_struct_pack(spark):
    """Closes the symmetric-bug loophole of the oracle comparison: the
    JVM-side hex-assembled payloads must be byte-identical to the stdlib
    struct.pack reference, so a wrong-endian/wrong-offset construction
    cannot cancel against a matching parse error."""
    from mapreducefw_spark.queries.pipeline40 import synthesize_media_files

    ids = [0, 1, 2, 3, 10, 11, 25, 36, 47, 58, 69, 123, 254, 255, 256, 511]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    got = {
        r.media_id: bytes(r.payload)
        for r in synthesize_media_files(docs).collect()
    }
    for i in ids:
        assert got[i] == _ref_payload(i), f"doc_id {i} bytes differ"


def test_stdlib_parsers_roundtrip_header_fields():
    for i in (0, 1, 2, 3, 10, 11, 123, 254, 255):
        f = _field_plan(i)
        payload = _ref_payload(i)
        if f["is_png"]:
            got = multimodal.parse_png_header(payload)
            assert got == {
                "width": f["width"],
                "height": f["height"],
                "bit_depth": f["bit_depth"],
                "color_type": f["color_type"],
                "crc_ok": True,
            }
            assert multimodal.parse_wav_header(payload) is None
        else:
            got = multimodal.parse_wav_header(payload)
            assert got["audio_format"] == 1
            assert got["n_channels"] == f["n_channels"]
            assert got["sample_rate"] == f["sample_rate"]
            assert got["bits_per_sample"] == f["bits_per_sample"]
            assert got["data_bytes"] == f["data_bytes"]
            assert multimodal.parse_png_header(payload) is None
    # corrupted CRC is detected, geometry still reads
    bad = bytearray(_ref_payload(0))
    bad[30] ^= 0xFF
    got = multimodal.parse_png_header(bytes(bad))
    assert got["crc_ok"] is False and got["width"] == _field_plan(0)["width"]


def test_wav_chunk_walk_handles_noncanonical_order():
    """The Python parser walks chunks, so a LIST chunk between fmt and
    data (common in real recorders' output) still parses."""
    import struct as _struct

    f = _field_plan(1)
    canonical = _ref_payload(1)
    fmt_chunk = canonical[12:36]  # "fmt " + size + 16 payload bytes
    data_chunk = canonical[36:]
    info = b"LIST" + _struct.pack("<I", 4) + b"INFO"
    body = fmt_chunk + info + data_chunk
    wonky = b"RIFF" + _struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    got = multimodal.parse_wav_header(wonky)
    assert got["sample_rate"] == f["sample_rate"]
    assert got["data_bytes"] == f["data_bytes"]


def test_decode_media_parses_real_headers_without_libs(spark):
    """r11 verdict order #5: NotImplementedError now covers ONLY full
    pixel/audio decode — real PNG/WAV payloads yield header metadata."""
    rows = [(i, "image" if i % 2 == 0 else "audio", _ref_payload(i)) for i in range(8)]
    df = spark.createDataFrame(rows, "media_id bigint, media_type string, payload binary")
    got = {r.media_id: r for r in multimodal.decode_media(df).collect()}
    for i in range(8):
        f = _field_plan(i)
        if f["is_png"]:
            assert got[i].width == f["width"] and got[i].height == f["height"]
            assert got[i].duration_ms is None and got[i].features is None
        else:
            byte_rate = f["sample_rate"] * f["n_channels"] * f["bits_per_sample"] // 8
            assert got[i].duration_ms == int(f["data_bytes"] * 1000.0 / byte_rate)
            assert got[i].width is None and got[i].features is None


# ------------------------------------------------- round 13: FULL decode


def test_png_full_decode_roundtrip_all_filters():
    """Every PNG filter type must reconstruct exactly: the encoder cycles
    filters per scanline ((seed + y) % 5), so any 5-row image crosses all
    of None/Sub/Up/Average/Paeth."""
    import random

    rng = random.Random(13)
    for trial in range(40):
        w, h = rng.randint(1, 24), rng.randint(5, 16)
        ct = rng.choice([0, 2])
        ch = 1 if ct == 0 else 3
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        payload = multimodal.make_png_bytes(w, h, ct, px, filter_seed=rng.randrange(5))
        got = multimodal.decode_png_pixels(payload)
        assert got is not None, trial
        assert (got["width"], got["height"], got["channels"]) == (w, h, ch)
        assert got["pixels"] == px, f"trial {trial}: pixel bytes differ"


def test_png_decode_concatenates_multiple_idat_chunks():
    px = bytes(range(3 * 4 * 3))  # 3x4 RGB
    payload = multimodal.make_png_bytes(3, 4, 2, px)
    # the encoder splits the zlib stream into two IDAT chunks by contract
    assert payload.count(b"IDAT") == 2
    assert multimodal.decode_png_pixels(payload)["pixels"] == px


def test_png_decode_rejects_unsupported_subset():
    # header-only PNG (no IDAT) and 16-bit depth fall outside the decode
    # subset -> None, never a wrong answer
    hdr_only = multimodal.make_png_header_bytes(8, 8, 8, 0)
    assert multimodal.decode_png_pixels(hdr_only) is None
    deep = multimodal.make_png_header_bytes(8, 8, 16, 0)
    assert multimodal.decode_png_pixels(deep) is None
    assert multimodal.decode_png_pixels(b"not a png") is None


def test_wav_full_decode_matches_stdlib_wave_module():
    """Cross-check against the stdlib ``wave`` module — an independent
    reference parser for the same bytes."""
    import io
    import struct as _struct
    import wave as _wave

    samples = [1, -2, 3, -4, 32767, -32768, 0, 12345]
    payload = multimodal.make_wav_bytes(16000, 2, samples)
    got = multimodal.decode_wav_samples(payload)
    assert got["samples"] == samples
    assert got["n_channels"] == 2 and got["sample_rate"] == 16000
    wf = _wave.open(io.BytesIO(payload))
    assert wf.getnchannels() == 2 and wf.getframerate() == 16000
    assert wf.readframes(wf.getnframes()) == _struct.pack("<8h", *samples)


def test_decode_checksum_frame_matches_pure_python(spark):
    """The registered query's per-media checksums equal a pure-Python
    fold over the formula values — end-to-end through encode, Arrow,
    decode."""
    from mapreducefw_spark.queries.pipeline49 import (
        build_media_payload,
        decode_checksum_frame,
        media_payload_frame,
    )

    ids = [0, 1, 2, 3, 4, 5, 10, 11, 47, 123, 254, 255]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    got = {
        r.media_id: r
        for r in decode_checksum_frame(media_payload_frame(docs)).collect()
    }
    assert set(got) == set(ids)
    for mid in ids:
        if mid % 2 == 0:
            dec = multimodal.decode_png_pixels(build_media_payload(mid))
            vals = list(dec["pixels"])
            w, h = 4 + mid % 13, 3 + mid % 7
            ch = 1 if mid % 4 == 0 else 3
            expect = [
                (mid * 7 + y * 31 + i * 13) % 256
                for y in range(h)
                for i in range(w * ch)
            ]
            assert got[mid].kind == "png"
        else:
            dec = multimodal.decode_wav_samples(build_media_payload(mid))
            vals = dec["samples"]
            nch, frames = 1 + (mid // 2) % 2, 8 + mid % 17
            expect = [
                ((mid * 2557 + k * 97) % 65536) - 32768
                for k in range(frames * nch)
            ]
            assert got[mid].kind == "wav"
        assert vals == expect, f"media {mid}: decoded values != formula"
        assert got[mid].n_values == len(expect)
        assert got[mid].value_sum == sum(expect)
        assert got[mid].value_min == min(expect)
        assert got[mid].value_max == max(expect)


def test_decode_checksums_empty_and_null_ids(spark):
    from mapreducefw_spark.queries.pipeline49 import (
        decode_checksum_frame,
        media_payload_frame,
    )

    empty = spark.createDataFrame([], "doc_id bigint")
    assert decode_checksum_frame(media_payload_frame(empty)).count() == 0
    nulls = spark.createDataFrame([(None,), (-3,), (4,)], "doc_id bigint")
    out = decode_checksum_frame(media_payload_frame(nulls)).collect()
    assert [r.media_id for r in out] == [4]  # NULL and negative ids drop
