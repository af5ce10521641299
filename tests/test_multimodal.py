"""Multimodal plumbing: REAL container-header metadata parsing
(PNG IHDR / JPEG SOFn / GIF LSD / WAV RIFF) + the numpy-vectorized
stand-in feature.  Codec decode stays honestly stubbed."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aus_land_data_etl_spark.operators.multimodal import (
    _fake_feature,
    decode_media,
    extract_media_features,
    media_meta,
    parse_media_meta_bytes,
    synth_media_bytes,
)


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 4, 17, 640, 999, 123456])
def test_header_roundtrip_pure_python(doc_id):
    payload, fmt, w, h, dur = synth_media_bytes(doc_id)
    mt, pfmt, pw, ph, pdur = parse_media_meta_bytes(payload)
    assert pfmt == fmt
    assert (pw, ph, pdur) == (w, h, dur)
    assert mt == ("audio" if fmt == "wav" else "image")


def test_parser_reads_real_world_header_shapes():
    """Hand-built headers with values the synthesizer never emits —
    guards against a parser that inverts synth_media_bytes instead of
    reading the spec'd offsets."""
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", 65535, 3)
        + b"\x10\x06\x00\x00\x01"
        + b"\xde\xad\xbe\xef"
    )
    assert parse_media_meta_bytes(png) == ("image", "png", 65535, 3, None)
    # JPEG with a COM segment and a progressive SOF2 before any SOF0
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
    sof2 = (
        b"\xff\xc2"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", 10, 20)
        + b"\x01\x11\x00"
    )
    assert parse_media_meta_bytes(b"\xff\xd8" + com + sof2) == (
        "image", "jpeg", 20, 10, None,
    )
    gif87 = b"GIF87a" + struct.pack("<HH", 2, 40000) + b"\x00\x00\x00"
    assert parse_media_meta_bytes(gif87) == ("image", "gif", 2, 40000, None)
    # WAV with a LIST chunk between fmt and data; odd data size (word
    # alignment padding); 44.1 kHz stereo 16-bit
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"LIST" + struct.pack("<I", 5) + b"INFOX" + b"\x00"  # pad
    body += b"data" + struct.pack("<I", 176400) + b"\x00" * 176400
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    assert parse_media_meta_bytes(wav) == ("audio", "wav", None, None, 1000)


@pytest.mark.parametrize(
    "junk",
    [
        None,
        b"",
        b"\x00" * 11,
        b"not a media file at all........",
        b"\x89PNG\r\n\x1a\nTRUNC",  # PNG sig, truncated IHDR
        b"\xff\xd8\xff",  # JPEG SOI then garbage
        b"RIFF\x04\x00\x00\x00WAVE",  # WAVE with no chunks
        b"GIF89a",  # GIF magic only (no LSD) — under min length
    ],
)
def test_parser_never_throws_on_garbage(junk):
    mt, fmt, w, h, dur = parse_media_meta_bytes(junk)
    assert w is None and h is None and dur is None
    assert (mt, fmt) in {(None, None), ("audio", "wav")}


def test_media_meta_sparkside(spark):
    rows = [(i, synth_media_bytes(i)[0]) for i in range(16)]
    rows.append((99, b"garbage bytes here"))
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )
    got = {
        r["doc_id"]: r["media_meta"].asDict()
        for r in media_meta(df).collect()
    }
    for i in range(16):
        _, fmt, w, h, dur = synth_media_bytes(i)
        m = got[i]
        assert m["format"] == fmt
        assert (m["width"], m["height"], m["duration_ms"]) == (w, h, dur)
    assert got[99]["format"] is None


def test_fake_feature_matches_reference_loop():
    """The numpy reshape-sum must reproduce the original per-byte loop
    exactly (it is the documented swap-in point for a real codec)."""

    def loop_impl(payload, dim=8):
        if payload is None or len(payload) == 0:
            return [0.0] * dim
        acc = [0] * dim
        for i, b in enumerate(payload):
            acc[i % dim] += b
        n = len(payload)
        return [round(a / n, 6) for a in acc]

    cases = [
        b"",
        b"a",
        b"abcdefgh",
        b"abcdefghi",  # non-multiple of dim
        bytes(range(256)) * 7 + b"xyz",
        synth_media_bytes(12345)[0],
    ]
    for c in cases:
        for dim in (3, 8):
            assert _fake_feature(c, dim) == loop_impl(c, dim), (len(c), dim)
    assert _fake_feature(None) == [0.0] * 8


def test_extract_media_features_sparkside(spark):
    df = spark.createDataFrame(
        [(1, b"abcdefgh", "image"), (2, None, "audio")],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
                T.StructField("media_type", T.StringType()),
            ]
        ),
    )
    got = {r["doc_id"]: r for r in extract_media_features(df).collect()}
    assert got[1]["n_bytes"] == 8
    assert got[1]["feature"] == [pytest.approx(x) for x in _fake_feature(b"abcdefgh")]
    assert got[2]["n_bytes"] == 0
    assert got[2]["feature"] == [0.0] * 8


def test_decode_media_is_honestly_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG\r\n\x1a\n")
