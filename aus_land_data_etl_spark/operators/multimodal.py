"""Multimodal (image/audio/video) column plumbing.

Binary payloads ride as opaque ``binary`` columns with a typed metadata
struct — the same pattern the engine uses for ``html`` (and the reference
used for PostGIS geometry blobs, SURVEY.md §1.1; its typed geometry
metadata analog is /root/reference/lib/pipeline/gis/ingestion.py:196-243).

Two tiers, honestly separated:

- **Container-header metadata is REAL.**  ``parse_media_meta_bytes``
  reads the published container headers — PNG IHDR, JPEG SOFn, GIF
  logical screen descriptor, WAV RIFF ``fmt ``/``data`` — in pure
  Python (zero codec deps), vectorized over Arrow batches by
  ``media_meta``.  Width/height/duration in ``MEDIA_META_SCHEMA`` are
  actually parsed from bytes, value-checked against header-correct
  synthesized fixtures (``synth_media_bytes``) by the
  ``multimodal_meta`` driver oracle.
- **Pixel/sample DECODE is stubbed.**  No image/audio libraries are
  baked into this container, so ``decode_media`` raises and the feature
  vector is a clearly-labelled deterministic fake (numpy-vectorized
  byte-histogram) — shaped like a real embedding so downstream ANN /
  dedup operators run unchanged, swappable for a codec call without
  touching the plumbing.

At scale: binaries stay columnar in parquet; ``spark.sql.files.
maxPartitionBytes`` bounds task input; header parsing + feature
extraction are embarrassingly parallel (no shuffle) and emit small typed
columns, so downstream joins/aggs never touch the blobs (column pruning
drops them at the scan).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried next to every media payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # png|jpg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: JPEG start-of-frame markers (C0–CF minus C4/C8/CC which are not SOF).
_JPEG_SOF = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}


def parse_media_meta_bytes(
    b: bytes | None,
) -> tuple[str | None, str | None, int | None, int | None, int | None]:
    """(media_type, format, width, height, duration_ms) from container
    headers — pure Python, zero codec deps, published formats only:

    - PNG: 8-byte signature, then the IHDR chunk's big-endian
      width/height at byte offsets 16/20 (PNG spec §11.2.2).
    - JPEG: walk the marker segments from SOI to the first SOFn
      (FFC0–FFCF except C4/C8/CC); height/width are big-endian at
      offsets 3/5 into the segment payload (ITU T.81 §B.2.2).
    - GIF: "GIF87a"/"GIF89a", then the logical screen descriptor's
      little-endian width/height (GIF89a spec §18).
    - WAV: RIFF/WAVE, walk chunks for "fmt " (byte_rate at offset 8,
      little-endian) and "data" (size); duration_ms =
      data_size * 1000 // byte_rate (RIFF WAVE spec).

    Unknown/truncated/corrupt payloads return all-NULL — metadata
    extraction over crawl data must never throw on a bad blob.
    """
    none = (None, None, None, None, None)
    if not b or len(b) < 12:
        return none
    try:
        if b.startswith(_PNG_SIG):
            if len(b) < 24 or b[12:16] != b"IHDR":
                return none
            w, h = struct.unpack_from(">II", b, 16)
            return ("image", "png", w, h, None)
        if b[:2] == b"\xff\xd8":  # JPEG SOI
            pos = 2
            while pos + 4 <= len(b):
                if b[pos] != 0xFF:
                    return none
                marker = b[pos + 1]
                if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                    pos += 2  # standalone markers carry no length
                    continue
                if pos + 4 > len(b):
                    return none
                seg_len = struct.unpack_from(">H", b, pos + 2)[0]
                if marker in _JPEG_SOF:
                    if pos + 9 > len(b):
                        return none
                    h, w = struct.unpack_from(">HH", b, pos + 5)
                    return ("image", "jpeg", w, h, None)
                pos += 2 + seg_len
            return none
        if b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack_from("<HH", b, 6)
            return ("image", "gif", w, h, None)
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            pos, byte_rate, data_size = 12, None, None
            while pos + 8 <= len(b):
                cid = b[pos : pos + 4]
                csize = struct.unpack_from("<I", b, pos + 4)[0]
                if cid == b"fmt " and pos + 20 <= len(b):
                    byte_rate = struct.unpack_from("<I", b, pos + 16)[0]
                elif cid == b"data":
                    data_size = csize
                pos += 8 + csize + (csize & 1)  # chunks are word-aligned
            if byte_rate and data_size is not None:
                return (
                    "audio", "wav", None, None, data_size * 1000 // byte_rate
                )
            return ("audio", "wav", None, None, None)
    except (struct.error, IndexError):
        return none
    return none


def media_meta(
    df: DataFrame, payload_col: str = "payload", out_col: str = "media_meta"
) -> DataFrame:
    """Attach the parsed ``MEDIA_META_SCHEMA`` struct — Arrow-batched
    mapInPandas over the payload bytes (header reads only: no decode)."""
    cols = df.columns
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, MEDIA_META_SCHEMA)]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_media_meta_bytes(b) for b in pdf[payload_col]]
            meta = pd.DataFrame(
                parsed,
                columns=[
                    "media_type", "format", "width", "height", "duration_ms"
                ],
                index=pdf.index,
            )
            out = pdf.copy()
            out[out_col] = meta.to_dict("records")
            yield out

    return df.mapInPandas(op, schema=out_schema).select(
        *cols, F.col(out_col)
    )


def synth_media_bytes(
    doc_id: int,
) -> tuple[bytes, str, int | None, int | None, int | None]:
    """Deterministic header-correct fixture: (payload, format, width,
    height, duration_ms) as a pure function of ``doc_id``.

    Real container headers with tiny/empty bodies — enough for the
    header parser to be value-checked end-to-end (the ``multimodal_meta``
    driver oracle recomputes the same arithmetic in SQL, so a fake
    parser cannot pass).
    """
    kind = doc_id % 4
    if kind == 0:  # PNG
        w, h = 1 + doc_id % 1000, 1 + doc_id % 777
        ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
        payload = (
            _PNG_SIG
            + struct.pack(">I", 13)
            + b"IHDR"
            + ihdr
            + b"\x00\x00\x00\x00"  # CRC not validated by header parse
        )
        return payload, "png", w, h, None
    if kind == 1:  # JPEG: SOI + APP0 + SOF0
        w, h = 1 + doc_id % 640, 1 + doc_id % 480
        # segment length includes its own 2 bytes: APP0 = 2 + 14 payload
        # (identifier 5 + version 2 + units 1 + density 4 + thumb 2);
        # SOF0 = 2 + precision 1 + h 2 + w 2 + ncomp 1 + 3/component
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        sof = (
            b"\xff\xc0"
            + struct.pack(">H", 11)
            + b"\x08"
            + struct.pack(">HH", h, w)
            + b"\x01"
            + b"\x01\x11\x00"
        )
        return b"\xff\xd8" + app0 + sof, "jpeg", w, h, None
    if kind == 2:  # GIF89a
        w, h = 1 + doc_id % 320, 1 + doc_id % 200
        payload = b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"
        return payload, "gif", w, h, None
    # WAV: PCM mono/stereo 16-bit, empty data chunk sized by doc_id
    channels = 1 + doc_id % 2
    rate = 8000 * (1 + doc_id % 3)
    block = channels * 2
    byte_rate = rate * block
    n_frames = 100 + doc_id % 900
    data_size = n_frames * block
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate, block, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", data_size) + b"\x00" * data_size
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    return payload, "wav", None, None, data_size * 1000 // byte_rate


def decode_media(payload: bytes) -> object:
    """Real codec decode — NOT available in this container.

    On a cluster with Pillow/torchaudio/av installed this dispatches on the
    container format; here it is an explicit stub so nothing silently
    pretends to decode pixels.
    """
    raise NotImplementedError(
        "media codecs are not installed in this environment; "
        "extract_media_features uses the deterministic fake instead"
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: byte-histogram moments.

    Pure function of the bytes → replay-stable; shaped like a real
    embedding so downstream operators (ANN, dedup) run unchanged.
    """
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    arr = np.frombuffer(payload, dtype=np.uint8)
    n = arr.size
    pad = (-n) % dim
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
    # strided accumulation acc[i % dim] += b, vectorized: reshape to
    # (n_strides, dim) and sum columns (int64 — exact)
    acc = arr.reshape(-1, dim).sum(axis=0, dtype=np.int64)
    return [round(float(a) / n, 6) for a in acc]


def extract_media_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    media_type_col: str = "media_type",
    dim: int = 8,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Batch shape: iterator of pandas DataFrames (Arrow record batches);
    output one feature row per input row.  Swap ``_fake_feature`` for the
    codec call on a real cluster — the plumbing does not change.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": pdf[media_type_col],
                    "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)),
                    "content_hash": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": payloads.map(lambda b: _fake_feature(b, dim)),
                }
            )

    return df.select(id_col, media_type_col, payload_col).mapInPandas(
        op, schema=FEATURE_SCHEMA
    )


def sample_frames(
    df: DataFrame,
    every_n_ms: int = 1000,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp.

    The frame *positions* are computed JVM-side (sequence + explode);
    only the (stubbed) per-frame decode would touch the payload.
    """
    positions = F.sequence(
        F.lit(0), F.greatest(F.col(duration_col) - 1, F.lit(0)), F.lit(every_n_ms)
    )
    return df.select(
        F.col(id_col),
        F.col(payload_col),
        F.explode(positions).alias("frame_ts_ms"),
    )
