"""Multimodal (image/audio/video) column plumbing.

Binary payloads ride as opaque ``binary`` columns with a typed metadata
struct — the same pattern the engine uses for ``html`` (and the reference
used for PostGIS geometry blobs, SURVEY.md §1.1).  Decode / resize /
frame-sample are Arrow-batched ``mapInPandas`` stages; the actual codec
calls are STUBBED in this container (no image/audio libraries baked in)
behind a deterministic fake so the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is real and tested.

At scale: binaries stay columnar in parquet; ``spark.sql.files.
maxPartitionBytes`` bounds task input; feature extraction is
embarrassingly parallel (no shuffle) and the extracted features are small
typed columns, so downstream joins/aggs never touch the blobs (column
pruning drops them at the scan).
"""

from __future__ import annotations

from collections.abc import Iterator

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
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    n = len(payload)
    return [round(a / n, 6) for a in acc]


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
