"""Multimodal (binary) column plumbing: decode / feature / resize stubs.

Images, audio, and video ride as opaque ``binary`` columns with typed
metadata.  The decode libraries (PIL/ffmpeg/librosa) are NOT in this
container, so the decode step is a clearly-marked deterministic fake —
but everything Spark-side is real and tested: schema, Arrow batch shape,
``mapInPandas`` signature, partitioning.  Swap ``_fake_decode`` for a
real decoder and nothing else changes.

``media_metadata`` is arithmetic on the payload bytes only, so it HAS a
DuckDB oracle (octet_length math); ``decode_image_batch`` raises
NotImplementedError unless ``allow_fake=True``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def media_metadata(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """Typed metadata for a binary media column — built-in exprs only:
    (id, n_bytes, fake_width, fake_height, fake_channels).  The fake_*
    fields are deterministic stand-ins derived from n_bytes; a real
    decoder would read the container header instead."""
    n = F.octet_length(F.col(bin_col)).cast("bigint")
    return df.select(
        F.col(id_col),
        n.alias("n_bytes"),
        (n % F.lit(640) + F.lit(1)).cast("int").alias("fake_width"),
        ((n * F.lit(7)) % F.lit(480) + F.lit(1)).cast("int").alias("fake_height"),
        F.lit(3).cast("int").alias("fake_channels"),
    )


def media_metadata_oracle_sql(table: str, bin_expr: str, id_col: str) -> str:
    n = f"CAST(octet_length({bin_expr}) AS BIGINT)"
    return f"""
SELECT {id_col},
       {n} AS n_bytes,
       CAST({n} % 640 + 1 AS INT) AS fake_width,
       CAST(({n} * 7) % 480 + 1 AS INT) AS fake_height,
       CAST(3 AS INT) AS fake_channels
FROM {table}
"""


DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _fake_decode(payloads: pd.Series) -> pd.DataFrame:
    """STUB — deterministic fake decode (no image libs in container).
    Real impl: PIL.Image.open(BytesIO(b)) -> resize -> feature extract."""
    n = payloads.str.len().to_numpy(dtype=np.int64)
    heads = payloads.str[:8].apply(
        lambda b: int.from_bytes(bytes(b).ljust(8, b"\0"), "big")
    ).to_numpy(dtype=np.uint64)
    feats = np.stack(
        [
            (n % 251).astype(np.float32),
            (heads % np.uint64(509)).astype(np.float32),
            ((n * 31) % 1021).astype(np.float32),
            ((heads >> np.uint64(13)) % np.uint64(2039)).astype(np.float32),
        ],
        axis=1,
    )
    return pd.DataFrame(
        {
            "width": (n % 640 + 1).astype(np.int32),
            "height": ((n * 7) % 480 + 1).astype(np.int32),
            "format": np.where(n % 2 == 0, "fake/png", "fake/jpeg"),
            "features": list(feats),
        }
    )


def decode_media(
    df: DataFrame, bin_col: str, id_col: str, *, allow_fake: bool = False
) -> DataFrame:
    """Decode + feature-extract a binary media column via mapInPandas.

    Raises NotImplementedError at plan-build time unless allow_fake —
    the real decoder is not available in this environment."""
    if not allow_fake:
        raise NotImplementedError(
            "media decode libs are not installed in this container; "
            "pass allow_fake=True to exercise the Spark plumbing with "
            "the deterministic fake decoder"
        )

    def run(it):
        for pdf in it:
            if pdf.empty:
                continue
            out = _fake_decode(pdf[bin_col])
            out.insert(0, "media_id", pdf[id_col].to_numpy(dtype=np.int64))
            yield out

    return df.select(id_col, bin_col).mapInPandas(run, schema=DECODE_SCHEMA)


def frame_sample(
    df: DataFrame, bin_col: str, id_col: str, *, every_n: int = 10, allow_fake: bool = False
) -> DataFrame:
    """Video frame-sampling stub: emits one row per sampled 'frame'
    (deterministic count = n_bytes // (64 * every_n) + 1). Real impl:
    ffmpeg seek + decode every_n-th frame."""
    if not allow_fake:
        raise NotImplementedError("no video decoder in this container")
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_no", IntegerType()),
            StructField("frame_bytes", LongType()),
        ]
    )

    def run(it):
        for pdf in it:
            if pdf.empty:
                continue
            n = pdf[bin_col].str.len().to_numpy(dtype=np.int64)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            counts = n // (64 * every_n) + 1
            rep = np.repeat(np.arange(len(ids)), counts)
            frame_no = np.concatenate([np.arange(c) for c in counts])
            yield pd.DataFrame(
                {
                    "media_id": ids[rep],
                    "frame_no": frame_no.astype(np.int32),
                    "frame_bytes": (n[rep] - frame_no * 64).clip(min=1),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)
