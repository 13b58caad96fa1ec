"""Multimodal (binary) columns with typed metadata (SURVEY.md §2.10).

The FHIR ``Attachment`` struct (contentType + url + size + data) is the
reference's multimodal pattern (assay.py:123-140); here it becomes a
first-class column family:

- payloads are opaque ``binary`` columns (or external urls for cold data);
- metadata is a typed struct, populated JVM-side (MIME inference, sizes);
- decode / feature-extract steps run as Arrow-batched ``mapInPandas``
  (the image/audio libraries are not in this container, so the decode
  kernels are STUBBED with deterministic fakes — the Spark-side plumbing
  (schema, batching, partitioning) is real and tested).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from healthcare_api_spark.functions.mime import guess_mime_expr

ATTACHMENT_SCHEMA = StructType(
    [
        StructField("contentType", StringType()),
        StructField("url", StringType()),
        StructField("size", LongType()),
        StructField("data", BinaryType()),
    ]
)


def attach_payload(df: DataFrame, url_col: str, data_col: str | None = None) -> DataFrame:
    """Build an ``attachment`` struct column: MIME inferred from the url
    (broadcast-free CASE expr), size from the binary payload when present."""
    data = F.col(data_col) if data_col else F.lit(None).cast("binary")
    return df.withColumn(
        "attachment",
        F.struct(
            guess_mime_expr(F.col(url_col)).alias("contentType"),
            F.col(url_col).alias("url"),
            F.coalesce(F.length(data).cast("long"), F.lit(None).cast("long")).alias("size"),
            data.alias("data"),
        ),
    )


IMAGE_META_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("format", StringType()),
    ]
)


def decode_image_meta(df: DataFrame, id_col: str, data_col: str) -> DataFrame:
    """STUB image decode: extracts (width, height, channels, format) per
    payload via Arrow-batched mapInPandas.

    Real deployments replace ``_fake_decode`` with PIL/libvips; the fake
    derives deterministic dims from the byte length so tests exercise the
    full batched path (schema, nulls, partition boundaries) without the
    codec library.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf[data_col].map(lambda b: len(b) if b is not None else 0)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    # STUB: deterministic fake in lieu of a real codec.
                    "width": (n % 640 + 1).astype("int32"),
                    "height": (n % 480 + 1).astype("int32"),
                    "channels": pd.Series([3] * len(pdf), dtype="int32"),
                    "format": pd.Series(["fake/raw"] * len(pdf)),
                }
            )

    return df.select(F.col(id_col).alias(id_col), F.col(data_col)).mapInPandas(
        _decode, IMAGE_META_SCHEMA
    )


def frame_sample(df: DataFrame, id_col: str, data_col: str, every_n: int = 10) -> DataFrame:
    """STUB video frame sampler: emits one row per sampled frame index.

    Plumbing is real (mapInPandas fan-out rows > input rows); the frame
    count is a deterministic fake of the payload size. Replace the body
    with pyav/ffmpeg bindings in production.
    """
    schema = StructType(
        [StructField("id", LongType()), StructField("frame_idx", IntegerType()),
         StructField("frame", BinaryType())]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"id": [], "frame_idx": [], "frame": []}
            for _, r in pdf.iterrows():
                payload = r[data_col] or b""
                n_frames = max(len(payload) // 64, 1)  # STUB: fake frame count
                for i in range(0, n_frames, every_n):
                    rows["id"].append(r[id_col])
                    rows["frame_idx"].append(i)
                    rows["frame"].append(bytes(payload[i : i + 8]))
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(data_col)).mapInPandas(_sample, schema)


def byte_histogram_features(
    df: DataFrame, id_col: str, data_col: str, bins: int = 16
) -> DataFrame:
    """REAL (not stubbed) feature extraction over binary payloads: an
    L1-normalized byte-value histogram per payload — codec-free, useful
    as a cheap modality fingerprint / near-dup signal for opaque blobs.
    Arrow-batched mapInPandas; numpy does the binning per batch."""
    import numpy as np
    from pyspark.sql.types import ArrayType, DoubleType

    schema = StructType(
        [StructField("id", LongType()), StructField("features", ArrayType(DoubleType()))]
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[data_col]:
                if b is None or len(b) == 0:
                    feats.append([0.0] * bins)
                    continue
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=bins, range=(0, 256))
                feats.append((hist / hist.sum()).tolist())
            yield pd.DataFrame({"id": pdf[id_col], "features": feats})

    return df.select(F.col(id_col), F.col(data_col)).mapInPandas(_extract, schema)


def resize_image_stub(
    df: DataFrame, id_col: str, data_col: str, width: int = 64, height: int = 64
) -> DataFrame:
    """STUB image resize: emits a payload of exactly width*height*3 bytes
    derived deterministically from the input (tiled). The Spark plumbing
    (binary in/out, batch shape, output sizing) is real; swap the body
    for PIL/libvips `resize` in production."""
    schema = StructType(
        [StructField("id", LongType()), StructField("resized", BinaryType()),
         StructField("n_bytes", IntegerType())]
    )
    target = width * height * 3

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf[data_col]:
                src = bytes(b) if b else b"\x00"
                # STUB: tile/truncate to the target size instead of decoding
                tiled = (src * (target // len(src) + 1))[:target]
                out.append(tiled)
            yield pd.DataFrame(
                {"id": pdf[id_col], "resized": out, "n_bytes": [target] * len(pdf)}
            )

    return df.select(F.col(id_col), F.col(data_col)).mapInPandas(_resize, schema)


def audio_features(df: DataFrame, id_col: str, data_col: str) -> DataFrame:
    """STUB audio feature extraction (duration, sample rate) — raises by
    contract if invoked without a real backend wired in, unless
    ``fake=True`` column semantics are acceptable; kept NotImplemented to
    mark the integration point explicitly."""
    raise NotImplementedError(
        "audio decode requires an audio backend (librosa/soundfile) not present "
        "in this environment; Spark plumbing mirrors decode_image_meta"
    )
