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


def _parse_wav(payload: bytes):
    """Minimal RIFF/WAVE parser → (fmt_tag, channels, sample_rate,
    bit_depth, data_bytes) or None if not a well-formed WAV container.
    Pure stdlib struct walking — no codec library."""
    import struct

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, csize = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    fmt_tag, channels, rate, _byte_rate, _align, bits = fmt
    return fmt_tag, channels, rate, bits, data


def audio_features(df: DataFrame, id_col: str, data_col: str) -> DataFrame:
    """REAL (codec-free) audio feature extraction for PCM/float WAV
    payloads: (sample_rate, channels, bit_depth, n_samples, duration_sec,
    rms, zero_crossing_rate, codec) per payload, Arrow-batched via
    mapInPandas with numpy doing the math per batch.

    The RIFF/WAVE container and uncompressed PCM (format tag 1) / IEEE
    float (tag 3) need no audio library — the header is 44 bytes of
    struct and the samples are a ``np.frombuffer``. Compressed codecs
    (mp3/ogg/aac, or WAV with any other format tag) can't be decoded
    without a backend; those rows come back with ``codec`` set to
    ``unsupported:<n>``/``invalid`` and null features — per-row error
    capture (like the NDJSON corrupt-record column) instead of failing
    the job, which is the only sane contract at 100 TB where some
    payloads are always malformed.
    """
    import numpy as np
    from pyspark.sql.types import DoubleType

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("sample_rate", IntegerType()),
            StructField("channels", IntegerType()),
            StructField("bit_depth", IntegerType()),
            StructField("n_samples", LongType()),
            StructField("duration_sec", DoubleType()),
            StructField("rms", DoubleType()),
            StructField("zcr", DoubleType()),
            StructField("codec", StringType()),
        ]
    )
    _DTYPES = {(1, 8): np.uint8, (1, 16): np.int16, (1, 32): np.int32, (3, 32): np.float32}
    _SCALE = {(1, 8): 128.0, (1, 16): 32768.0, (1, 32): 2147483648.0, (3, 32): 1.0}

    def _row(rid, payload):
        null = dict(sample_rate=None, channels=None, bit_depth=None, n_samples=None,
                    duration_sec=None, rms=None, zcr=None)
        if payload is None or len(payload) == 0:
            return dict(id=rid, codec="empty", **null)
        parsed = _parse_wav(bytes(payload))
        if parsed is None:
            return dict(id=rid, codec="invalid", **null)
        fmt_tag, channels, rate, bits, data = parsed
        key = (fmt_tag, bits)
        if key not in _DTYPES or channels < 1 or rate < 1:
            return dict(id=rid, codec=f"unsupported:{fmt_tag}/{bits}", **null)
        arr = np.frombuffer(data[: len(data) - len(data) % ((bits // 8) * channels)],
                            dtype=_DTYPES[key]).astype(np.float64)
        if key == (1, 8):
            arr -= 128.0  # 8-bit PCM is unsigned, center it
        arr /= _SCALE[key]
        n = arr.size // channels
        if n == 0:
            return dict(id=rid, codec="pcm", sample_rate=rate, channels=channels,
                        bit_depth=bits, n_samples=0, duration_sec=0.0, rms=0.0, zcr=0.0)
        mono = arr.reshape(n, channels).mean(axis=1)
        signs = np.signbit(mono)
        zcr = float(np.count_nonzero(signs[1:] != signs[:-1])) / max(n - 1, 1)
        return dict(
            id=rid, codec="pcm" if fmt_tag == 1 else "float",
            sample_rate=int(rate), channels=int(channels), bit_depth=int(bits),
            n_samples=int(n), duration_sec=float(n / rate),
            rms=float(np.sqrt(np.mean(mono**2))), zcr=zcr,
        )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_row(rid, b) for rid, b in zip(pdf[id_col], pdf[data_col])]
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(F.col(id_col), F.col(data_col)).mapInPandas(_extract, schema)
