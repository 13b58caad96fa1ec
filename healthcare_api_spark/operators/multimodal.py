"""Multimodal (binary) columns with typed metadata (SURVEY.md §2.10).

The FHIR ``Attachment`` struct (contentType + url + size + data) is the
reference's multimodal pattern (assay.py:123-140); here it becomes a
first-class column family:

- payloads are opaque ``binary`` columns (or external urls for cold data);
- metadata is a typed struct, populated JVM-side (MIME inference, sizes);
- decode / feature-extract steps run as Arrow-batched ``mapInPandas``.

Codec-free REAL kernels (no image/audio library in this container, but
these formats need none): image header metadata (PNG/BMP/GIF/JPEG struct
walking), full PNG pixel decode (stdlib zlib + numpy unfiltering),
nearest-neighbor PNG resize, byte histograms, RIFF/PCM audio features.
Compressed codecs (jpeg pixels, mp3, video) stay STUBBED with
deterministic fakes — the Spark-side plumbing (schema, batching,
partitioning, per-row error capture) is real and tested either way.
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
        StructField("bit_depth", IntegerType()),
        StructField("format", StringType()),
    ]
)

# PNG color type → sample count per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _parse_image_header(payload: bytes):
    """Codec-free container sniffing → (format, width, height, channels,
    bit_depth) or None. PNG/BMP/GIF dims live at fixed offsets; JPEG needs
    a marker walk to the first SOF segment. Pure stdlib — no image lib."""
    import struct

    if len(payload) >= 33 and payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        w, h = struct.unpack_from(">II", payload, 16)
        depth, color_type = payload[24], payload[25]
        return ("png", w, h, _PNG_CHANNELS.get(color_type, 0), depth)
    if len(payload) >= 30 and payload[:2] == b"BM":
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        # bpp is bits per PIXEL: 24→3×8-bit channels, 8→1 palette channel
        return ("bmp", w, abs(h), max(bpp // 8, 1), 8 if bpp >= 8 else bpp)
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack_from("<HH", payload, 6)
        return ("gif", w, h, 1, 8)  # palette-indexed
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        pos = 2
        while pos + 9 < len(payload):
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no-length markers
                pos += 2
                continue
            seglen = struct.unpack_from(">H", payload, pos + 2)[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):  # SOFn
                depth = payload[pos + 4]
                h, w = struct.unpack_from(">HH", payload, pos + 5)
                return ("jpeg", w, h, payload[pos + 9], depth)
            pos += 2 + seglen
        return None
    return None


def decode_image_meta(df: DataFrame, id_col: str, data_col: str) -> DataFrame:
    """REAL (codec-free) image metadata decode: (width, height, channels,
    bit_depth, format) for PNG / BMP / GIF / JPEG payloads via Arrow-batched
    mapInPandas — container headers are struct walking, no codec library.

    Undecodable payloads surface per-row as format ``invalid`` (or
    ``empty``) with null dims — the NDJSON-corrupt-record contract, never
    a job failure (at 100 TB some payloads are always malformed)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, b in zip(pdf[id_col], pdf[data_col]):
                null = dict(width=None, height=None, channels=None, bit_depth=None)
                if b is None or len(b) == 0:
                    rows.append(dict(id=rid, format="empty", **null))
                    continue
                parsed = _parse_image_header(bytes(b))
                if parsed is None:
                    rows.append(dict(id=rid, format="invalid", **null))
                    continue
                fmt, w, h, ch, depth = parsed
                rows.append(dict(id=rid, width=w, height=h, channels=ch,
                                 bit_depth=depth, format=fmt))
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields])

    return df.select(F.col(id_col).alias(id_col), F.col(data_col)).mapInPandas(
        _decode, IMAGE_META_SCHEMA
    )


def encode_png_bytes(arr) -> bytes:
    """Codec-free PNG encoder (stdlib zlib): uint8 array (h, w) or
    (h, w, ch) with ch ∈ {1,2,3,4} → non-interlaced 8-bit PNG, filter 0
    scanlines. The inverse of ``_decode_png_pixels`` — used by tests and
    the driver contract to synthesize real decodable payloads."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + cid + body
            + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _decode_png_pixels(payload: bytes):
    """Full PNG decode without any image library: chunk walk → zlib
    (stdlib) inflate → per-scanline unfiltering (the 5 PNG filter types)
    → interleaved uint8 pixel bytes. Supports bit depth 8, color types
    0/2/4/6 (gray / RGB / gray+alpha / RGBA), non-interlaced — the subset
    generable without a codec. Returns (width, height, channels, bytes)
    or a str error code.
    """
    import struct
    import zlib

    import numpy as np

    hdr = _parse_image_header(payload)
    if hdr is None or hdr[0] != "png":
        return "invalid"
    _, w, h, ch, depth = hdr
    color_type = payload[25]
    interlace = payload[28]
    if depth != 8 or color_type not in (0, 2, 4, 6) or interlace != 0:
        return f"unsupported:ct{color_type}/d{depth}/i{interlace}"
    idat, pos = b"", 8
    while pos + 8 <= len(payload):
        clen = struct.unpack_from(">I", payload, pos)[0]
        cid = payload[pos + 4 : pos + 8]
        if cid == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + clen]
        elif cid == b"IEND":
            break
        pos += 12 + clen  # len + id + crc
    try:
        raw = zlib.decompress(idat)
    except zlib.error:
        return "corrupt-idat"
    stride = w * ch
    if len(raw) != h * (stride + 1):
        return "truncated"
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype, row = line[0], np.frombuffer(line[1:], dtype=np.uint8).astype(np.int32)
        if ftype == 0:
            rec = row
        elif ftype == 2:  # up
            rec = (row + prev) & 0xFF
        else:
            # sub/average/paeth recur along the row — per-byte loop
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0  # left
                b = prev[x]  # up
                c = prev[x - ch] if x >= ch else 0  # up-left
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                elif ftype == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                else:
                    return f"bad-filter:{ftype}"
                rec[x] = (row[x] + pred) & 0xFF
        out[y] = rec
        prev = out[y].astype(np.int32)
    return (w, h, ch, out.tobytes())


def _decode_gif_pixels(payload: bytes):
    """First-frame GIF decode without any image library: LZW is a pure
    algorithm (stdlib ints + a numpy palette gather). Supports GIF87a/89a
    with a global or local color table, non-interlaced. Returns
    (width, height, 3, rgb_bytes) or a str error code."""
    import struct

    import numpy as np

    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return "invalid"
    _w, _h = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            if pos + 10 > len(payload):
                return "truncated"
            w, h = struct.unpack_from("<HH", payload, pos + 5)
            ipacked = payload[pos + 9]
            pos += 10
            if ipacked & 0x40:
                return "unsupported:interlaced"
            if ipacked & 0x80:  # local color table wins
                n = 2 << (ipacked & 0x07)
                palette = np.frombuffer(
                    payload[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if palette is None:
                return "unsupported:no-palette"
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            # ---- LZW decode (12-bit max, little-endian bit packing) ----
            clear, end = 1 << min_code, (1 << min_code) + 1
            table: list[bytes] = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
            code_size = min_code + 1
            out = bytearray()
            prev: bytes | None = None
            acc = nbits = 0
            done = False  # end code terminates the WHOLE stream — any
            # trailing padding/corrupt bytes must not decode as pixels
            for byte in data:
                if done:
                    break
                acc |= byte << nbits
                nbits += 8
                while nbits >= code_size:
                    code = acc & ((1 << code_size) - 1)
                    acc >>= code_size
                    nbits -= code_size
                    if code == clear:
                        table = table[: (1 << min_code) + 2]
                        code_size = min_code + 1
                        prev = None
                        continue
                    if code == end:
                        done = True
                        break
                    if code < len(table):
                        entry = table[code]
                    elif code == len(table) and prev is not None:
                        entry = prev + prev[:1]
                    else:
                        return "corrupt-lzw"
                    out += entry
                    if prev is not None:
                        table.append(prev + entry[:1])
                        if len(table) == (1 << code_size) and code_size < 12:
                            code_size += 1
                    prev = entry
            if len(out) < w * h:
                return "truncated"
            idx = np.frombuffer(bytes(out[: w * h]), dtype=np.uint8)
            if idx.max(initial=0) >= palette.shape[0]:
                return "corrupt-palette-index"
            return (w, h, 3, palette[idx].tobytes())
        elif b == 0x3B:  # trailer before any image
            return "no-image"
        else:
            return "invalid"
    return "truncated"


PNG_PIXELS_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pixels", BinaryType()),
        StructField("status", StringType()),
    ]
)


def decode_png(df: DataFrame, id_col: str, data_col: str) -> DataFrame:
    """REAL full-pixel PNG decode (stdlib zlib + numpy unfiltering) as an
    Arrow-batched mapInPandas kernel. Output pixels are interleaved uint8;
    undecodable rows carry a ``status`` error code and null pixels."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, b in zip(pdf[id_col], pdf[data_col]):
                null = dict(width=None, height=None, channels=None, pixels=None)
                if b is None or len(b) == 0:
                    rows.append(dict(id=rid, status="empty", **null))
                    continue
                res = _decode_png_pixels(bytes(b))
                if isinstance(res, str):
                    rows.append(dict(id=rid, status=res, **null))
                else:
                    w, h, ch, px = res
                    rows.append(dict(id=rid, width=w, height=h, channels=ch,
                                     pixels=px, status="ok"))
            yield pd.DataFrame(rows, columns=[f.name for f in PNG_PIXELS_SCHEMA.fields])

    return df.select(F.col(id_col), F.col(data_col)).mapInPandas(_decode, PNG_PIXELS_SCHEMA)


def _decode_bmp_pixels(payload: bytes):
    """Uncompressed 24-bpp BMP decode — raw BGR rows, 4-byte padded,
    bottom-up (or top-down when height < 0). Pure struct + numpy.
    Returns (width, height, 3, rgb_bytes) or a str error code."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        return "invalid"
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        return f"unsupported:bpp{bpp}/c{compression}"
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    need = data_off + stride * h
    if w < 1 or h < 1 or len(payload) < need:
        return "truncated"
    rows = np.frombuffer(
        payload[data_off : data_off + stride * h], dtype=np.uint8
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:
        rows = rows[::-1]  # bottom-up storage
    return (w, h, 3, rows[:, :, ::-1].tobytes())  # BGR → RGB


def decode_bmp(df: DataFrame, id_col: str, data_col: str) -> DataFrame:
    """REAL uncompressed-BMP pixel decode (no codec needed — raw bytes),
    same output contract as ``decode_png``/``decode_gif``."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, b in zip(pdf[id_col], pdf[data_col]):
                null = dict(width=None, height=None, channels=None, pixels=None)
                if b is None or len(b) == 0:
                    rows.append(dict(id=rid, status="empty", **null))
                    continue
                res = _decode_bmp_pixels(bytes(b))
                if isinstance(res, str):
                    rows.append(dict(id=rid, status=res, **null))
                else:
                    w, h, ch, px = res
                    rows.append(dict(id=rid, width=w, height=h, channels=ch,
                                     pixels=px, status="ok"))
            yield pd.DataFrame(rows, columns=[f.name for f in PNG_PIXELS_SCHEMA.fields])

    return df.select(F.col(id_col), F.col(data_col)).mapInPandas(_decode, PNG_PIXELS_SCHEMA)


def encode_gif_bytes(indices, palette) -> bytes:
    """Codec-free GIF89a encoder for tests/synthesis: ``indices`` is a
    (h, w) uint8 palette-index array, ``palette`` an (n, 3) uint8 RGB
    table (n a power of two ≥ 4). The LZW stream emits a clear code
    before every pixel code — larger than real compression but a VALID
    stream every decoder accepts, and it needs no dictionary logic."""
    import struct

    import numpy as np

    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    n = pal.shape[0]
    depth = max((n - 1).bit_length(), 2)
    min_code = depth
    clear, end = 1 << min_code, (1 << min_code) + 1
    code_size = min_code + 1

    bits = bytearray()
    acc = nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    for p in idx.ravel():
        emit(clear)  # constant reset: table never grows, size never bumps
        emit(int(p))
    emit(end)
    if nbits:
        bits.append(acc & 0xFF)

    gct = pal.tobytes() + b"\x00" * (3 * ((1 << depth) - n))
    out = (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
        + gct
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([min_code])
    )
    for i in range(0, len(bits), 255):
        chunk = bytes(bits[i : i + 255])
        out += bytes([len(chunk)]) + chunk
    return out + b"\x00\x3b"


def decode_gif(df: DataFrame, id_col: str, data_col: str) -> DataFrame:
    """REAL first-frame GIF pixel decode (pure-algorithm LZW + numpy
    palette gather) as an Arrow-batched mapInPandas kernel — same output
    contract as ``decode_png``: interleaved uint8 RGB, per-row error
    status, the job never fails."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, b in zip(pdf[id_col], pdf[data_col]):
                null = dict(width=None, height=None, channels=None, pixels=None)
                if b is None or len(b) == 0:
                    rows.append(dict(id=rid, status="empty", **null))
                    continue
                res = _decode_gif_pixels(bytes(b))
                if isinstance(res, str):
                    rows.append(dict(id=rid, status=res, **null))
                else:
                    w, h, ch, px = res
                    rows.append(dict(id=rid, width=w, height=h, channels=ch,
                                     pixels=px, status="ok"))
            yield pd.DataFrame(rows, columns=[f.name for f in PNG_PIXELS_SCHEMA.fields])

    return df.select(F.col(id_col), F.col(data_col)).mapInPandas(_decode, PNG_PIXELS_SCHEMA)


def resize_png_nearest(
    df: DataFrame, id_col: str, data_col: str, width: int = 64, height: int = 64
) -> DataFrame:
    """REAL image resize for PNG payloads: full decode, then
    nearest-neighbor index into the pixel grid (numpy fancy indexing per
    batch). Non-PNG / undecodable rows carry the decode error status and
    null output — per-row capture, the job never fails."""
    import numpy as np

    schema = StructType(
        [StructField("id", LongType()), StructField("resized", BinaryType()),
         StructField("n_bytes", IntegerType()), StructField("status", StringType())]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, b in zip(pdf[id_col], pdf[data_col]):
                res = _decode_png_pixels(bytes(b)) if b else "empty"
                if isinstance(res, str):
                    rows.append(dict(id=rid, resized=None, n_bytes=None, status=res))
                    continue
                w, h, ch, px = res
                img = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch)
                ys = (np.arange(height) * h) // height
                xs = (np.arange(width) * w) // width
                out = img[ys][:, xs]
                rows.append(dict(id=rid, resized=out.tobytes(),
                                 n_bytes=width * height * ch, status="ok"))
            yield pd.DataFrame(rows, columns=["id", "resized", "n_bytes", "status"])

    return df.select(F.col(id_col), F.col(data_col)).mapInPandas(_resize, schema)


# chroma subsampling → bytes per frame as a multiple of w*h (num, den)
_Y4M_CHROMA = {"420": (3, 2), "422": (2, 1), "444": (3, 1), "mono": (1, 1)}


def _parse_y4m(payload: bytes):
    """YUV4MPEG2 container walk → (width, height, frame_size, data_start)
    or None. Y4M is UNCOMPRESSED video: a text header line, then
    'FRAME\\n' + raw planar YUV per frame — no codec needed."""
    if not payload.startswith(b"YUV4MPEG2 "):
        return None
    nl = payload.find(b"\n")
    if nl < 0:
        return None
    w = h = None
    chroma = "420"
    for tok in payload[10:nl].split(b" "):
        if tok.startswith(b"W"):
            w = int(tok[1:])
        elif tok.startswith(b"H"):
            h = int(tok[1:])
        elif tok.startswith(b"C"):
            c = tok[1:].decode("ascii", "replace")
            chroma = next((k for k in _Y4M_CHROMA if c.startswith(k)), c)
    if not w or not h or chroma not in _Y4M_CHROMA:
        return None
    num, den = _Y4M_CHROMA[chroma]
    return w, h, (w * h * num) // den, nl + 1


def frame_sample(df: DataFrame, id_col: str, data_col: str, every_n: int = 10) -> DataFrame:
    """Video frame sampler: every ``every_n``-th frame as a binary row.

    REAL for Y4M/YUV4MPEG2 payloads (uncompressed planar YUV — pure
    container walking, no codec): emits the full raw frame bytes with
    ``mode='y4m'`` plus the stream dims. Compressed containers (mp4/webm)
    need a codec library this env lacks — those fall back to the
    deterministic STUB sampler (``mode='stub'``, fake frame count from
    payload size) so the fan-out plumbing (rows out > rows in) stays
    exercised end-to-end.
    """
    schema = StructType(
        [StructField("id", LongType()), StructField("frame_idx", IntegerType()),
         StructField("frame", BinaryType()), StructField("mode", StringType()),
         StructField("width", IntegerType()), StructField("height", IntegerType())]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("id", "frame_idx", "frame", "mode", "width", "height")}

            def emit(rid, idx, frame, mode, w=None, h=None):
                rows["id"].append(rid)
                rows["frame_idx"].append(idx)
                rows["frame"].append(frame)
                rows["mode"].append(mode)
                rows["width"].append(w)
                rows["height"].append(h)

            for rid, b in zip(pdf[id_col], pdf[data_col]):
                payload = bytes(b) if b is not None else b""
                y4m = _parse_y4m(payload)
                if y4m is not None:
                    w, h, fsize, pos = y4m
                    idx = 0
                    while pos < len(payload):
                        nl = payload.find(b"\n", pos)
                        if nl < 0 or payload[pos : pos + 5] != b"FRAME":
                            break  # truncated/corrupt tail: keep what we have
                        start = nl + 1
                        frame = payload[start : start + fsize]
                        if len(frame) < fsize:
                            break
                        if idx % every_n == 0:
                            emit(rid, idx, frame, "y4m", w, h)
                        idx += 1
                        pos = start + fsize
                    continue
                n_frames = max(len(payload) // 64, 1)  # STUB: fake frame count
                for i in range(0, n_frames, every_n):
                    emit(rid, i, bytes(payload[i : i + 8]), "stub")
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
