"""Multimodal (binary) column plumbing: decode / feature-extract / resize /
frame-sample over opaque binary payloads with typed metadata.

The Spark-side plumbing (schemas, partitioning, mapInPandas batch shape,
metadata propagation) is real and tested. Pixel decoding:

* **image/bmp — REAL**: a pure stdlib+numpy decoder/encoder for 24-bit
  uncompressed BMP (no codec libraries needed) powers genuine decode,
  dimension verification, channel-mean features, nearest-neighbor resize
  and the >5 MB compression pass (compress_images);
* other image/audio codecs (PNG/JPEG/...) are environment-gated:
  `decode_features` raises NotImplementedError for them unless
  `fake=True`, which substitutes a deterministic synthetic decoder so the
  pipeline shape can still be exercised end-to-end.

Reference parity: the reference validates/compresses images with sharp and
renders PDFs with pdftoppm (/root/reference/src/services/image.service.js:186-240,
src/services/pdf.service.js:17-109); here those are per-batch Arrow operators.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),        # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),      # opaque bytes
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("feat", T.ArrayType(T.FloatType())),  # fixed 16-dim
        T.StructField("valid", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ]
)

# validation gates — reference constants.js:12-19 (min 200x200, max 4000x4000,
# compress > 5 MB)
MIN_DIM, MAX_DIM, MAX_BYTES = 200, 4000, 5 * 1024 * 1024


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for pixel decoding: 16 features from the digest."""
    d = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in d[:16]]


# ---------------------------------------------------------------------------
# Real pixel path: 24-bit uncompressed BMP (pure stdlib + numpy — BMP is a
# plain header + raster, so no codec library is required)
# ---------------------------------------------------------------------------

def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """-> (width, height, HxWx3 uint8 RGB array). 24-bit BI_RGB only."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pix_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit uncompressed BMP (got bpp={bpp} comp={comp})")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h <= 0:
        raise ValueError("empty image")
    stride = (w * 3 + 3) // 4 * 4
    need = pix_off + stride * h
    if len(payload) < need:
        raise ValueError("truncated BMP raster")
    raster = np.frombuffer(payload, np.uint8, count=stride * h, offset=pix_off)
    arr = raster.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        arr = arr[::-1]
    return w, h, arr[..., ::-1].copy()  # BGR -> RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> 24-bit bottom-up BI_RGB BMP bytes."""
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = arr[..., ::-1].reshape(h, w * 3)  # RGB -> BGR
    px = rows[::-1].tobytes()  # bottom-up
    off = 14 + 40
    return (
        b"BM"
        + struct.pack("<IHHI", off + len(px), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 2835, 2835, 0, 0)
        + px
    )


def resize_nearest(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    h, w = arr.shape[:2]
    yi = np.arange(th) * h // th
    xi = np.arange(tw) * w // tw
    return arr[yi][:, xi]


def _bmp_features(payload: bytes, meta_w, meta_h) -> tuple[list[float], bool, str | None]:
    """Real decode: features = [w, h scaled] + per-channel means + row-band
    means (16 dims total); validity from the DECODED dimensions, plus a
    metadata-consistency check (declared width/height must match pixels)."""
    w, h, arr = decode_bmp(payload)
    if (meta_w is not None and meta_w != w) or (meta_h is not None and meta_h != h):
        return [], False, "METADATA_DIMENSION_MISMATCH"
    ok = MIN_DIM <= w <= MAX_DIM and MIN_DIM <= h <= MAX_DIM and len(payload) <= MAX_BYTES
    ch = arr.reshape(-1, 3).mean(axis=0) / 255.0
    bands = [
        float(b.mean()) / 255.0
        for b in np.array_split(arr.mean(axis=(1, 2)), 11)
    ]
    feat = [min(w / MAX_DIM, 1.0), min(h / MAX_DIM, 1.0), *map(float, ch), *bands]
    return feat[:16], ok, None if ok else "DIMENSION_OR_SIZE"


def decode_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """mapInPandas over binary payloads -> per-media feature rows.

    Arrow-batched; the batch iterator shape (multiple pdf.DataFrames per
    partition) is the real production contract. image/bmp payloads are
    decoded for REAL (pure stdlib+numpy decoder); other image/audio mimes
    need codec libraries not present here — fake=True substitutes the
    deterministic synthetic decoder for them, otherwise they raise."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = r.payload if r.payload is not None else b""
                base = {
                    "media_id": r.media_id,
                    "kind": r.kind,
                    "n_bytes": len(payload),
                    "sha256": hashlib.sha256(payload).hexdigest(),
                }
                if r.kind == "image" and r.mime == "image/bmp":
                    try:
                        feat, valid, err = _bmp_features(payload, r.width, r.height)
                    except ValueError as exc:
                        feat, valid, err = [], False, f"DECODE_ERROR: {exc}"
                    rows.append({**base, "feat": feat, "valid": valid, "error": err})
                    continue
                if not fake:
                    raise NotImplementedError(
                        f"decoding {r.mime!r} requires codec libraries not "
                        "present in this environment (image/bmp is supported "
                        "natively); pass fake=True for the deterministic "
                        "synthetic decoder"
                    )
                valid = (
                    r.kind != "image"
                    or (
                        r.width is not None
                        and r.height is not None
                        and MIN_DIM <= r.width <= MAX_DIM
                        and MIN_DIM <= r.height <= MAX_DIM
                        and len(payload) <= MAX_BYTES
                    )
                )
                rows.append(
                    {
                        **base,
                        "feat": _fake_decode(payload),
                        "valid": bool(valid),
                        "error": None if valid else "DIMENSION_OR_SIZE",
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in FEATURES_SCHEMA.fields],
            )

    cols = ["media_id", "kind", "mime", "payload", "width", "height"]
    return media.select(*cols).mapInPandas(run, schema=FEATURES_SCHEMA)


def compress_images(media: DataFrame, max_bytes: int = MAX_BYTES) -> DataFrame:
    """D2 compression pass (image.service.js:203-226 analogue): bmp images
    over `max_bytes` are nearest-neighbor halved until they fit (or hit
    MIN_DIM); payload, width and height are rewritten, other rows pass
    through untouched. Real pixels, real re-encode — mapInPandas batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            for i, r in enumerate(pdf.itertuples(index=False)):
                if r.kind != "image" or r.mime != "image/bmp" or r.payload is None:
                    continue
                if len(r.payload) <= max_bytes:
                    continue
                try:
                    w, h, arr = decode_bmp(bytes(r.payload))
                except ValueError:
                    continue
                payload = bytes(r.payload)
                while len(payload) > max_bytes and min(w, h) // 2 >= MIN_DIM:
                    w, h = w // 2, h // 2
                    arr = resize_nearest(arr, w, h)
                    payload = encode_bmp(arr)
                out.iloc[i, out.columns.get_loc("payload")] = payload
                out.iloc[i, out.columns.get_loc("width")] = w
                out.iloc[i, out.columns.get_loc("height")] = h
            yield out

    return media.mapInPandas(run, schema=media.schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per target frame timestamp —
    pure column math (sequence over duration), the decode itself deferred to
    decode_features on the per-frame payload service."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
            )
        ).alias("frame_ts_ms"),
    )


def gradient_bmp(w: int, h: int, seed: int = 0) -> bytes:
    """Deterministic real BMP: RGB gradient varied by seed."""
    y, x = np.mgrid[0:h, 0:w]
    arr = np.stack(
        [
            ((x * (seed % 5 + 1)) % 256),
            ((y * (seed % 7 + 1)) % 256),
            ((x + y + seed) % 256),
        ],
        axis=-1,
    ).astype(np.uint8)
    return encode_bmp(arr)


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic binary media table for tests. Every other
    image row carries a REAL 24-bit BMP payload (decodable, resizable);
    the rest keep opaque bytes under environment-gated mimes."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image" and (i // 3) % 2 == 0:
            w, h = 200 + (i % 5) * 40, 200 + (i % 4) * 50
            rows.append(
                (f"m{i:05d}", "image", "image/bmp", gradient_bmp(w, h, i), w, h, None)
            )
            continue
        payload = hashlib.sha256(f"media{i}".encode()).digest() * (i % 7 + 1)
        rows.append(
            (
                f"m{i:05d}",
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                payload,
                100 + i * 37 if kind == "image" else None,
                100 + i * 29 if kind == "image" else None,
                1000 * (i + 1) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
