"""Multimodal (binary) column plumbing: decode / feature-extract / resize /
frame-sample over opaque binary payloads with typed metadata.

The Spark-side plumbing (schemas, partitioning, mapInPandas batch shape,
metadata propagation) is real and tested; the pixel/sample decoding itself is
STUBBED — image/audio codecs are not available in this environment, so
`decode_image_batch` raises NotImplementedError unless `fake=True`, which
substitutes a deterministic synthetic decoder (dimensions + checksum features
derived from the bytes) so the pipeline shape can be exercised end-to-end.

Reference parity: the reference validates/compresses images with sharp and
renders PDFs with pdftoppm (/root/reference/src/services/image.service.js:186-240,
src/services/pdf.service.js:17-109); here those are per-batch Arrow operators.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

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


def decode_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """mapInPandas over binary payloads -> per-media feature rows.

    Arrow-batched; the batch iterator shape (multiple pdf.DataFrames per
    partition) is the real production contract. Set fake=True for the
    deterministic synthetic decoder; otherwise raises on first batch
    (codec libs not installed here)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image/audio decoding requires codec libraries not present "
                    "in this environment; pass fake=True for the deterministic "
                    "synthetic decoder"
                )
            rows = []
            for r in pdf.itertuples(index=False):
                payload = r.payload if r.payload is not None else b""
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
                        "media_id": r.media_id,
                        "kind": r.kind,
                        "n_bytes": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "feat": _fake_decode(payload),
                        "valid": bool(valid),
                        "error": None if valid else "DIMENSION_OR_SIZE",
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in FEATURES_SCHEMA.fields],
            )

    cols = ["media_id", "kind", "payload", "width", "height"]
    return media.select(*cols).mapInPandas(run, schema=FEATURES_SCHEMA)


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


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic binary media table for tests."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media{i}".encode()).digest() * (i % 7 + 1)
        kind = ["image", "audio", "video"][i % 3]
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
