"""Multimodal (binary) column plumbing — driver north-star extension.

Treats image/audio/video payloads as opaque `binary` columns with typed
metadata, processed via Arrow-batched `mapInPandas` (the only place Python
belongs in the hot path — per-batch vectorized work on bytes).

The decode step try-imports Pillow: where PIL is installed, fake=False
decodes real image bytes (features = luminance strip; resize = true
resample + PNG re-encode). Where it is not (this container), fake=False
raises NotImplementedError from the executors — the clearly-marked stub —
and `fake=True` swaps in a deterministic fake decoder (content-hash-derived
"pixels") so the Spark plumbing (schema, batch shape, partitioning, UDF
signature) is real and tested either way.

Scale notes: mapInPandas streams Arrow record batches — memory is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch regardless of blob sizes; binary
columns never pass through Python row-by-row.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

try:  # optional real decoder — absent in this container, used when deployed
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - container has no Pillow
    _PILImage = None

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: A multimodal asset row: opaque payload + typed metadata.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_hash", StringType(), False),
        StructField("features", ArrayType(FloatType(), False), False),
    ]
)


def make_assets_from_text(df: DataFrame, id_col: str, text_col: str, media_type: str = "image") -> DataFrame:
    """Test helper: synthesize binary assets from a text column (the driver's
    tables carry no blobs). encode() gives a real binary column."""
    return df.select(
        F.col(id_col).cast("string").alias("asset_id"),
        F.lit(media_type).alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake 'decoded features': md5-seeded bytes -> floats in
    [0, 1). Stands in for decode->resize->feature-extract."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.md5(payload + counter.to_bytes(4, "little")).digest()
        out.extend(b / 256.0 for b in h)
        counter += 1
    return out[:dim]


def _pil_decode(payload: bytes, dim: int) -> list[float]:
    """Real decode path (used when Pillow is installed): decode the image,
    grayscale, resample to a dim-length luminance strip, normalize to
    [0, 1] — a deterministic, library-grade stand-in for a model encoder
    that exercises true byte decoding."""
    import io

    img = _PILImage.open(io.BytesIO(payload)).convert("L").resize((dim, 1))
    return [p / 255.0 for p in img.getdata()]


def extract_features(df: DataFrame, dim: int = 8, fake: bool = False) -> DataFrame:
    """Decode + feature-extract binary assets via mapInPandas.

    With fake=False the executors decode real image bytes via Pillow where
    it is installed (try-import), else raise NotImplementedError — the
    clearly-marked stub (no decoder libs in this container). fake=True uses
    the deterministic fake so the full Arrow pipeline executes end to end
    regardless of environment.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake and _PILImage is None:
                raise NotImplementedError(
                    "media decode requires an image/audio library; "
                    "deploy with Pillow installed or pass fake=True"
                )
            decode = _fake_decode if fake else _pil_decode
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_hash": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                    "features": payloads.map(lambda b: decode(bytes(b), dim)),
                }
            )

    return df.mapInPandas(batches, FEATURES_SCHEMA)


def resize_image(df: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Image-resize plumbing: payload -> resized payload + updated metadata,
    via the same Arrow-batched mapInPandas shape as extract_features.

    With Pillow installed, fake=False does the real decode -> resample ->
    PNG re-encode; without it, fake=False raises NotImplementedError at the
    decode step and fake=True produces a deterministic stand-in payload
    (md5-keyed stream of width*height bytes) so schema, batch flow, and
    metadata updates execute for real.
    """

    def _fake_resize(payload: bytes) -> bytes:
        out = bytearray()
        counter = 0
        while len(out) < width * height:
            out.extend(hashlib.md5(payload + counter.to_bytes(4, "little")).digest())
            counter += 1
        return bytes(out[: width * height])

    def _pil_resize(payload: bytes) -> bytes:
        import io

        img = _PILImage.open(io.BytesIO(payload)).resize((width, height))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake and _PILImage is None:
                raise NotImplementedError(
                    "image resize requires a decoder library; "
                    "deploy with Pillow installed or pass fake=True"
                )
            resize = _fake_resize if fake else _pil_resize
            pdf = pdf.copy()
            pdf["payload"] = pdf["payload"].map(lambda b: resize(bytes(b)))
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return df.mapInPandas(batches, ASSET_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled timestamp
    (the decode of each frame is the same stub). Pure plan-side explode —
    the frame index is computed from metadata, no Python."""
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return df.withColumn(
        "frame_ts_ms",
        F.explode(F.transform(F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms)),
    )
