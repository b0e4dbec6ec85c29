"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The decode step is STUBBED (image/audio libraries are not in this
container): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic md5-derived fake
"decode" stands in so the Spark-side plumbing — schema, batch
shapes, partitioning, UDF signatures — is real and tested.

At 100 TB the pattern that matters is here: binary payloads NEVER
pass through Python row-at-a-time; mapInPandas streams Arrow
batches, metadata travels in sibling typed columns so filters prune
*before* any decode, and per-file size skew is handled by
repartitioning on a salt of the media id.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Import-time probe: the real decoder activates automatically when an
# image library is present; everywhere else the deterministic stub
# keeps the Spark-side plumbing testable.
try:  # pragma: no cover - container has no image libs
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:
    _PILImage = None
    HAS_PIL = False

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature_hash", StringType()),
    ]
)


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture adapter: treat document text bytes as opaque media
    payloads (there is no binary fixture table; the bytes are real,
    the mime is synthetic)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        F.length(F.col("text").cast("binary")).cast("long").alias("n_bytes"),
    )


MIME_BY_EXT = {
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "wav": "audio/wav",
    "mp3": "audio/mpeg",
    "mp4": "video/mp4",
}


def media_from_binary_files(files: DataFrame) -> DataFrame:
    """Adapt a binaryFile scan (sources.catalog.read_binary_files)
    to MEDIA_SCHEMA: media_id from a hash of the path (stable across
    re-scans), mime from the file extension, payload as-is. All
    JVM-side; no decode happens here, so mime/size filters prune
    files before any UDF sees bytes."""
    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    mime_map = F.create_map(
        *[F.lit(x) for kv in MIME_BY_EXT.items() for x in kv]
    )
    return files.select(
        F.xxhash64("path").alias("media_id"),
        F.col("content").alias("payload"),
        F.coalesce(
            F.element_at(mime_map, ext), F.lit("application/octet-stream")
        ).alias("mime"),
        F.col("length").cast("long").alias("n_bytes"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for a real decoder: md5-derived
    pseudo 'dimensions' + content feature hash."""
    h = hashlib.md5(payload or b"").hexdigest()
    return int(h[:4], 16) % 1920 + 1, int(h[4:8], 16) % 1080 + 1, h


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, str]:
    """Decode one image payload -> (width, height, feature_hash).

    Real path: PIL, when importable (probed at module import) —
    actual pixel dimensions plus an md5 of the decoded RGB bytes as
    the content feature. Without PIL, a declared
    NotImplementedError unless ``fake=True`` selects the
    deterministic test double. The Spark-side contract (binary in,
    typed features out, batched via Arrow) is identical either way."""
    if fake:
        return _fake_decode(payload)
    if not HAS_PIL:
        raise NotImplementedError(
            "image decoding requires PIL, which is not available here; "
            "call with fake=True for the deterministic test double"
        )
    import io

    with _PILImage.open(io.BytesIO(payload)) as img:
        rgb = img.convert("RGB")
        return (
            rgb.width,
            rgb.height,
            hashlib.md5(rgb.tobytes()).hexdigest(),
        )


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches of binary
    payloads -> typed feature rows. This is the 'decode / feature-
    extract' slot; resize / frame-sample plug into the same shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            feats = [decode_image(p, fake=fake) for p in batch["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "mime": batch["mime"],
                    "n_bytes": batch["n_bytes"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "feature_hash": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sampling *plan* for video payloads: one row per sampled
    frame index, fanned out JVM-side BEFORE any decode so the decode
    UDF parallelizes across frames, not videos (the skew fix for
    long videos). Frame count is stubbed as a deterministic function
    of payload size."""
    n_frames = (F.col("n_bytes") % 300 + 1).cast("int")
    return (
        media.filter(F.col("mime") == "video/mp4")
        .select(
            "media_id",
            "n_bytes",
            F.explode(
                F.sequence(F.lit(0), n_frames - 1, F.lit(every_nth))
            ).alias("frame_idx"),
        )
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable slice of the multimodal tier: per-mime
    byte-size stats over the binary payload column (everything here
    is JVM-side; the decode stub is exercised in tests, not in the
    oracle path)."""
    media = documents_as_media(spark, sf_dir)
    return media.groupBy("mime").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("n_bytes").alias("min_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    ).orderBy("mime")


def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over the BINARY payload column — the first pass
    every multimodal ingest runs (identical bytes re-crawled under
    different ids): group by (sha2(payload), n_bytes), keep the min
    media_id, report copy counts. The digest is computed JVM-side on
    the binary column (payloads never route through Python) and the
    shuffle key is the 64-hex digest, never the payload itself — the
    same never-shuffle-blobs discipline as the rest of this module.

    The fixture has no byte-identical blobs, so deterministic
    duplicates are planted: every media_id % 97 == 0 payload is
    replaced by one constant byte string (the re-crawled-asset
    scenario); the oracle plants the identical dirt. Only duplicate
    groups (n_copies >= 2) are emitted."""
    media = documents_as_media(spark, sf_dir)
    planted = media.withColumn(
        "payload",
        F.when(
            F.col("media_id") % 97 == 0,
            F.lit("duplicated-asset-bytes").cast("binary"),
        ).otherwise(F.col("payload")),
    ).withColumn("n_bytes", F.length("payload").cast("long"))
    return (
        planted.groupBy(
            F.sha2(F.col("payload"), 256).alias("payload_sha256"),
            "n_bytes",
        )
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("media_id").alias("keep_id"),
        )
        .filter(F.col("n_copies") >= 2)
        .select(
            "payload_sha256",
            "n_bytes",
            F.col("n_copies").cast("long").alias("n_copies"),
            F.col("keep_id").cast("long").alias("keep_id"),
        )
        .orderBy("payload_sha256")
    )
