"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, partitioning, Arrow batch shapes, UDF
signatures) is real and tested; the actual byte decoding is STUBBED because
the image/audio libraries are not in this container — each decode hook
either raises NotImplementedError (strict mode) or produces a deterministic
fake derived from the bytes (test mode), clearly marked below.

Pattern at 100 TB: media bytes live in their own column family / parquet
files; `mapInPandas` streams Arrow batches so a 100 MB video row never
materializes more than one batch per task, and metadata-only queries prune
the binary column entirely (columnar projection).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def media_refs_table(docs_features: DataFrame) -> DataFrame:
    """Explode the media spans of decoded documents into a media-ref table
    (the join key side for a binary blob store)."""
    return docs_features.select(
        "doc_id", F.explode(F.col("media_refs")).alias("media_ref")
    ).withColumn("media_id", F.regexp_replace("media_ref", "^img://", ""))


def _fake_decode_image(content: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE decode (no PIL in container): derives a stable
    8×8 grayscale "image" from the byte hash. Replace with a real decoder
    (PIL/turbojpeg) in production — the surrounding plumbing is unchanged."""
    h = hashlib.sha256(content or b"").digest()
    arr = np.frombuffer((h * 2)[:64], dtype=np.uint8).reshape(8, 8)
    return arr


def decode_images(media: DataFrame, strict: bool = False, embed_dim: int = 8) -> DataFrame:
    """image bytes → (width, height, channels, embedding) via mapInPandas.

    strict=True raises NotImplementedError where a real decoder would run —
    the honest mode for this container. strict=False uses the deterministic
    fake so the distributed plumbing can be exercised end-to-end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "image":
                    continue
                if strict:
                    raise NotImplementedError(
                        "image decode requires PIL/libjpeg — not present in this container"
                    )
                img = _fake_decode_image(r.content)
                emb = img.astype(np.float32).mean(axis=0)[:embed_dim] / 255.0
                rows.append(
                    (r.media_id, r.doc_id, img.shape[1], img.shape[0], 1, emb.tolist())
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return media.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n_seconds: float = 1.0) -> DataFrame:
    """Video frame-sampling *plan*: rows (media_id, frame_ts) computed from
    the duration metadata — pure JVM; the decode of each frame is the
    stubbed step."""
    duration = F.coalesce(F.element_at(F.col("meta"), "duration_s").cast("double"), F.lit(0.0))
    n = F.floor(duration / F.lit(every_n_seconds)).cast("int")
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "doc_id", F.explode(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))).alias("i"))
        .select(
            "media_id", "doc_id",
            (F.col("i").cast("double") * every_n_seconds).alias("frame_ts"),
        )
    )
