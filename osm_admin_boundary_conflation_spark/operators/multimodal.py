"""Multimodal column plumbing: opaque binary media + typed metadata.

Media (image/audio/video) ride as `binary` columns with typed metadata
structs. The decode/feature-extract step runs as `mapInPandas` over
Arrow record batches — the Spark-side plumbing (schema, batching,
partition-preserving iterator) is real and tested; the actual codec is
STUBBED in this container (no PIL/ffmpeg): `decode_media` raises
NotImplementedError unless `stub=True`, in which case it derives
deterministic fake dimensions from the md5 of the url (so the DuckDB
oracle can recompute them).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("codec", StringType()),
    ]
)


def decode_media(payload: bytes) -> tuple[int, int]:
    """Real decode path — requires an image codec, absent here."""
    raise NotImplementedError(
        "image/audio codecs are not installed in this container; "
        "run with stub=True (deterministic fake decode) or install PIL/ffmpeg"
    )


def extract_media_meta(pages: DataFrame, stub: bool = True) -> DataFrame:
    """pages(url, html:binary) → (url, n_bytes, width, height, codec)
    via mapInPandas (Arrow batch iterator; one Python worker pass per
    partition, no per-row overhead)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            urls = pdf["url"]
            blobs = pdf["html"]
            n_bytes = blobs.map(lambda b: len(bytes(b)) if b is not None else 0)
            if stub:
                w = urls.map(lambda u: 64 + int(hashlib.md5(u.encode()).hexdigest()[:2], 16) % 64)
            else:
                w = blobs.map(lambda b: decode_media(bytes(b))[0])
            h = (w * 3) // 4
            yield pd.DataFrame(
                {
                    "url": urls,
                    "n_bytes": n_bytes.astype("int64"),
                    "width": w.astype("int64"),
                    "height": h.astype("int64"),
                    "codec": "stub/html",
                }
            )

    return pages.select("url", "html").mapInPandas(batches, MEDIA_META_SCHEMA)


FEATURES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("resized_w", LongType()),
        StructField("resized_h", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def extract_media_features(pages: DataFrame, dim: int = 8, stub: bool = True) -> DataFrame:
    """Feature-extract + resize plumbing (the embed step of a multimodal
    training pipeline): mapInPandas over Arrow batches producing a
    fixed-``dim`` float vector per media blob plus aspect-preserving
    resize dims (max side 224). The embedding model is STUBBED
    deterministically (md5-derived bytes → [0,1] floats, recomputable by
    the DuckDB oracle); the schema, batching and vector column type are
    the real plumbing an image tower would plug into."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        if not stub:
            raise NotImplementedError("no image codec/model in this container")
        for pdf in it:
            urls = pdf["url"]
            hexes = urls.map(lambda u: hashlib.md5(u.encode()).hexdigest())
            w0 = hexes.map(lambda h: 64 + int(h[:2], 16) % 64)
            h0 = (w0 * 3) // 4
            # aspect-preserving resize to max side 224 (w0 >= h0 here)
            rw = pd.Series([224] * len(urls))
            rh = (h0 * 224) // w0
            feats = hexes.map(
                lambda h: [round(int(h[2 * j : 2 * j + 2], 16) / 255.0, 6) for j in range(dim)]
            )
            yield pd.DataFrame(
                {
                    "url": urls,
                    "resized_w": rw.astype("int64"),
                    "resized_h": rh.astype("int64"),
                    "feature": feats,
                }
            )

    return pages.select("url").mapInPandas(batches, FEATURES_SCHEMA)


def frame_sample(pages: DataFrame, every_n_bytes: int = 1000) -> DataFrame:
    """Frame-sampling analogue over opaque payloads: emit one row per
    sampled offset (JVM-side sequence explode — the Spark plumbing for
    video frame extraction; actual frame decode is the stub above)."""
    return pages.select(
        "url",
        F.octet_length("html").alias("n_bytes"),
        F.explode(
            F.sequence(F.lit(0), (F.octet_length("html") / every_n_bytes).cast("long"))
        ).alias("frame_no"),
    ).withColumn("byte_offset", F.col("frame_no") * every_n_bytes)
