"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, partition-friendly batch shapes, Arrow UDF
signatures) is real and tested, while the codec kernels are STUBS — the
decode libraries are not in this container. ``fake_decode=True`` swaps in a
deterministic fake (dimensions/hash derived from the bytes) so pipelines are
testable end to end; ``fake_decode=False`` raises NotImplementedError at the
point a real codec would run.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType(), True),   # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

_FEATURE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("content_sha", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def with_media_meta(df: DataFrame, payload_col: str = "html",
                    media_type: str = "image",
                    mime: str = "application/octet-stream") -> DataFrame:
    """Attach a typed metadata struct to an opaque binary column."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def extract_features(df: DataFrame, payload_col: str = "html",
                     feature_dim: int = 16,
                     fake_decode: bool = True) -> DataFrame:
    """Decode + feature-extract each binary payload (Arrow-batched).

    Real pipelines plug a codec (PIL/ffmpeg/torchvision) into ``_decode``;
    here the decode step is stubbed (see module docstring).
    """

    def _decode(payload: bytes) -> list[float]:
        if not fake_decode:
            raise NotImplementedError(
                "media codecs not available in this environment; "
                "run with fake_decode=True or plug a real decoder")
        # Deterministic fake: bytes -> digest -> unit-range floats.
        digest = hashlib.blake2b(payload, digest_size=feature_dim * 2).digest()
        return [
            int.from_bytes(digest[2 * i : 2 * i + 2], "big") / 65535.0
            for i in range(feature_dim)
        ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            shas, nbytes, feats = [], [], []
            for payload in pdf[payload_col].tolist():
                if payload is None:
                    shas.append(None); nbytes.append(None); feats.append(None)
                    continue
                b = bytes(payload)
                shas.append(hashlib.sha256(b).hexdigest())
                nbytes.append(len(b))
                feats.append(_decode(b))
            yield pd.DataFrame({
                "url": pdf["url"], "content_sha": shas,
                "n_bytes": pd.array(nbytes, dtype="Int64"), "feature": feats,
            })

    return df.select("url", payload_col).mapInPandas(run, schema=_FEATURE_SCHEMA)


def exact_binary_dedup(df: DataFrame, payload_col: str = "html") -> DataFrame:
    """Exact media dedup: group by payload sha2 — the binary analog of the
    text content-hash groupBy."""
    return (
        df.withColumn("payload_sha", F.sha2(F.col(payload_col), 256))
        .groupBy("payload_sha")
        .agg(F.count(F.lit(1)).alias("n_copies"),
             F.min("url").alias("kept_url"))
    )
