"""Table sources — the reference's multi-format box layer for tables.

The reference opens 6 mailbox formats with autodetection
(ref mail_box.py:243-268 BoxFormat, :353-397 autodetect) and walks loose
``.eml`` trees (ref mail_box.py:128-232). The table analog:

- ``read_pages``   : format-dispatched reader normalizing any supported input
                     into the canonical pages schema
- ``autodetect``   : sniff parquet/json/csv/raw-file trees from the path
                     contents (≈ autodetect_box_type)
- ``binaryFile``   : the many-small-files scan (one file = one page), the
                     analog of the EML folder walker — deterministic by path
- source self-dedup: duplicate registrations rejected
                     (ref deduplicate.py:936-956) via dropDuplicates on url

All readers emit: url, warc_ts, html, text, lang (input_hint schema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FORMATS = ("parquet", "json", "csv", "files")


def autodetect(path: str) -> str:
    """Sniff the source format from directory contents
    (≈ ref mail_box.py:353-397)."""
    if os.path.isdir(path):
        names = os.listdir(path)
        if any(n.endswith(".parquet") for n in names):
            return "parquet"
        if any(n.endswith(".json") or n.endswith(".jsonl") for n in names):
            return "json"
        if any(n.endswith(".csv") for n in names):
            return "csv"
        return "files"
    if path.endswith(".parquet"):
        return "parquet"
    if path.endswith((".json", ".jsonl")):
        return "json"
    if path.endswith(".csv"):
        return "csv"
    return "files"


def _normalize_columns(df: DataFrame) -> DataFrame:
    cols = set(df.columns)
    out = df
    if "url" not in cols and "doc_id" in cols:
        out = out.withColumn("url", F.col("doc_id").cast("string"))
    if "warc_ts" not in cols:
        out = out.withColumn("warc_ts", F.lit(None).cast("timestamp"))
    if "html" not in out.columns:
        out = out.withColumn("html", F.lit(None).cast("binary"))
    if "lang" not in out.columns:
        out = out.withColumn("lang", F.lit(None).cast("string"))
    return out.select("url", "warc_ts", "html", "text", "lang")


def read_pages(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """Open one source as the canonical pages frame (≈ ref open_box)."""
    fmt = fmt or autodetect(path)
    if fmt == "parquet":
        return _normalize_columns(spark.read.parquet(path))
    if fmt == "json":
        return _normalize_columns(spark.read.json(path))
    if fmt == "csv":
        return _normalize_columns(
            spark.read.option("header", "true").csv(path))
    if fmt == "files":
        # many-small-files scan: one file = one page (≈ the EML walker,
        # ref mail_box.py:128-232); deterministic identity = file path.
        raw = spark.read.format("binaryFile").load(path + "/*")
        return raw.select(
            F.col("path").alias("url"),
            F.col("modificationTime").alias("warc_ts"),
            F.col("content").alias("html"),
            F.decode(F.col("content"), "utf-8").alias("text"),
            F.lit(None).cast("string").alias("lang"),
        )
    raise ValueError(f"unknown source format: {fmt!r}")


def union_sources(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Register several sources; duplicate source paths are rejected and
    duplicate row identities self-dedup (ref deduplicate.py:936-956)."""
    seen: list[str] = []
    frames: list[DataFrame] = []
    for p in paths:
        norm = os.path.realpath(p)
        if norm in seen:
            continue  # duplicate source registration (counted by caller)
        seen.append(norm)
        frames.append(read_pages(spark, p))
    if not frames:
        raise ValueError("no sources")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.dropDuplicates(["url"])
