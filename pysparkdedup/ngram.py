"""Exact n-gram (word-shingle) Jaccard similarity self-join — no UDF.

The exact-verification counterpart to MinHash's estimate: for every doc pair
sharing at least one shingle, Jaccard = |A n B| / (|A| + |B| - |A n B|),
computed by exploding distinct shingles and counting co-occurrences — the
classic inverted-index similarity join, entirely in built-in functions (and
therefore ANSI-SQL-expressible for the DuckDB oracle).

Scale guards:
- shingles are df-cut: keys occurring in more than ``max_df`` docs are dropped
  (boilerplate shingles would otherwise square the join output);
- the per-pair count aggregation is a two-phase hash agg (map-side combine);
- output is filtered on the Jaccard threshold before any downstream join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_DF = 1000


def _shingles_expr(tokens: F.Column, k: int) -> F.Column:
    # Guarded for short docs: sequence(1, 0) DESCENDS in Spark ([1, 0]),
    # which would feed slice() a start of 0 and crash the job on the first
    # document with fewer than k tokens.
    return F.when(
        F.size(tokens) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - F.lit(k - 1)),
            lambda i: F.concat_ws(" ", F.slice(tokens, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def with_shingles(df: DataFrame, k: int, text_col: str = "text",
                  out_col: str = "shingles") -> DataFrame:
    tokens = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"[^\p{L}\p{N}_]+"),
        lambda t: t != "",
    )
    # Materialize tokens first: referencing the tokenize expression inside the
    # transform lambda would re-evaluate split+filter once per shingle slice
    # (no CSE inside lambda bodies) — O(len^2) per doc.
    return (
        df.withColumn("_toks", tokens)
        .withColumn(out_col, F.array_distinct(_shingles_expr(F.col("_toks"), k)))
        .drop("_toks")
    )


def jaccard_edges(df: DataFrame, k: int = 5, threshold: float = 0.8,
                  id_col: str = "url", text_col: str = "text",
                  max_df: int = DEFAULT_MAX_DF) -> DataFrame:
    """(a, b, jaccard) for pairs with exact shingle-Jaccard >= threshold."""
    from pyspark import StorageLevel

    sh = with_shingles(df, k, text_col).select(
        F.col(id_col).alias("_id"), "shingles"
    ).withColumn("_nsh", F.size("shingles")).filter(F.col("_nsh") > 0)

    # The posting list feeds the df-cut aggregation AND both self-join sides;
    # persist or the shingle computation runs three times.
    from .cache import track

    posting = sh.select("_id", "_nsh", F.explode("shingles").alias("sh"))
    posting = track(posting.persist(StorageLevel.MEMORY_AND_DISK))
    freq = posting.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
    hot = freq.filter(F.col("_df") > max_df).select("sh")
    posting = posting.join(F.broadcast(hot), "sh", "left_anti")

    left = posting.select(
        F.col("_id").alias("a"), F.col("_nsh").alias("_na"), "sh")
    right = posting.select(
        F.col("_id").alias("b"), F.col("_nsh").alias("_nb"), "sh")
    inter = (
        left.join(right, "sh")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b", "_na", "_nb")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    jac = inter.withColumn(
        "jaccard",
        F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter")),
    )
    return jac.filter(F.col("jaccard") >= threshold).select("a", "b", "jaccard")
