"""Skew-aware candidate-pair generation from bucket keys.

Shared by MinHash-LSH band buckets and SimHash block buckets. This is the
explicit skew engineering the north_rule requires — the scale analog of the
reference's set-level short-circuit that keeps a 200-copy set O(n), never
O(n^2) (ref deduplicate.py:292-301, tests/test_performance.py:316-341):

- **cold buckets** (size <= cap): full pairwise candidates, generated JVM-side
  from a sorted ``collect_list`` via nested ``transform`` — no Python, no
  self-join (one shuffle instead of two).
- **hot buckets** (size > cap, e.g. boilerplate mega-clusters): salted
  two-level star. Members pair with their salt-partition leader (window min —
  no array ever materializes, so a 10^10-row bucket costs O(n) rows and
  bounded memory), then the <= nsalt salt leaders pair with the bucket leader.
  Stars preserve bucket connectivity for union-find at O(n) pairs; the
  full-pairwise recall inside hot buckets is deliberately traded away and the
  degradation is observable via ``hot_bucket_count`` (no silent truncation).

Hot-bucket detection is a count aggregation broadcast back — the hot set is
tiny by definition (skew means few keys), so the join adds no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CAP = 2000
DEFAULT_NSALT = 64


def bucket_pairs(
    df: DataFrame,
    bucket_cols: list[str],
    id_col: str = "url",
    cap: int = DEFAULT_CAP,
    nsalt: int = DEFAULT_NSALT,
) -> DataFrame:
    """Emit candidate pairs (a, b) with a < b from every bucket.

    Input: one row per (bucket..., id). Output columns: ``a``, ``b``.
    """
    ids = df.select(*bucket_cols, F.col(id_col).alias("_id"))

    sizes = ids.groupBy(*bucket_cols).agg(F.count(F.lit(1)).alias("_bsize"))
    hot_keys = sizes.filter(F.col("_bsize") > cap).drop("_bsize")
    flagged = ids.join(
        F.broadcast(hot_keys.withColumn("_hot", F.lit(True))),
        on=bucket_cols,
        how="left",
    )

    # --- cold: full pairwise via sorted members array, all JVM ------------
    cold = (
        flagged.filter(F.col("_hot").isNull())
        .groupBy(*bucket_cols)
        .agg(F.sort_array(F.collect_list("_id")).alias("_ms"))
        .filter(F.size("_ms") >= 2)
    )
    cold_pairs = cold.select(
        F.explode(
            F.expr(
                "flatten(transform(_ms, (x, i) -> "
                "transform(slice(_ms, i + 2, size(_ms)), y -> struct(x AS a, y AS b))))"
            )
        ).alias("p")
    ).select("p.a", "p.b")

    # --- hot: salted two-level star, window-only (no arrays) --------------
    hot = flagged.filter(F.col("_hot").isNotNull()).withColumn(
        "_salt", F.pmod(F.xxhash64("_id"), F.lit(nsalt))
    )
    w_salt = Window.partitionBy(*bucket_cols, "_salt")
    hot_leaders = hot.withColumn("_sleader", F.min("_id").over(w_salt))
    level1 = hot_leaders.filter(F.col("_id") != F.col("_sleader")).select(
        F.col("_sleader").alias("a"), F.col("_id").alias("b")
    )
    w_bucket = Window.partitionBy(*bucket_cols)
    leaders = hot_leaders.select(*bucket_cols, "_sleader").distinct()
    level2 = (
        leaders.withColumn("_bleader", F.min("_sleader").over(w_bucket))
        .filter(F.col("_sleader") != F.col("_bleader"))
        .select(F.col("_bleader").alias("a"), F.col("_sleader").alias("b"))
    )

    return cold_pairs.unionByName(level1).unionByName(level2)


def hot_bucket_count(df: DataFrame, bucket_cols: list[str],
                     cap: int = DEFAULT_CAP) -> int:
    """Observability for the degraded path: how many buckets ran as stars."""
    return (
        df.groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > cap)
        .count()
    )
