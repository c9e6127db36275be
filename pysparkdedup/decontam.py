"""Benchmark decontamination: flag corpus documents that overlap an
evaluation set.

Standard practice for training corpora (GPT-3 appendix C, Dolma, FineWeb):
any document sharing enough word n-grams with a benchmark/eval document is
"contaminated" and must be dropped or flagged before training. This is the
corpus-vs-reference-set counterpart of the engine's corpus-vs-itself n-gram
dedup (ngram.py), sharing its shingle definition.

Spark-first shape: the benchmark side is tiny relative to the corpus
(thousands of eval documents vs 10^12 pages), so its distinct shingles are
the broadcast side of an equi-join against the corpus's exploded shingles —
the 100-TB corpus side NEVER shuffles (broadcast hash join straight after
the generate), and the per-document overlap count is a map-side partial
aggregation on doc id. No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ngram import with_shingles


def benchmark_shingles(
    benchmark: DataFrame, k: int, text_col: str = "text",
) -> DataFrame:
    """Distinct word k-shingles of the benchmark set — the broadcast dim."""
    return (
        with_shingles(benchmark, k, text_col)
        .select(F.explode("shingles").alias("sh"))
        .distinct()
    )


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_overlap: int = 1,
) -> DataFrame:
    """Per-document benchmark overlap: one row per corpus document with

    - ``n_shingles``   : the document's distinct k-shingles;
    - ``n_overlap``    : how many of them occur anywhere in the benchmark;
    - ``overlap_frac`` : n_overlap / n_shingles (0.0 for shingle-free docs),
      rounded to 4 decimals;
    - ``contaminated`` : n_overlap >= ``min_overlap``.

    Shingle definition is ngram.with_shingles' (lowercased word k-grams,
    distinct per doc), so thresholds transfer between self-dedup and
    decontamination.
    """
    bench = F.broadcast(
        benchmark_shingles(benchmark, k, text_col)
        .withColumn("_hit", F.lit(1)))

    # Single pass over the corpus shingles: n_shingles rides the explode so
    # the shingle computation runs once, the broadcast LEFT join marks
    # benchmark matches without dropping rows (zero-overlap docs stay), and
    # one partial-aggregated groupBy on id folds everything. Shingles are
    # distinct per doc already, so count(_hit) IS the distinct-overlap count.
    exploded = with_shingles(corpus, k, text_col).select(
        F.col(id_col),
        F.size("shingles").cast("long").alias("_ns"),
        F.explode_outer("shingles").alias("sh"),
    )
    out = exploded.join(bench, "sh", "left").groupBy(id_col).agg(
        F.max("_ns").alias("n_shingles"),
        F.count("_hit").alias("n_overlap"),
    )
    safe = F.greatest(F.col("n_shingles"), F.lit(1)).cast("double")
    return out.select(
        id_col,
        "n_shingles",
        "n_overlap",
        F.round(F.col("n_overlap") / safe, 4).alias("overlap_frac"),
        (F.col("n_overlap") >= F.lit(min_overlap)).alias("contaminated"),
    )
