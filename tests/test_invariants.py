"""The input_hint per-row invariant: byte-identical extracted text per url —
the pipeline derives columns but never rewrites ``text``
(ref: normalized forms are derived, mail.py:431-439 never mutates body)."""

from pyspark.sql import functions as F

from pysparkdedup.config import DedupConfig
from pysparkdedup.corpus import pages_and_truth
from pysparkdedup.minhash import minhash_clusters
from pysparkdedup.pipeline import run_clustered, run_exact


def test_text_byte_identical_through_exact_pipeline(spark):
    pages, _ = pages_and_truth(spark, 800)
    cfg = DedupConfig(strategies=("select-newest", "select-one"))
    final = run_exact(pages, cfg)
    joined = final.select("url", F.col("text").alias("out_text")).join(
        pages.select("url", "text"), "url")
    mismatches = joined.filter(
        ~F.col("out_text").eqNullSafe(F.col("text"))).count()
    assert mismatches == 0
    assert final.count() == pages.count()  # every row accounted for


def test_text_byte_identical_through_neardup_pipeline(spark):
    pages, _ = pages_and_truth(spark, 500)
    cfg = DedupConfig(strategies=("select-newest", "select-one"))
    final = run_clustered(pages, cfg, minhash_clusters(pages, cfg))
    joined = final.select("url", F.col("text").alias("out_text")).join(
        pages.select("url", "text"), "url")
    assert joined.filter(
        ~F.col("out_text").eqNullSafe(F.col("text"))).count() == 0
