"""Parallelism-equivalence: output must be identical at any partitioning —
the reference's parallel==sequential guarantee (ref tests/test_cli.py:127-160,
deduplicate.py:855-867). Cross-process core-count equivalence is additionally
evidenced by tools/scaling_bench.py (crc-identical at local[2]/local[8])."""

from pyspark.sql import functions as F

from pysparkdedup.config import DedupConfig
from pysparkdedup.corpus import pages_and_truth
from pysparkdedup.minhash import minhash_clusters
from pysparkdedup.pipeline import run_clustered, run_exact


def snapshot(final):
    return sorted(
        (r["url"], r["status"], r["cluster_key"])
        for r in final.select("url", "status", "cluster_key").collect()
    )


def test_exact_pipeline_partitioning_invariant(spark):
    cfg = DedupConfig(strategies=("select-newest", "select-one"))
    outs = []
    for nparts, shuffle in ((2, "2"), (13, "17")):
        spark.conf.set("spark.sql.shuffle.partitions", shuffle)
        try:
            pages, _ = pages_and_truth(spark, 600, partitions=nparts)
            outs.append(snapshot(run_exact(pages, cfg)))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert outs[0] == outs[1]


def test_neardup_pipeline_partitioning_invariant(spark):
    cfg = DedupConfig(strategies=("select-newest", "select-one"))
    outs = []
    for nparts, shuffle in ((3, "3"), (11, "19")):
        spark.conf.set("spark.sql.shuffle.partitions", shuffle)
        try:
            pages, _ = pages_and_truth(spark, 400, partitions=nparts)
            clusters = minhash_clusters(pages, cfg)
            outs.append(snapshot(run_clustered(pages, cfg, clusters)))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert outs[0] == outs[1]
