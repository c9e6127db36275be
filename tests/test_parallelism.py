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


def test_curation_ops_partitioning_invariant(spark):
    """Repetition stats, boilerplate removal, and decontamination are
    value-deterministic at any partitioning/shuffle width."""
    from pysparkdedup.decontam import contamination
    from pysparkdedup.repetition import (
        drop_boilerplate_lines, repetition_stats, with_chunk_lines)

    outs = []
    for nparts, shuffle in ((2, "2"), (13, "17")):
        spark.conf.set("spark.sql.shuffle.partitions", shuffle)
        try:
            pages, _ = pages_and_truth(spark, 400, partitions=nparts)
            d = pages.select(
                F.col("url").alias("doc_id"), "text")
            rep = sorted(map(tuple, repetition_stats(d, n=2).collect()))
            lined = with_chunk_lines(d, 8).select("doc_id", "lines")
            boil = sorted(
                (r["doc_id"], r["n_lines"], r["n_dropped"], r["clean_text"])
                for r in drop_boilerplate_lines(lined, min_df=4).collect())
            bench = d.filter(F.crc32(F.col("doc_id")) % 37 == 0)
            con = sorted(map(tuple, contamination(d, bench, k=4).collect()))
            outs.append((rep, boil, con))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert outs[0] == outs[1]
