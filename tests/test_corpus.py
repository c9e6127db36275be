"""Corpus generator tests: determinism across parallelism + planted structure."""

from pyspark.sql import functions as F

from pysparkdedup.corpus import generate_pages, pages_and_truth


def test_deterministic_across_partitionings(spark):
    """Same (n, seed) at different partition counts => byte-identical rows —
    the property behind parallel==sequential output (ref tests/test_cli.py:127)."""
    a = generate_pages(spark, 400, partitions=2).orderBy("url").collect()
    b = generate_pages(spark, 400, partitions=13).orderBy("url").collect()
    assert a == b


def test_planted_structure(spark):
    pages, truth = pages_and_truth(spark, 1000)
    kinds = {r["dup_kind"] for r in truth.select("dup_kind").distinct().collect()}
    assert {"boilerplate", "exact", "whitespace", "unique", "malformed"} <= kinds

    # exact groups share identical text
    joined = pages.join(truth, "url")
    ex = joined.filter(F.col("dup_kind") == "exact")
    per_group = ex.groupBy("true_cluster").agg(
        F.countDistinct("text").alias("nt"), F.count("*").alias("n")
    )
    rows = per_group.collect()
    assert rows and all(r["nt"] == 1 and r["n"] >= 2 for r in rows)

    # whitespace groups: distinct raw text, one normalized form
    ws = joined.filter(F.col("dup_kind") == "whitespace")
    per_group = ws.groupBy("true_cluster").agg(
        F.countDistinct("text").alias("raw"),
        F.countDistinct(F.regexp_replace("text", r"\s", "")).alias("norm"),
        F.count("*").alias("n"),
    )
    rows = per_group.collect()
    assert rows and all(r["raw"] == r["n"] and r["norm"] == 1 for r in rows)

    # substring pairs: short text contained in long text
    sub = (
        joined.filter(F.col("dup_kind") == "substring")
        .groupBy("true_cluster")
        .agg(F.collect_list("text").alias("texts"))
        .collect()
    )
    assert sub
    for r in sub:
        texts = sorted(r["texts"], key=len)
        assert len(texts) == 2 and texts[0] in texts[1]

    # undated rows carry NULL warc_ts
    und = joined.filter(F.col("dup_kind") == "undated")
    assert und.filter(F.col("warc_ts").isNotNull()).count() == 0
    assert und.count() > 0
