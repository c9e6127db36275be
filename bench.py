"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": "...", "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Headline queries exercise the engine's hot paths end to end:
  exact_pipeline   — hash -> guards -> cascade -> label -> count by status
  minhash_cluster  — signatures -> LSH bands -> pairs -> verify -> components
  simhash_cluster  — simhash -> blocks -> pairs -> verify -> components
  ngram_jaccard    — exact shingle-Jaccard self-join
  cascade_events   — window strategy cascade on the events table
  token_quality    — text-analysis column pass
  embedding_topk   — brute-force cosine top-k
  curation_pass    — repetition stats + boilerplate-line removal +
                     benchmark decontamination (added round 4; earlier
                     rounds' totals cover the first 7 queries only)
  cross_corpus     — incremental-crawl dedup: new half vs old half's
                     precomputed signatures (added round 4)
  cross_corpus_warm— same, with the old side's exact/band/stats dims also
                     precomputed (the cross_dims checkpoint path; added
                     round 5 — totals before r5 exclude it)
  tiered_dedup     — exact -> near -> semantic cascade ledger over
                     documents + embeddings (added round 5)

The JSON also carries "runs" (every raw sample per query — medians and
spread are computable downstream) and "stages" (per-stage breakdown of the
two clustering queries: signature/pairs/verify/fixpoint) so a driver-side
regression can be localized despite host noise.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_benchmarks(spark, sf_dir: str) -> dict[str, float]:
    from pyspark.sql import functions as F

    from pysparkdedup.config import DedupConfig
    from pysparkdedup.minhash import minhash_clusters
    from pysparkdedup.ngram import jaccard_edges
    from pysparkdedup.pipeline import run_exact
    from pysparkdedup.simhash import simhash_clusters
    from pysparkdedup.similarity import cosine_topk
    from pysparkdedup.strategy import apply_cascade
    from pysparkdedup.textstats import detected_lang, quality_columns
    from __spark_entry__ import _docs_as_pages

    cfg = DedupConfig(strategies=("select-newest", "select-one"))
    pages = _docs_as_pages(spark, sf_dir)
    pages.cache().count()  # isolate scan cost from operator cost

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}

    def bench(name, fn, runs=2):
        # Best-of-N: the sandbox host has ±20-40% co-tenant noise and the
        # first execution pays one-time JIT/codegen; later runs are the
        # steady-state cost (same methodology as tools/scaling_bench.py —
        # fresh frames each run, so data-path work is NOT cached across
        # runs). The two clustering queries (historically the noisiest:
        # simhash_cluster spread 4.15-29.4 s across same-code runs) get
        # best-of-3. All raw samples ride the JSON so a reader can compute
        # medians and judge spread, not just the best.
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            times.append(round(time.perf_counter() - t0, 3))
        samples[name] = times
        timings[name] = min(times)

    bench("exact_pipeline",
          lambda: run_exact(pages, cfg).groupBy("status").count().collect())
    bench("minhash_cluster", lambda: minhash_clusters(pages, cfg).count(),
          runs=3)
    bench("simhash_cluster", lambda: simhash_clusters(pages, cfg).count(),
          runs=3)
    # df-cut at 100: the synthetic corpus has a ~31-token vocabulary, so
    # mid-frequency shingles explode the posting self-join quadratically;
    # discriminative power lives in the rare shingles (standard df-cut).
    bench("ngram_jaccard",
          lambda: jaccard_edges(pages, k=5, threshold=0.5, max_df=100).count())

    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("event_id").cast("string").alias("url"),
        F.col("user_id").cast("string").alias("cluster_key"),
        F.col("ts").alias("warc_ts"),
        F.coalesce(F.length("props"), F.lit(0)).alias("n_bytes"),
    )
    bench("cascade_events",
          lambda: apply_cascade(events, cfg).agg(
              F.sum(F.col("selected").cast("int"))).collect())

    bench("token_quality",
          lambda: quality_columns(pages).withColumn(
              "lang_pred", detected_lang()).agg(
              F.sum("n_tokens"), F.avg("quality_score")).collect())

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_pdf = emb.limit(50).toPandas().rename(
        columns={"vec_id": "query_id"})[["query_id", "embedding"]]
    bench("embedding_topk",
          lambda: cosine_topk(emb, queries_pdf, k=10).count())

    # Perceptual image near-dup (added round 7): synthetic PNGs from
    # doc_id (same generator as the image_dup_docs oracle), then the full
    # decode -> dHash -> pigeonhole-block join -> bit_count verify ->
    # union-find path. The Arrow decode kernel dominates; the join side is
    # bucketed, never all-pairs.
    from __spark_entry__ import _q_image_dup_docs

    bench("image_dup",
          lambda: _q_image_dup_docs(spark, sf_dir)
          .agg(F.count(F.lit(1)),
               F.countDistinct("cluster_key")).collect())

    # Curation pass (added round 4): repetition stats + boilerplate-line
    # removal + benchmark decontamination in one timing — the "filter the
    # corpus before training" path alongside dedup.
    from pysparkdedup.decontam import contamination
    from pysparkdedup.repetition import (
        drop_boilerplate_lines, repetition_stats, with_chunk_lines)

    docs = pages.select(F.col("url").alias("doc_id"), "text")

    def curation():
        repetition_stats(docs, n=2).agg(
            F.avg("dup_gram_frac"), F.max("top_gram_frac")).collect()
        lined = with_chunk_lines(docs, 10).select("doc_id", "lines")
        drop_boilerplate_lines(lined, min_df=5).agg(
            F.sum("n_dropped")).collect()
        bench_set = docs.filter(F.crc32("doc_id") % 97 == 0)
        contamination(docs, bench_set, k=5).agg(
            F.sum(F.col("contaminated").cast("int"))).collect()

    bench("curation_pass", curation)

    # Tiered dedup cascade (added round 5): exact -> MinHash-near ->
    # embedding-semantic, each tier over the previous tier's survivors;
    # the full ledger materialized. Semantic tier joins the embeddings
    # table on vec_id == url.
    from pysparkdedup.tiers import tiered_dedup

    bench("tiered_dedup",
          lambda: tiered_dedup(
              pages, cfg, emb=emb, emb_threshold=0.35,
              emb_kwargs={"n_tables": 16, "n_bits": 6})
          .groupBy("tier").count().collect())

    # End-to-end training-data pipeline (added round 6): the curation pass
    # (repetition filter + boilerplate + keep-first paragraph dedup + PII
    # redaction) staged once, then the tiered cascade over the CURATED
    # text — the composed verb a crawl takes into a training set. The
    # marginal cost vs curation_pass + tiered_dedup is the staging
    # materialization (trainpipe.py).
    from pysparkdedup.trainpipe import curate_and_dedup

    def pipeline():
        _cur, ledger = curate_and_dedup(
            pages, cfg, emb=emb, emb_threshold=0.35,
            emb_kwargs={"n_tables": 16, "n_bits": 6},
            curate_kwargs=dict(max_dup_gram_frac=0.15, boilerplate_min_df=5,
                               dedup_paragraphs=True, redact=True,
                               line_mode="chunk"))
        ledger.groupBy("tier").count().collect()

    bench("pipeline_pass", pipeline)

    # Cross-corpus incremental dedup (added round 4): even-url half is the
    # "previous crawl" (signatures computed once, outside the timing — the
    # checkpoint stand-in), odd half is the new batch being flagged.
    from pysparkdedup.checkpoint import compute_signatures
    from pysparkdedup.crosscorpus import dedup_against

    old_half = pages.filter(F.crc32("url") % 2 == 0)
    new_half = pages.filter(F.crc32("url") % 2 == 1)
    old_sigs = compute_signatures(old_half, cfg)
    old_sigs.cache().count()
    bench("cross_corpus",
          lambda: dedup_against(new_half, old_sigs, cfg)
          .groupBy("status").count().collect())

    # Warm incremental path (added round 5): the old side's exact dim, band
    # projection and bucket stats come precomputed — what a
    # cross_dims=True checkpoint commit persists — so the timed job does
    # zero old-side aggregations. The delta vs cross_corpus is the
    # per-run cost the persisted dims remove.
    from pysparkdedup.minhash import lsh_bands

    old_dims = {
        "exact_dim": old_sigs.groupBy("content_hash").agg(
            F.min("url").alias("url")),
        "bands": lsh_bands(old_sigs, cfg),
        "band_stats": lsh_bands(old_sigs, cfg)
        .groupBy("band_id", "band_hash")
        .agg(F.count(F.lit(1)).alias("n"), F.min("url").alias("rep_url")),
    }
    for df in old_dims.values():
        df.cache().count()
    bench("cross_corpus_warm",
          lambda: dedup_against(new_half, old_sigs, cfg, old_dims=old_dims)
          .groupBy("status").count().collect())
    for df in old_dims.values():
        df.unpersist()
    old_sigs.unpersist()

    # Per-stage breakdown of the two clustering queries (the noisiest):
    # one extra staged run each, so a driver-side regression can be
    # localized (signature vs pairs vs verify vs fixpoint) despite the
    # host's ±20-40% noise. Stage sums exceed the headline best-of-N
    # (each stage pays its own materialization); the split, not the sum,
    # is the signal.
    stages = {
        "minhash_cluster": _minhash_stage_times(pages, cfg),
        "simhash_cluster": _simhash_stage_times(pages, cfg),
        "tiered_dedup": _tiered_stage_times(pages, emb, cfg),
        "pipeline_pass": _pipeline_stage_times(pages, emb, cfg),
    }

    pages.unpersist()
    return timings, samples, stages


def _tiered_stage_times(pages, emb, cfg) -> dict[str, float]:
    """Per-tier breakdown of the cascade (added round 6, same protocol as
    the clustering splits): tiers.tiered_dedup's ``on_stage`` hook fires
    after each tier's eager loser-map materialization, so the laps time
    the REAL implementation (no parallel copy of the wiring to drift),
    then the chain-resolved ledger aggregation is the final lap."""
    from pysparkdedup.tiers import tiered_dedup

    st: dict[str, float] = {}
    t = time.perf_counter()

    def lap(name):
        nonlocal t
        now = time.perf_counter()
        st[name] = round(now - t, 3)
        t = now

    ledger = tiered_dedup(
        pages, cfg, emb=emb, emb_threshold=0.35,
        emb_kwargs={"n_tables": 16, "n_bits": 6}, on_stage=lap)
    ledger.groupBy("tier").count().collect()
    lap("ledger")
    return st


def _pipeline_stage_times(pages, emb, cfg) -> dict[str, float]:
    """Two-lap split of the composed verb: the curation pass up to and
    including its staging materialization (the barrier the composition
    adds) vs the tiered cascade over the staged frame — so a pipeline
    regression localizes to one half, and the cascade lap is directly
    comparable to the standalone tiered_dedup headline."""
    from pysparkdedup.curate import curate_pages
    from pysparkdedup.tiers import tiered_dedup

    st: dict[str, float] = {}
    t = time.perf_counter()

    def lap(name):
        nonlocal t
        now = time.perf_counter()
        st[name] = round(now - t, 3)
        t = now

    cur = curate_pages(
        pages, max_dup_gram_frac=0.15, boilerplate_min_df=5,
        dedup_paragraphs=True, redact=True,
        line_mode="chunk").localCheckpoint(eager=True)
    lap("curate_stage")
    tiered_dedup(cur, cfg, emb=emb, emb_threshold=0.35,
                 emb_kwargs={"n_tables": 16, "n_bits": 6}
                 ).groupBy("tier").count().collect()
    lap("cascade")
    return st


def _minhash_stage_times(pages, cfg) -> dict[str, float]:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from pysparkdedup.components import connected_components
    from pysparkdedup.minhash import (
        candidate_pairs, estimate_jaccard, lsh_bands, minhash_signatures)

    st: dict[str, float] = {}
    t = time.perf_counter()

    def lap(name):
        nonlocal t
        now = time.perf_counter()
        st[name] = round(now - t, 3)
        t = now

    sigs = minhash_signatures(pages, cfg).select("url", "minhash").persist(
        StorageLevel.MEMORY_AND_DISK)
    sigs.count()
    lap("signature")
    pairs = candidate_pairs(lsh_bands(sigs, cfg), cfg).persist(
        StorageLevel.MEMORY_AND_DISK)
    pairs.count()
    lap("pairs")
    edges = estimate_jaccard(pairs, sigs, cfg).filter(
        F.col("jaccard") >= cfg.jaccard_threshold).persist(
        StorageLevel.MEMORY_AND_DISK)
    edges.count()
    lap("verify")
    connected_components(edges.select("a", "b")).count()
    lap("fixpoint")
    for df in (sigs, pairs, edges):
        df.unpersist()
    return st


def _simhash_stage_times(pages, cfg) -> dict[str, float]:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from pysparkdedup.components import connected_components
    from pysparkdedup.pairs import bucket_pairs
    from pysparkdedup.simhash import simhash_blocks, simhash_signatures

    st: dict[str, float] = {}
    t = time.perf_counter()

    def lap(name):
        nonlocal t
        now = time.perf_counter()
        st[name] = round(now - t, 3)
        t = now

    sigs = simhash_signatures(pages).select("url", "simhash").persist(
        StorageLevel.MEMORY_AND_DISK)
    sigs.count()
    lap("signature")
    pairs = bucket_pairs(
        simhash_blocks(sigs, cfg), ["block_id", "block_val"], id_col="url",
        cap=cfg.max_bucket_size).dropDuplicates(["a", "b"]).persist(
        StorageLevel.MEMORY_AND_DISK)
    pairs.count()
    lap("pairs")
    sa = sigs.select(F.col("url").alias("a"), F.col("simhash").alias("_ha"))
    sb = sigs.select(F.col("url").alias("b"), F.col("simhash").alias("_hb"))
    edges = (
        pairs.join(sa, "a").join(sb, "b")
        .withColumn("hamming",
                    F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))))
        .filter(F.col("hamming") <= cfg.hamming_threshold)
        .select("a", "b").persist(StorageLevel.MEMORY_AND_DISK))
    edges.count()
    lap("verify")
    connected_components(edges).count()
    lap("fixpoint")
    for df in (sigs, pairs, edges):
        df.unpersist()
    return st


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pysparkdedup.session import get_spark

    spark = get_spark(app_name="pysparkdedup-bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    try:
        timings, samples, stages = run_benchmarks(spark, sf_dir)
    finally:
        spark.stop()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "pysparkdedup headline suite wall time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "runs": samples,
        "stages": stages,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": int(cpus),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
