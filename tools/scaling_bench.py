"""Scaling-efficiency evidence: the same job at two parallelism levels.

The north_rule requires throughput scaling efficiency >= 0.8 between N and 4N
executors. No real cluster exists in this sandbox, so (per BASELINE.md) cores
stand in for executors: the identical job runs on the identical input at
local[N] and local[4N], and efficiency = (T_N / T_4N) / 4. The headline
pair is local[1] -> local[4] (both levels below this VM's shared memory-bus
bandwidth ceiling, the resource a real multi-executor cluster does not
share); local[2] -> local[8] runs are reported as supporting evidence.

Methodology:
- each level runs in a FRESH subprocess (the py4j JVM persists across
  SparkSessions within a process, so JIT/codegen warmup would otherwise be
  charged entirely to whichever level runs first);
- each subprocess does one un-timed warmup run on a small slice (JIT, codegen
  caches, Python worker pool), then times the full job — steady-state
  throughput, the quantity that matters at cluster scale;
- output equality across levels (count + crc of (url, status)) doubles as the
  determinism-under-parallelism check (ref tests/test_cli.py:127-160).

Jobs (5th positional arg, default ``neardup``):
- ``neardup``: the flagship near-dup pipeline — MinHash signatures -> LSH
  bands -> skew-aware candidate pairs -> Jaccard verify -> union-find
  components -> content-hash pipeline tail (guards + cascade + labeling).
- ``curate``: the training-data curation pass (curate.curate_pages) —
  Gopher repetition filter -> CCNet boilerplate removal -> Dolma keep-first
  paragraph dedup -> PII redaction; crc over (url, curated text).
- ``tiered``: the tiered dedup cascade (tiers.tiered_dedup) — exact ->
  MinHash-near -> embedding-semantic over hash-derived deterministic
  vectors for a tenth of the corpus; crc over (url, tier, kept_by).
- ``pipeline``: the composed verb (trainpipe.curate_and_dedup) — the
  curate job feeding the tiered job over the CURATED text (+ drop_empty);
  crc over the final ledger.
- ``imagededup``: perceptual image near-dup (multimodal.image_dedup_ledger)
  over deterministic synthetic PNG families derived from xxhash64(url);
  crc over the (url, dhash, cluster_key) ledger.

Usage: python tools/scaling_bench.py [n_docs] [low_cpus] [high_cpus] [runs] [job]
Writes bench_scaling.json (neardup) / bench_scaling_curate.json (curate)
and prints a markdown row for BASELINE.md. ``runs`` (default 3) = timed
repetitions per level, best-of-N; 2 is enough at multi-M-doc corpus sizes
where a run is minutes long and co-tenant noise averages out within the run.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Input dirs are keyed by (job, n) via SCALING_DATA_DIR so two harness
# invocations (or a smoke test sharing this module) can never clobber a
# measurement in flight; workers inherit the exact path from the
# orchestrator through the environment.
_DATA_ROOT = os.environ.get("SCALING_DATA_DIR", "/tmp/scaling_data")
CORPUS = os.path.join(_DATA_ROOT, "corpus")
WARMUP = os.path.join(_DATA_ROOT, "warmup")


def build_input(n: int) -> None:
    from pysparkdedup.corpus import pages_and_truth
    from pysparkdedup.session import get_spark

    spark = get_spark(app_name="scaling-gen", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    pages, _ = pages_and_truth(spark, n, partitions=128)
    pages.write.mode("overwrite").parquet(CORPUS)
    # warmup set must span >= all cores' python workers (JIT + import warmup)
    warm, _ = pages_and_truth(spark, 8000, partitions=128)
    warm.write.mode("overwrite").parquet(WARMUP)
    spark.stop()


def _job_neardup(spark, path: str):
    from pyspark.sql import functions as F

    from pysparkdedup.config import DedupConfig
    from pysparkdedup.minhash import minhash_clusters
    from pysparkdedup.pipeline import run_clustered

    cfg = DedupConfig(strategies=("select-newest", "select-one"))
    pages = spark.read.parquet(path)
    clusters = minhash_clusters(pages, cfg)
    final = run_clustered(pages, cfg, clusters)
    row = (
        final.select("url", "status")
        .withColumn("line", F.concat_ws("\x1f", "url", "status"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.crc32("line")).alias("crc"))
        .collect()[0]
    )
    return int(row["n"]), int(row["crc"])


def _job_curate(spark, path: str):
    from pyspark.sql import functions as F

    from pysparkdedup.curate import curate_pages

    pages = spark.read.parquet(path)
    out = curate_pages(
        pages, max_dup_gram_frac=0.3, boilerplate_min_df=20,
        dedup_paragraphs=True, redact=True, line_mode="chunk")
    row = (
        out.select("url", "text")
        .withColumn("line", F.concat_ws(
            "\x1f", "url", F.sha2(F.coalesce("text", F.lit("")), 256)))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.crc32("line")).alias("crc"))
        .collect()[0]
    )
    return int(row["n"]), int(row["crc"])


def _job_tiered(spark, path: str):
    from pyspark.sql import functions as F

    from pysparkdedup.config import DedupConfig
    from pysparkdedup.tiers import tiered_dedup

    cfg = DedupConfig()
    pages = spark.read.parquet(path)
    # Deterministic synthetic embeddings for a tenth of the corpus (the
    # docs that carry vectors in a real lakehouse are likewise a subset):
    # 16 dims derived from xxhash64(url, dim) — parallelism-independent,
    # so the cascade's crc check still gates determinism end to end.
    # vec_id is the url itself (hyperplane_buckets supports string ids).
    emb = (
        pages.filter(F.crc32("url") % 10 == 0)
        .select(
            F.col("url").alias("vec_id"),
            F.array(*[
                ((F.xxhash64("url", F.lit(d)) % 1000) / 500.0 - 1.0)
                .cast("float") for d in range(16)
            ]).alias("embedding"),
        )
    )
    ledger = tiered_dedup(pages, cfg, emb=emb, emb_threshold=0.95)
    row = (
        ledger.withColumn(
            "line", F.concat_ws("\x1f", "url", "tier", "kept_by"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.crc32("line")).alias("crc"))
        .collect()[0]
    )
    return int(row["n"]), int(row["crc"])


def _job_pipeline(spark, path: str):
    """The composed verb (trainpipe.curate_and_dedup): the curate job's
    settings feeding the tiered job's cascade over the CURATED text, with
    the same hash-derived deterministic embeddings as _job_tiered;
    drop_empty closes the blank-husk hole keep-first dedup opens ahead of
    the exact tier. crc over the final ledger."""
    from pyspark.sql import functions as F

    from pysparkdedup.config import DedupConfig
    from pysparkdedup.trainpipe import curate_and_dedup

    cfg = DedupConfig()
    pages = spark.read.parquet(path)
    emb = (
        pages.filter(F.crc32("url") % 10 == 0)
        .select(
            F.col("url").alias("vec_id"),
            F.array(*[
                ((F.xxhash64("url", F.lit(d)) % 1000) / 500.0 - 1.0)
                .cast("float") for d in range(16)
            ]).alias("embedding"),
        )
    )
    _cur, ledger = curate_and_dedup(
        pages, cfg, emb=emb, emb_threshold=0.95,
        curate_kwargs=dict(max_dup_gram_frac=0.3, boilerplate_min_df=20,
                           dedup_paragraphs=True, redact=True,
                           drop_empty=True, line_mode="chunk"))
    row = (
        ledger.withColumn(
            "line", F.concat_ws("\x1f", "url", "tier", "kept_by"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.crc32("line")).alias("crc"))
        .collect()[0]
    )
    return int(row["n"]), int(row["crc"])


def _job_imagededup(spark, path: str):
    """Perceptual image near-dup at corpus scale
    (multimodal.image_dedup_ledger): deterministic synthetic PNGs derived
    from xxhash64(url) — ~n/4 duplicate families whose members render at
    scales 1-3 (resized copies) with a one-cell perturbation on ~1/11 of
    members (nonzero-Hamming near copies) — then the full decode -> dHash
    -> pigeonhole-block join -> bit_count verify -> union-find path. PNG
    synthesis rides the measured job the way decode would on a real corpus
    read. Family pixel content is a blake2b digest (72 bytes = the 9x8
    grid), so distinct families sit ~32 Hamming bits apart and clusters
    equal families; crc over the full (url, dhash, cluster_key) ledger
    gates determinism across parallelism."""
    from pyspark.sql import functions as F

    from pysparkdedup.multimodal import image_dedup_ledger

    pages = spark.read.parquet(path)
    n_fam = max(int(pages.count()) // 4, 1)
    # slim deterministic image parameters, derived JVM-side; the Python
    # kernel only renders
    src = pages.select(
        "url",
        F.pmod(F.xxhash64("url"), F.lit(n_fam)).alias("_fam"),
        (1 + F.pmod(F.xxhash64("url", F.lit(1)), F.lit(3))).alias("_scale"),
        F.pmod(F.xxhash64("url", F.lit(2)), F.lit(11)).alias("_pert"),
        F.pmod(F.xxhash64("url", F.lit(3)), F.lit(9)).alias("_px"),
        F.pmod(F.xxhash64("url", F.lit(4)), F.lit(8)).alias("_py"),
    )

    def gen(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        from pysparkdedup.multimodal import png_encode_gray

        for pdf in batches:
            payloads = []
            for fam, s, pert, px, py in zip(
                    pdf["_fam"], pdf["_scale"], pdf["_pert"],
                    pdf["_px"], pdf["_py"]):
                key = b"fam:%d" % int(fam)
                raw = (hashlib.blake2b(key, digest_size=64).digest()
                       + hashlib.blake2b(key + b":1", digest_size=8).digest())
                g = np.frombuffer(raw, np.uint8).reshape(8, 9).copy()
                if int(pert) == 0:
                    g[int(py), int(px)] = (int(g[int(py), int(px)]) + 96) % 256
                s = int(s)
                big = np.kron(g, np.ones((s, s), np.uint8))
                payloads.append(png_encode_gray(9 * s, 8 * s, big.tobytes()))
            yield pd.DataFrame({"url": pdf["url"], "html": payloads})

    images = src.mapInPandas(gen, "url string, html binary")
    ledger = image_dedup_ledger(images).persist()
    row = (
        ledger.withColumn(
            "line", F.concat_ws("\x1f", "url", "dhash", "cluster_key"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.crc32("line")).alias("crc"))
        .collect()[0]
    )
    # Cluster-structure sanity on stderr (crc alone cannot see a recall
    # collapse — a ledger of all singletons is perfectly deterministic):
    # with ~n/4 planted families, most images must sit in >=2-member
    # clusters. Not part of the timed contract line (stdout json only).
    dup = (
        ledger.groupBy("cluster_key").count()
        .filter(F.col("count") >= 2)
        .agg(F.coalesce(F.sum("count"), F.lit(0)).alias("dup_images"))
        .collect()[0]
    )
    print(f"imagededup: {int(dup['dup_images'])}/{int(row['n'])} images "
          f"in multi-member clusters", file=sys.stderr)
    ledger.unpersist()
    return int(row["n"]), int(row["crc"])


JOBS = {"neardup": _job_neardup, "curate": _job_curate,
        "tiered": _job_tiered, "pipeline": _job_pipeline,
        "imagededup": _job_imagededup}


def worker(cpus: int, runs: int = 3, job: str = "neardup") -> None:
    from pysparkdedup.session import get_spark

    run_job = JOBS[job]
    spark = get_spark(
        app_name=f"scaling-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 16),
        extra_conf={
            # guarantee >= 2x cores scan splits on the ~1MB/file corpus
            "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": "0",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    run_job(spark, WARMUP)  # un-timed warmup: JIT, codegen, python workers
    best = None
    for _ in range(runs):  # best-of-N: the sandbox host has co-tenant noise
        t0 = time.perf_counter()
        n, crc = run_job(spark, CORPUS)
        elapsed = time.perf_counter() - t0
        if best is None or elapsed < best:
            best = elapsed
    spark.stop()
    print(json.dumps({"cpus": cpus, "seconds": round(best, 2),
                      "rows": n, "crc": crc}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]),
               runs=int(sys.argv[3]) if len(sys.argv) > 3 else 3,
               job=sys.argv[4] if len(sys.argv) > 4 else "neardup")
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    job = sys.argv[5] if len(sys.argv) > 5 else "neardup"
    assert job in JOBS, f"unknown job {job!r}"

    global _DATA_ROOT, CORPUS, WARMUP
    if "SCALING_DATA_DIR" not in os.environ:
        _DATA_ROOT = f"/tmp/scaling_data_{job}_{n}"
        CORPUS = os.path.join(_DATA_ROOT, "corpus")
        WARMUP = os.path.join(_DATA_ROOT, "warmup")
    print(f"generating corpus n={n} -> {CORPUS}")
    build_input(n)

    results = {}
    env = dict(os.environ, SCALING_DATA_DIR=_DATA_ROOT)
    for cpus in (low, high):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(cpus), str(runs), job],
            capture_output=True, text=True, cwd=REPO, check=False, env=env)
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if not lines:
            sys.stderr.write(proc.stderr[-4000:])
            raise SystemExit(
                f"worker local[{cpus}] produced no result (stderr above)")
        r = json.loads(lines[-1])
        r["docs_per_sec"] = round(n / r["seconds"], 1)
        results[cpus] = r
        print(f"local[{cpus}]: {r['seconds']}s  {r['docs_per_sec']:,} docs/s  "
              f"rows={r['rows']} crc={r['crc']}")

    t_low, t_high = results[low]["seconds"], results[high]["seconds"]
    ratio = high // low
    out = {
        "job": job,
        "n_docs": n,
        "low_cpus": low,
        "high_cpus": high,
        "runs_per_level": runs,
        "results": {str(k): v for k, v in results.items()},
        "speedup": round(t_low / t_high, 3),
        "scaling_efficiency": round((t_low / t_high) / ratio, 3),
        "identical_output": (
            results[low]["rows"] == results[high]["rows"]
            and results[low]["crc"] == results[high]["crc"]
        ),
    }
    out_name = ("bench_scaling.json" if job == "neardup"
                else f"bench_scaling_{job}.json")
    with open(os.path.join(REPO, out_name), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))
    shutil.rmtree(_DATA_ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
