"""Mega-cluster straggler probe: Window.partitionBy vs groupagg join-back.

Verdict r3 flagged the per-cluster decision aggregates as the one remaining
100x-scale soft spot: ``Window.partitionBy(cluster_key)`` sort-buffers each
group in ONE task, so a boilerplate mega-cluster (here ``frac`` of all rows
under a single key) serializes on one core no matter how many executors
exist. This probe measures the SAME per-group decision (group extremes +
newest-selection predicate, the cascade's hot pattern) both ways on a
planted-skew frame and asserts value-identical results:

  python tools/skew_probe.py [n_rows] [skew_frac] [cpus]

The window formulation's wall time is dominated by the single sorting task;
the groupagg formulation (partial map-side aggregation + AQE-splittable
join-back, what the engine ships since round 4) spreads the same rows over
all cores. Output: one JSON line with both timings. Methodology follows
bench.py: un-timed warmup, best-of-2 per variant, identical inputs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(spark, n: int, frac: float):
    from pyspark.sql import functions as F

    # frac of rows share ONE cluster key; the rest spread over n/8 keys.
    return (
        spark.range(n)
        .select(
            F.col("id").cast("string").alias("url"),
            F.when(F.col("id") % 1000 < int(frac * 1000), F.lit("MEGA"))
            .otherwise((F.col("id") % (F.lit(n) / 8)).cast("string"))
            .alias("cluster_key"),
            (F.col("id") % 86400).cast("timestamp").alias("ts"),
        )
    )


def decide_window(df):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("cluster_key")
    return (
        df.withColumn("_n", F.count(F.lit(1)).over(w))
        .withColumn("_max_ts", F.max("ts").over(w))
        .withColumn("_min_url", F.min("url").over(w))
        .withColumn("selected",
                    (F.col("_n") == 1) | (F.col("ts") == F.col("_max_ts")))
    )


def decide_groupagg(df):
    from pyspark.sql import functions as F

    from pysparkdedup.groupagg import with_group_stats

    j = with_group_stats(df, "cluster_key", [
        F.count(F.lit(1)).alias("_n"),
        F.max("ts").alias("_max_ts"),
        F.min("url").alias("_min_url"),
    ])
    return j.withColumn(
        "selected", (F.col("_n") == 1) | (F.col("ts") == F.col("_max_ts")))


def checksum(df):
    from pyspark.sql import functions as F

    return tuple(
        df.agg(
            F.count(F.lit(1)),
            F.sum(F.col("selected").cast("long")),
            F.sum(F.crc32(F.concat_ws("\x1f", "url", "selected"))),
        ).collect()[0]
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.25
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pysparkdedup.session import get_spark

    spark = get_spark(
        app_name="skew-probe", master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf={
            # Emulate the at-scale regime on a small probe: a real
            # 10^10-row mega-cluster partition is far past AQE's default
            # 256MB skew threshold; scale the threshold down with the probe
            # so the join-back splits here the way it would there. Windows
            # have NO equivalent mechanism — that asymmetry is the point.
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "8m",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
        })
    spark.sparkContext.setLogLevel("ERROR")
    df = build(spark, n, frac).persist()
    df.count()

    out = {"n_rows": n, "skew_frac": frac, "cpus": cpus}
    sums = {}
    for name, fn in (("window", decide_window), ("groupagg", decide_groupagg)):
        checksum(fn(df))  # un-timed warmup
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            sums[name] = checksum(fn(df))
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
        out[f"{name}_sec"] = round(best, 2)

    assert sums["window"] == sums["groupagg"], sums
    out["identical_output"] = True
    out["speedup"] = round(out["window_sec"] / out["groupagg_sec"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
