"""Cross-corpus (incremental-crawl) deduplication.

The monthly-crawl workflow: a NEW batch of pages must be deduplicated
AGAINST an existing reference corpus (the previous crawls) without touching
or recomputing the old side — its committed signature checkpoint
(checkpoint.py: url, content_hash, minhash, ...) IS the old corpus here.
This generalizes the reference's one-box incremental run (new mails vs the
SQLite hash cache, ref deduplicate.py:869-886 + cache.py) to two corpora of
independent scale.

Pipeline (all JVM joins, skew-aware):
1. exact:  new content_hash equi-join against the old corpus's
   hash->min(url) representative map — one shuffle of (hash, url) pairs.
2. near:   exact-unique new docs only (anti-join first: at a typical 30-60%
   re-crawl overlap the LSH stage sees a fraction of the batch) ride MinHash
   LSH banding against the old bands; band buckets that are HOT on the old
   side (boilerplate) degrade to a single representative old member —
   a new doc needs one witness to be flagged, so connectivity-style
   completeness is unnecessary and the degrade is exact for the
   is-duplicate verdict whenever the representative verifies; the loss
   (rep fails verify, another hot-bucket member would have passed) is the
   same observable trade pairs.py makes, surfaced via
   ``hot_old_bucket_count``.
3. verify: candidate (new, old) pairs score signature-jaccard
   (zip_with/aggregate column algebra, no UDF); best match per new doc
   picked deterministically (highest jaccard, then smallest old url).

Output: one row per new page — (url, status exact_dup|near_dup|unique,
dup_of, jaccard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import DedupConfig
from .minhash import lsh_bands, minhash_signatures

DEFAULT_CROSS_CAP = 2000


def cross_candidate_pairs(
    new_bands: DataFrame,
    old_bands: DataFrame,
    cap: int = DEFAULT_CROSS_CAP,
) -> DataFrame:
    """Distinct (url, old_url) pairs sharing >= 1 LSH band bucket.

    Old-side bucket sizes gate the join: cold buckets join in full; hot
    buckets (> ``cap`` old members) contribute only their min-url
    representative, broadcast — bounded pairs per new doc, no quadratic
    bucket blowup, exactly the skew posture of pairs.bucket_pairs but
    asymmetric (the new side is never collected or capped).
    """
    keys = ["band_id", "band_hash"]
    sizes = old_bands.groupBy(*keys).agg(F.count(F.lit(1)).alias("_bn"))

    cold_old = old_bands.join(
        sizes.filter(F.col("_bn") <= cap).select(*keys), keys)
    cold = new_bands.join(
        cold_old.select(*keys, F.col("url").alias("old_url")), keys)

    hot_reps = (
        old_bands.join(
            F.broadcast(sizes.filter(F.col("_bn") > cap).select(*keys)),
            keys)
        .groupBy(*keys)
        .agg(F.min("url").alias("old_url"))
    )
    hot = new_bands.join(F.broadcast(hot_reps), keys)

    return (
        cold.select("url", "old_url")
        .unionByName(hot.select("url", "old_url"))
        .dropDuplicates(["url", "old_url"])
    )


def hot_old_bucket_count(old_bands: DataFrame,
                         cap: int = DEFAULT_CROSS_CAP) -> int:
    """How many old-side band buckets degraded to a representative —
    the observability hook for the recall trade documented above."""
    return (
        old_bands.groupBy("band_id", "band_hash")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .filter(F.col("_bn") > cap)
        .count()
    )


def _cross_jaccard(pairs: DataFrame, new_sigs: DataFrame,
                   old_sigs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(url, old_url, jaccard) — fraction of equal MinHash positions."""
    a = new_sigs.select("url", F.col("minhash").alias("_sig_a"))
    b = old_sigs.select(
        F.col("url").alias("old_url"), F.col("minhash").alias("_sig_b"))
    joined = pairs.join(a, "url").join(b, "old_url")
    matches = F.aggregate(
        F.zip_with("_sig_a", "_sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return joined.withColumn(
        "jaccard", matches / F.lit(cfg.num_perm)
    ).select("url", "old_url", "jaccard")


def dedup_against(
    new_pages: DataFrame,
    old_sigs: DataFrame,
    cfg: DedupConfig | None = None,
    new_sigs: DataFrame | None = None,
    cap: int = DEFAULT_CROSS_CAP,
) -> DataFrame:
    """Flag every new page as exact_dup / near_dup / unique vs an old corpus.

    ``old_sigs`` is a (url, content_hash, minhash) frame — typically
    ``SignatureCheckpoint(path).load(...)`` from the previous crawl's commit,
    so the old corpus costs zero recompute. Returns one row per new page:

    - ``status``  : 'exact_dup' (normalized content hash matches an old
      page), else 'near_dup' (signature jaccard >= cfg.jaccard_threshold
      with some old page), else 'unique';
    - ``dup_of``  : the matched old url — min old url for exact matches,
      best-jaccard-then-min-url for near matches (deterministic);
    - ``jaccard`` : 1.0 for exact, the best match's estimate for near,
      null for unique.
    """
    from pyspark import StorageLevel

    from .cache import track
    from .normalize import content_hash_expr

    cfg = cfg or DedupConfig()

    keyed = new_pages.withColumn("_ch", content_hash_expr(cfg))
    # one old-corpus pass builds the exact-match dim: hash -> min(url)
    old_rep = old_sigs.groupBy("content_hash").agg(
        F.min("url").alias("_old_exact"))
    exact = track(
        keyed.select("url", "_ch")
        .join(old_rep.withColumnRenamed("content_hash", "_ch"),
              "_ch", "left")
        .select("url", "_old_exact")
        .persist(StorageLevel.MEMORY_AND_DISK))

    # near-dup LSH only for exact-unique new docs (anti-join shrink)
    remaining = new_pages.join(
        exact.filter(F.col("_old_exact").isNotNull()).select("url"),
        "url", "left_anti")
    if new_sigs is None:
        new_sigs = minhash_signatures(remaining, cfg)
    else:
        new_sigs = new_sigs.join(remaining.select("url"), "url", "left_semi")
    new_sigs = track(
        new_sigs.select("url", "minhash")
        .persist(StorageLevel.MEMORY_AND_DISK))

    pairs = cross_candidate_pairs(
        lsh_bands(new_sigs, cfg), lsh_bands(old_sigs, cfg), cap=cap)
    scored = _cross_jaccard(pairs, new_sigs, old_sigs, cfg).filter(
        F.col("jaccard") >= cfg.jaccard_threshold)
    best = scored.groupBy("url").agg(
        F.min(F.struct((-F.col("jaccard")).alias("nj"),
                       F.col("old_url").alias("u"))).alias("_b"))

    out = (
        new_pages.select("url")
        .join(exact, "url", "left")
        .join(best, "url", "left")
    )
    return out.select(
        "url",
        F.when(F.col("_old_exact").isNotNull(), F.lit("exact_dup"))
        .when(F.col("_b").isNotNull(), F.lit("near_dup"))
        .otherwise(F.lit("unique")).alias("status"),
        F.coalesce(F.col("_old_exact"), F.col("_b.u")).alias("dup_of"),
        F.when(F.col("_old_exact").isNotNull(), F.lit(1.0))
        .otherwise(F.round(-F.col("_b.nj"), 4)).alias("jaccard"),
    )
