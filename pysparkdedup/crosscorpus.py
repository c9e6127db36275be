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
    old_stats: DataFrame | None = None,
) -> DataFrame:
    """Distinct (url, old_url) pairs sharing >= 1 LSH band bucket.

    Old-side bucket sizes gate the join: cold buckets join in full; hot
    buckets (> ``cap`` old members) contribute only their min-url
    representative, broadcast — bounded pairs per new doc, no quadratic
    bucket blowup, exactly the skew posture of pairs.bucket_pairs but
    asymmetric (the new side is never collected or capped).

    ``old_stats`` — an optional precomputed per-bucket (band_id, band_hash,
    n, rep_url) frame, e.g. SignatureCheckpoint.load_cross_dims()'s
    ``band_stats``. When provided, BOTH the bucket sizing and the
    hot-bucket representative pick come from it, so this function runs
    zero aggregations over the old side — the warm incremental path.
    """
    keys = ["band_id", "band_hash"]
    if old_stats is None:
        old_stats = old_bands.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n"), F.min("url").alias("rep_url"))

    cold_old = old_bands.join(
        old_stats.filter(F.col("n") <= cap).select(*keys), keys)
    cold = new_bands.join(
        cold_old.select(*keys, F.col("url").alias("old_url")), keys)

    hot_reps = old_stats.filter(F.col("n") > cap).select(
        *keys, F.col("rep_url").alias("old_url"))
    hot = new_bands.join(F.broadcast(hot_reps), keys)

    return (
        cold.select("url", "old_url")
        .unionByName(hot.select("url", "old_url"))
        .dropDuplicates(["url", "old_url"])
    )


def hot_old_bucket_count(old_bands: DataFrame,
                         cap: int = DEFAULT_CROSS_CAP,
                         old_stats: DataFrame | None = None) -> int:
    """How many old-side band buckets degraded to a representative —
    the observability hook for the recall trade documented above. With
    ``old_stats`` (persisted band_stats dim) this is a filter-count over
    the tiny stats table, no old-side aggregation."""
    if old_stats is not None:
        return old_stats.filter(F.col("n") > cap).count()
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
    old_dims: dict[str, DataFrame] | None = None,
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

    ``old_dims`` — the dict SignatureCheckpoint.load_cross_dims() returns
    (``exact_dim`` / ``bands`` / ``band_stats``). When provided, the old
    side is never aggregated OR banded here: the exact hash->min(url) dim,
    the band projection, and the per-bucket stats all come precomputed from
    the previous commit, so a warm incremental run does zero old-side
    shuffles (the only old-side touches are equi-join probes). Without it,
    this function re-derives all three per run — correct, but a monthly
    full aggregation of the old corpus at scale (the reference's cache
    stores exactly what makes warm runs cheap, ref cache.py:175-184).
    Prefer dedup_against_checkpoint for the warm path.
    """
    from pyspark import StorageLevel

    from .cache import track
    from .normalize import content_hash_expr

    cfg = cfg or DedupConfig()

    keyed = new_pages.withColumn("_ch", content_hash_expr(cfg))
    if old_dims is not None:
        old_rep = old_dims["exact_dim"].select(
            "content_hash", F.col("url").alias("_old_exact"))
    else:
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

    old_bands = (old_dims["bands"] if old_dims is not None
                 else lsh_bands(old_sigs, cfg))
    old_stats = old_dims["band_stats"] if old_dims is not None else None
    pairs = cross_candidate_pairs(
        lsh_bands(new_sigs, cfg), old_bands, cap=cap, old_stats=old_stats)
    # Persist the slim scored frame BEFORE the threshold filter: the
    # jaccard estimate is an interpreted aggregate-over-zip_with
    # (CodegenFallback), and filtering on it directly inlines the whole
    # expression into the predicate next to the projected copy — 2x
    # evaluation per candidate pair. The persist boundary evaluates once.
    scored = track(
        _cross_jaccard(pairs, new_sigs, old_sigs, cfg)
        .persist(StorageLevel.MEMORY_AND_DISK)
    ).filter(F.col("jaccard") >= cfg.jaccard_threshold)
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


def dedup_against_checkpoint(
    new_pages: DataFrame,
    checkpoint_path: str,
    cfg: DedupConfig | None = None,
    cap: int = DEFAULT_CROSS_CAP,
) -> DataFrame:
    """The warm incremental path: dedup ``new_pages`` against the old
    corpus's committed signature checkpoint, loading BOTH the signature
    table and (when the commit carried ``cross_dims=True``) the persisted
    exact/band/band-stats dims — zero old-side recompute AND zero old-side
    shuffles. Falls back to per-run derivation when the dims are absent.

    Raises FileNotFoundError when no fingerprint-matching checkpoint
    exists — an incremental run against nothing is a config error, not a
    silently-empty old corpus."""
    from .checkpoint import SignatureCheckpoint

    cfg = cfg or DedupConfig()
    ckpt = SignatureCheckpoint(checkpoint_path)
    old_sigs = ckpt.load(new_pages.sparkSession, cfg)
    if old_sigs is None:
        raise FileNotFoundError(
            f"no signature checkpoint with a matching fingerprint at "
            f"{checkpoint_path!r} — commit one with "
            f"signatures_with_checkpoint(..., cross_dims=True) first")
    old_dims = ckpt.load_cross_dims(new_pages.sparkSession, cfg)
    return dedup_against(new_pages, old_sigs, cfg, cap=cap,
                         old_dims=old_dims)
