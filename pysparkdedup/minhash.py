"""MinHash signatures + LSH banding for near-duplicate candidate generation.

The near-dup generalization of the reference's hash-key grouping
(ref deduplicate.py:958-1058): where the reference groups on one exact SHA-224
key, this module groups on ``lsh_bands`` many banded MinHash keys, so
documents at Jaccard similarity J collide in >=1 band with probability
1 - (1 - J^r)^b (defaults b=16, r=4 — config.py:49-51: P[collide] ~ 0.9998
at J=0.8 and ~0.23 at J=0.3, so the J>=0.8 verify threshold sees near-full
recall while most sub-0.3 noise pairs never become candidates).

Physical design for 10^12 docs:
- signatures are computed in ``mapInPandas`` with fully vectorized numpy — a
  perm-chunked (num_perm x total_shingles) universal-hash matrix reduced per
  doc with ``np.minimum.reduceat`` — mirroring how the reference batches
  worker tasks in chunks of 200 (ref deduplicate.py:688-694) but Arrow-sized;
- band hashing is JVM-side (``xxhash64`` over signature slices) so banding
  adds no Python;
- candidate pairing goes through pairs.bucket_pairs (salted-star hot buckets);
- verification (estimated Jaccard = fraction of equal signature positions) is
  pure column algebra over a zip_with.

Shingle hashing: tokens -> 64-bit blake2b (memoized per batch), word
k-shingles combined with a vectorized rolling polynomial, masked into the
31-bit Mersenne field so the universal hash (a*s + b) mod (2^31 - 1) stays
exact in uint64 arithmetic.
"""

from __future__ import annotations

from collections.abc import Iterator
from hashlib import blake2b

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .components import connected_components
from .config import DedupConfig
from .pairs import bucket_pairs

MERSENNE_31 = np.uint64((1 << 31) - 1)
_POLY_BASE = np.uint64(1099511628211)  # FNV prime, shingle combiner

SIG_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("minhash", T.ArrayType(T.IntegerType()), True),
    T.StructField("n_shingles", T.IntegerType(), False),
])


def _batch_shingles(texts, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch-vectorized shingling over the numpy byte tokenizer (tokenhash.py):
    no Python objects in the hot path. Returns (shingle_hashes grouped by doc,
    reduceat offsets for non-empty docs, per-doc shingle counts). Counts are
    window counts (not distinct) — min-over-multiset == min-over-set, so
    MinHash is unaffected.
    """
    from .tokenhash import batch_token_hashes

    doc_lens, tok_hashes = batch_token_hashes(list(texts))
    ndocs = len(doc_lens)
    total = len(tok_hashes)
    n = total - k + 1
    if total == 0 or n <= 0:
        return (np.empty(0, np.uint64), np.empty(0, np.int64),
                np.zeros(ndocs, np.int64))
    doc_ids = np.repeat(np.arange(ndocs, dtype=np.int64), doc_lens)
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        acc = acc * _POLY_BASE + tok_hashes[j : j + n]
    valid = doc_ids[:n] == doc_ids[k - 1 : k - 1 + n]
    sh = (acc % MERSENNE_31)[valid]
    vdoc = doc_ids[:n][valid]
    counts = np.bincount(vdoc, minlength=ndocs).astype(np.int64)
    nonzero = counts[counts > 0]
    offsets = np.zeros(len(nonzero), dtype=np.int64)
    np.cumsum(nonzero[:-1], out=offsets[1:])
    return sh, offsets, counts


def _perm_params(cfg: DedupConfig) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(cfg.seed)
    p = int(MERSENNE_31)
    a = rng.integers(1, p, size=cfg.num_perm, dtype=np.uint64)
    b = rng.integers(0, p, size=cfg.num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(df: DataFrame, cfg: DedupConfig,
                       text_col: str = "text") -> DataFrame:
    """(url, minhash array<int>, n_shingles). Docs with < shingle_size tokens
    get a null signature (cannot be near-dup candidates; the exact path still
    covers them)."""
    k, num_perm, seed = cfg.shingle_size, cfg.num_perm, cfg.seed
    a_params, b_params = _perm_params(cfg)
    p = MERSENNE_31

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ac = a_params[:, None]
        bc = b_params[:, None]
        for pdf in batches:
            urls = pdf["url"].tolist()
            all_sh, offsets, counts = _batch_shingles(pdf[text_col], k)
            nonempty = counts > 0
            sigs: list = [None] * len(urls)
            nnz = int(nonempty.sum())
            if nnz:
                sig_mat = np.empty((nnz, num_perm), dtype=np.int64)
                # Process doc-blocks whose (num_perm x block_shingles) hash
                # matrix stays cache-resident: the naive full-batch matrix is
                # DRAM-bandwidth-bound (GBs of traffic per batch); blocked, the
                # intermediate never leaves L2/L3 and 8->32 cores scales.
                block_target = 2048  # num_perm x block x 8B ~ 1MB: L2-resident
                nz_lens = counts[nonempty]
                ends = np.cumsum(nz_lens)
                d0 = 0
                while d0 < nnz:
                    d1 = d0
                    start = offsets[d0]
                    while d1 < nnz and ends[d1] - start <= block_target:
                        d1 += 1
                    if d1 == d0:  # single doc larger than the block
                        d1 = d0 + 1
                    sl = all_sh[start : ends[d1 - 1]]
                    m = (ac * sl[None, :] + bc) % p  # (num_perm, block)
                    local_off = (offsets[d0:d1] - start).astype(np.int64)
                    mins = np.minimum.reduceat(m, local_off, axis=1)
                    sig_mat[d0:d1, :] = mins.T.astype(np.int64)
                    d0 = d1
                rows = iter(sig_mat)
                for i in range(len(urls)):
                    if nonempty[i]:
                        sigs[i] = next(rows).tolist()
            yield pd.DataFrame({
                "url": urls,
                "minhash": sigs,
                "n_shingles": counts.astype("int32"),
            })

    return df.select("url", text_col).mapInPandas(compute, schema=SIG_SCHEMA)


def lsh_bands(sig_df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(url, band_id, band_hash) — JVM-side banding, one row per band."""
    b, r = cfg.lsh_bands, cfg.lsh_rows
    banded = sig_df.filter(F.col("minhash").isNotNull()).select(
        "url",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {b - 1}), "
                f"i -> xxhash64(slice(minhash, i * {r} + 1, {r}), i))"
            )
        ).alias("band_id", "band_hash"),
    )
    return banded


def candidate_pairs(bands_df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Distinct (a, b) url pairs sharing >= 1 band bucket."""
    pairs = bucket_pairs(
        bands_df, ["band_id", "band_hash"], id_col="url", cap=cfg.max_bucket_size
    )
    return pairs.dropDuplicates(["a", "b"])


def estimate_jaccard(pairs: DataFrame, sig_df: DataFrame,
                     cfg: DedupConfig) -> DataFrame:
    """(a, b, jaccard) — fraction of equal MinHash positions, column algebra."""
    sa = sig_df.select(F.col("url").alias("a"), F.col("minhash").alias("_sig_a"))
    sb = sig_df.select(F.col("url").alias("b"), F.col("minhash").alias("_sig_b"))
    joined = pairs.join(sa, "a").join(sb, "b")
    matches = F.aggregate(
        F.zip_with("_sig_a", "_sig_b",
                   lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return joined.withColumn(
        "jaccard", matches / F.lit(cfg.num_perm)
    ).select("a", "b", "jaccard")


def minhash_edges(pages: DataFrame, cfg: DedupConfig,
                  sigs: DataFrame | None = None) -> DataFrame:
    """Verified near-dup edges (a, b, jaccard >= threshold).

    Signatures are persisted (memory+disk) — they feed banding AND both sides
    of the verification join; without the persist the Python signature kernel
    would run three times. Pass ``sigs`` (url, minhash) to reuse checkpointed
    signatures (checkpoint.py) instead of recomputing — the resume path.

    The scored frame is persisted BEFORE the threshold filter: the jaccard
    estimate is an aggregate-over-zip_with higher-order expression
    (CodegenFallback — interpreted, no subexpression reuse), and filtering
    directly on it lets Catalyst inline the whole expression into the
    predicate alongside the projected copy — 2x evaluation per candidate
    pair (the same mechanism the curate pass measured at ~7x on its
    heavier expression). The persist boundary forces one evaluation into
    a slim (a, b, jaccard) cache the filter then reads."""
    from pyspark import StorageLevel

    from .cache import track

    if sigs is None:
        sigs = minhash_signatures(pages, cfg)
    sigs = track(
        sigs.select("url", "minhash").persist(StorageLevel.MEMORY_AND_DISK))
    bands = lsh_bands(sigs, cfg)
    pairs = candidate_pairs(bands, cfg)
    scored = track(
        estimate_jaccard(pairs, sigs, cfg)
        .persist(StorageLevel.MEMORY_AND_DISK))
    return scored.filter(F.col("jaccard") >= cfg.jaccard_threshold)


def minhash_clusters(pages: DataFrame, cfg: DedupConfig,
                     sigs: DataFrame | None = None) -> DataFrame:
    """(url, cluster_key) for every url in a near-dup component of size >= 2.

    Feed into pipeline.run_clustered; uncovered urls fall back to their exact
    content hash there.
    """
    from .cache import cache_scope

    # The fixpoint materializes the edge input eagerly (localCheckpoint), so
    # the signature/bucket-size caches are dead weight once it returns —
    # release them instead of leaking one cached frame per invocation.
    with cache_scope():
        edges = minhash_edges(pages, cfg, sigs=sigs).select("a", "b")
        return connected_components(edges)
