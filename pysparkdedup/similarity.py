"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

Two paths over an ``array<float>`` embedding column:

- ``cosine_topk`` — exact baseline: broadcast the (small) query set, compute
  per-partition partial top-k with one numpy matmul per Arrow batch, then a
  global top-k window. Correct at any scale where queries fit in memory; the
  corpus side streams.
- ``lsh_topk`` — scale path: hash-deterministic Rademacher sign-LSH buckets
  corpus and queries; candidates share >= 1 of ``n_tables`` bucket keys;
  exact cosine is then computed only for candidates. Recall is tunable with
  n_tables/n_bits.
- ``ivf_topk`` — second scale path: IVF inverted lists under hash-sampled
  centroids (``ivf_centroids``), queries probe ``nprobe`` lists; recall is
  tunable with n_list/nprobe and candidates are bounded by list sizes.

Also ``cosine_pairs_exact`` — column-algebra cosine between explicit id pairs
(used by the embedding near-dup detector and the DuckDB oracle: deterministic
left-fold sum, double precision end to end).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(_dot(a, a))


def cosine_col(a: F.Column, b: F.Column) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _fold_mats(ea: np.ndarray, eb: np.ndarray) -> np.ndarray:
    """Row-wise cosine between two (n, dim) float64 matrices as an ordered
    per-dimension left fold — the same operation order (and hence the same
    IEEE doubles) as the column-algebra ``cosine_col`` and the DuckDB
    ``list_reduce`` oracle replay; a BLAS matmul's pairwise-summation
    order is unspecified and could differ in the last ulp."""
    dot = np.zeros(len(ea), np.float64)
    na = np.zeros(len(ea), np.float64)
    nb = np.zeros(len(ea), np.float64)
    for d in range(ea.shape[1]):  # ordered left fold per dim
        ca, cb = ea[:, d], eb[:, d]
        dot += ca * cb
        na += ca * ca
        nb += cb * cb
    return dot / (np.sqrt(na) * np.sqrt(nb))


def cosine_pairs_exact(pairs: DataFrame, emb: DataFrame,
                       id_col: str = "vec_id",
                       emb_col: str = "embedding") -> DataFrame:
    """pairs(a, b) + emb(id, embedding) -> (a, b, cosine).

    The joins are JVM (AQE broadcasts the embedding dim when it fits); the
    cosine itself is a batched numpy kernel rather than the column-algebra
    ``cosine_col``: three aggregate-over-zip_with higher-order expressions
    per row are CodegenFallback (interpreted, per-element allocation) —
    the dominant cost when LSH buckets emit 10^8 candidates. BIT-EXACT
    parity with ``cosine_col`` and the DuckDB ``list_reduce`` oracle
    replay is preserved by accumulating the dot/norm sums as an ordered
    per-dimension left fold (``acc += a[:, d] * b[:, d]`` — same
    operation order, same IEEE doubles; the same trick hyperplane_buckets
    uses instead of a BLAS matmul, whose pairwise-summation order is
    unspecified)."""
    a_type = pairs.schema["a"].dataType
    b_type = pairs.schema["b"].dataType
    schema = T.StructType([
        T.StructField("a", a_type, True),
        T.StructField("b", b_type, True),
        T.StructField("cosine", T.DoubleType(), True),
    ])

    def _flat(col, n_rows: int):
        """(n_rows, dim) float64 view of a clean Arrow list<float> column,
        or None when the column is dirty (nulls / ragged lengths). A list
        column is one contiguous values buffer plus offsets, so a clean
        batch reshapes WITHOUT any per-row work — no 10^5-element object
        arrays, no vstack."""
        import pyarrow.compute as pc

        if col.null_count or n_rows == 0:
            return None
        lens = np.asarray(pc.list_value_length(col))
        if (lens != lens[0]).any() or lens[0] == 0:
            return None
        flat = np.asarray(col.flatten())
        if flat.size != n_rows * int(lens[0]):
            return None
        return flat.reshape(n_rows, int(lens[0])).astype(np.float64)

    def score(batches):
        import pyarrow as pa

        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            ea = _flat(batch.column(2), n)
            eb = _flat(batch.column(3), n)
            if ea is not None and eb is not None and ea.shape == eb.shape:
                cos = _fold_mats(ea, eb)
                yield pa.RecordBatch.from_arrays(
                    [batch.column(0), batch.column(1), pa.array(cos)],
                    names=["a", "b", "cosine"])
                continue
            # Dirty batch: a null or ragged embedding. cosine_col's column
            # algebra yields a null cosine for such a pair (zip_with
            # null-pads, aggregate propagates null) and the caller's
            # threshold filter drops it — reproduce that: drop pairs with
            # a missing side or mismatched lengths, score the rest grouped
            # by (shared) length. One dirty row must not abort a 100-TB job.
            pdf = batch.to_pandas()
            lens_a = np.fromiter(
                (len(v) if v is not None else -1
                 for v in pdf["_ea"].to_numpy()), np.int64, n)
            lens_b = np.fromiter(
                (len(v) if v is not None else -1
                 for v in pdf["_eb"].to_numpy()), np.int64, n)
            keep = (lens_a > 0) & (lens_a == lens_b)
            for length in np.unique(lens_a[keep]):
                sub = pdf[keep & (lens_a == length)]
                cos = _fold_mats(
                    np.vstack(sub["_ea"].to_numpy()).astype(np.float64),
                    np.vstack(sub["_eb"].to_numpy()).astype(np.float64))
                yield pa.RecordBatch.from_pandas(
                    pd.DataFrame({"a": sub["a"], "b": sub["b"],
                                  "cosine": cos}),
                    preserve_index=False)

    ea = emb.select(F.col(id_col).alias("a"), F.col(emb_col).alias("_ea"))
    eb = emb.select(F.col(id_col).alias("b"), F.col(emb_col).alias("_eb"))
    return (
        pairs.join(ea, "a").join(eb, "b")
        .select("a", "b", "_ea", "_eb")
        .mapInArrow(score, schema=schema)
    )


_TOPK_SCHEMA = T.StructType([
    T.StructField("query_id", T.LongType(), False),
    T.StructField("vec_id", T.LongType(), False),
    T.StructField("cosine", T.DoubleType(), False),
])


def cosine_topk(corpus: DataFrame, queries_pdf: pd.DataFrame, k: int = 10,
                id_col: str = "vec_id", emb_col: str = "embedding") -> DataFrame:
    """Exact top-k: (query_id, vec_id, cosine), k rows per query.

    ``queries_pdf`` is a pandas frame (query_id, embedding list) — broadcast
    once; each Arrow batch does one (batch x dim) @ (dim x nq) matmul.
    """
    spark = corpus.sparkSession
    q_ids = queries_pdf["query_id"].to_numpy()
    q_mat = np.vstack(queries_pdf["embedding"].to_numpy()).astype(np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            vids = pdf[id_col].to_numpy()
            c = np.vstack(pdf[emb_col].to_numpy()).astype(np.float64)
            c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
            sims = c @ mat.T  # (batch, nq)
            kk = min(k, len(vids))
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
            out_q, out_v, out_s = [], [], []
            for qi in range(len(ids)):
                rows = top[:, qi]
                out_q.extend([ids[qi]] * len(rows))
                out_v.extend(vids[rows].tolist())
                out_s.extend(sims[rows, qi].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "vec_id": out_v, "cosine": out_s})

    partials = corpus.select(id_col, emb_col).mapInPandas(
        partial, schema=_TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id"))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


_PLANE_M = (1 << 31) - 1  # Mersenne prime 2^31-1, same family as minhash.py


def plane_coeffs(n_tables: int, n_bits: int,
                 seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Universal-hash coefficients (a, b), one pair per (table, bit).

    The hyperplanes are Rademacher (+-1 entries), derived from the parity of
    h(d) = (a*d + b) mod (2^31-1) over the 1-based embedding dimension d —
    sign-LSH with +-1 projections is the classic SimHash construction
    (Charikar, STOC'02) and +-1 entries are a valid random projection
    (Achlioptas, PODS'01: database-friendly sparse projections). Making the
    entries a *hash of (table, bit, dim)* rather than an RNG stream buys two
    things a 10^12-doc pipeline needs: any executor can regenerate any plane
    without broadcasting O(n_tables*dim*n_bits) floats, and the buckets are
    replayable in plain SQL (the DuckDB oracle embeds these (a, b) as
    literals — same trick as the minhash permutation oracle)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _PLANE_M, size=(n_tables, n_bits), dtype=np.int64)
    b = rng.integers(0, _PLANE_M, size=(n_tables, n_bits), dtype=np.int64)
    return a, b


def plane_signs(n_tables: int, n_bits: int, dim: int,
                seed: int = 42) -> np.ndarray:
    """(n_tables, dim, n_bits) array of {-1.0, +1.0} plane entries."""
    a, b = plane_coeffs(n_tables, n_bits, seed)
    d = np.arange(1, dim + 1, dtype=np.int64)  # 1-based, matches the oracle's
    # generate_subscripts(embedding, 1); a*d < 2^31 * dim fits int64
    h = (a[:, None, :] * d[None, :, None] + b[:, None, :]) % _PLANE_M
    return np.where((h & 1) == 0, 1.0, -1.0)


def hyperplane_buckets(df: DataFrame, n_tables: int = 8, n_bits: int = 12,
                       dim: int | None = None, seed: int = 42,
                       id_col: str = "vec_id",
                       emb_col: str = "embedding") -> DataFrame:
    """(id, table_id, bucket): sign-LSH bucket per table — numpy batched.

    Planes are hash-deterministic Rademacher projections (``plane_signs``):
    regenerated locally inside each Arrow batch worker from (seed, shape)
    alone — nothing is broadcast, and the DuckDB oracle replays the exact
    bucket values from the same (a, b) literals.

    The id column rides through untouched, so it may be integral (the
    embeddings table's vec_id) or string (e.g. page urls) — the Arrow
    batch schema mirrors the input type."""
    id_type = df.schema[id_col].dataType
    schema = T.StructType([
        T.StructField("_id", id_type, False),
        T.StructField("table_id", T.IntegerType(), False),
        T.StructField("bucket", T.LongType(), False),
    ])

    state: dict = {}

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[emb_col].to_numpy()).astype(np.float64)
            if "planes" not in state:
                state["planes"] = plane_signs(
                    n_tables, n_bits, mat.shape[1], seed)
            planes = state["planes"]
            ids = pdf[id_col].to_numpy()
            weights = (1 << np.arange(n_bits)).astype(np.int64)
            # Ordered LEFT-FOLD over dims (d = 0..dim-1), vectorized across
            # the batch AND all tables at once (each (table, bit)
            # accumulator is independent, so folding them side by side in
            # one (batch, n_tables*n_bits) array keeps the per-accumulator
            # addition order identical): bit-identical to the oracle's
            # list_reduce((acc, v) -> acc + v) replay, unlike a BLAS matmul
            # whose pairwise-summation order is unspecified and could flip
            # the sign of a projection within ~1e-12 of zero. O(dim) fused
            # numpy ops per batch instead of O(dim * n_tables).
            pflat = planes.transpose(1, 0, 2).reshape(
                mat.shape[1], n_tables * n_bits)  # (dim, tables*bits)
            proj = np.zeros((mat.shape[0], n_tables * n_bits), np.float64)
            for dmi in range(mat.shape[1]):
                proj += mat[:, dmi, None] * pflat[dmi]
            signs = (proj > 0).reshape(len(ids), n_tables, n_bits)
            buckets = (signs.astype(np.int64) * weights).sum(axis=2)
            yield pd.DataFrame({
                "_id": np.tile(ids, n_tables),
                "table_id": np.repeat(
                    np.arange(n_tables, dtype=np.int32), len(ids)),
                "bucket": buckets.T.reshape(-1),
            })

    return df.select(
        F.col(id_col).alias(id_col), emb_col
    ).mapInPandas(compute, schema=schema).withColumnRenamed("_id", id_col)


# Auto-banding target: mean vectors per sign-LSH bucket. Candidate volume
# grows ~linearly with occupancy (n * B / 2 pairs per table), so a FIXED
# n_bits under-partitions big corpora: 200k vectors at n_bits=10 sit at
# ~195 per bucket — just under the 256 degrade cap — and emit ~10^8
# full-pairwise candidates. Targeting B=32 keeps candidates ~n*16 per
# table at ANY corpus size while per-table collision probability for
# cos >= 0.95 pairs stays ~0.25 (0.97 recall over 12 tables).
TARGET_BUCKET_OCCUPANCY = 32


def _auto_n_bits(n_vectors: int, occupancy: int = TARGET_BUCKET_OCCUPANCY,
                 lo: int = 4, hi: int = 24) -> int:
    import math

    if n_vectors <= occupancy:
        return lo
    return max(lo, min(hi, round(math.log2(n_vectors / occupancy))))


def _bucket_scored_edges(members: DataFrame, id_col: str,
                         emb_col: str) -> DataFrame:
    """(a, b, cosine) for every within-bucket pair of ``members``
    (id, emb, table_id, bucket) — pairing and exact-cosine scoring fused
    into ONE aggregation + mapInArrow, so the embedding payload crosses
    the Python boundary once per BUCKET MEMBER instead of twice per
    CANDIDATE PAIR (the former pairs -> join(ea) -> join(eb) chain ships
    each vector once per pair it appears in; at the target occupancy of
    ~32 that is ~16 ships per vector per table vs exactly 1 here).

    Members are sorted by id inside the bucket (JVM sort_array; ids are
    unique so the embedding tiebreak is never reached), giving a < b pair
    order — identical pair canonicalization to pairs.bucket_pairs. The
    cosine is the same ordered per-dimension left fold as
    ``cosine_pairs_exact`` (_fold_mats over float64 upcasts of the same
    float32 values), so scores are bit-identical to the join path."""
    st = F.struct(F.col(id_col).alias("_i"), F.col(emb_col).alias("_e"))
    grouped = (
        members.groupBy("table_id", "bucket")
        .agg(F.sort_array(F.collect_list(st)).alias("_ms"))
        .select("_ms")
    )
    id_type = members.schema[id_col].dataType
    schema = T.StructType([
        T.StructField("a", id_type, True),
        T.StructField("b", id_type, True),
        T.StructField("cosine", T.DoubleType(), True),
    ])

    def score(batches):
        import pyarrow as pa

        for batch in batches:
            if not batch.num_rows:
                continue
            ms = batch.column(0)
            if isinstance(ms, pa.ChunkedArray):  # defensive; batches are flat
                ms = ms.combine_chunks()
            import pyarrow.compute as pc

            offs = np.asarray(ms.offsets, dtype=np.int64)
            lens = np.diff(offs)
            starts = offs[:-1] - offs[0]  # offsets are absolute on slices
            st_arr = ms.flatten()
            ids = st_arr.field(0)
            embs = st_arr.field(1)
            if len(st_arr) == 0:
                continue
            elens = np.asarray(pc.list_value_length(embs))
            dim = int(elens[0]) if len(elens) else 0
            if embs.null_count == 0 and dim > 0 and (elens == dim).all():
                mat = np.asarray(embs.flatten()).reshape(
                    len(st_arr), dim).astype(np.float64)
            else:
                # Dirty vectors cannot occur via hyperplane_buckets (its
                # vstack would have failed first); null-pad defensively so
                # one bad row errors per-bucket, not per-task.
                mat = np.zeros((len(st_arr), max(dim, 1)), np.float64)
                for i, v in enumerate(embs.to_pylist()):
                    if v is not None and len(v) == mat.shape[1]:
                        mat[i] = v
            ai_all, bi_all = [], []
            for m in np.unique(lens):
                if m < 2:
                    continue
                ti, tj = np.triu_indices(int(m), 1)
                bstarts = starts[lens == m]
                ai_all.append((bstarts[:, None] + ti[None, :]).ravel())
                bi_all.append((bstarts[:, None] + tj[None, :]).ravel())
            if not ai_all:
                continue
            ai = np.concatenate(ai_all)
            bi = np.concatenate(bi_all)
            cos = _fold_mats(mat[ai], mat[bi])
            yield pa.RecordBatch.from_arrays(
                [ids.take(pa.array(ai)), ids.take(pa.array(bi)),
                 pa.array(cos)],
                names=["a", "b", "cosine"])

    return grouped.mapInArrow(score, schema=schema)


def embedding_dup_edges(emb: DataFrame, threshold: float = 0.95,
                        n_tables: int = 12, n_bits: int | None = None,
                        seed: int = 42, id_col: str = "vec_id",
                        emb_col: str = "embedding",
                        max_bucket: int = 256) -> DataFrame:
    """Embedding-cosine near-duplicate edges: (a, b, cosine >= threshold).

    ``n_bits=None`` (default) auto-sizes the banding from the exact vector
    count so mean bucket occupancy tracks TARGET_BUCKET_OCCUPANCY instead
    of exploding with corpus size — the bucket-granularity analog of AQE
    picking shuffle partitions from runtime statistics. The count is one
    column-pruned job and is parallelism-independent, so auto-banded runs
    stay deterministic; pass an explicit ``n_bits`` to pin the layout
    (the oracle queries do — their DuckDB replay embeds it).

    Sign-LSH buckets generate candidates (skew-aware via pairs.bucket_pairs),
    exact double-precision cosine verifies. Feed components.connected_components
    for embedding-level dup clusters — the vector analog of MinHash-LSH.

    The scored frame is persisted BEFORE the threshold filter: the cosine
    is THREE aggregate-over-zip_with higher-order expressions (dot + two
    norms — CodegenFallback, interpreted), and filtering directly on it
    inlines all of them into the predicate next to the projected column —
    2x evaluation per candidate pair (same mechanism as minhash_edges /
    the curate pass). The persist boundary evaluates once into a slim
    (a, b, cosine) cache."""
    from pyspark import StorageLevel

    from .cache import track
    from .pairs import bucket_pairs

    if n_bits is None:
        n_bits = _auto_n_bits(emb.select(id_col).count())
    # Slim (id, table, bucket) rows persisted once: they feed the size
    # aggregation, the hot-bucket probe AND the member join below, so the
    # Python bucketing kernel runs exactly once (it used to run twice —
    # once for the probe, once for candidate generation).
    buckets = track(
        hyperplane_buckets(emb, n_tables, n_bits, seed=seed,
                           id_col=id_col, emb_col=emb_col)
        .persist(StorageLevel.MEMORY_AND_DISK))
    sizes = track(
        buckets.groupBy("table_id", "bucket")
        .agg(F.count(F.lit(1)).alias("_bsize"))
        .filter(F.col("_bsize") >= 2)
        .persist(StorageLevel.MEMORY_AND_DISK))
    hot_exists = sizes.filter(F.col("_bsize") > max_bucket).limit(1).count() > 0
    if hot_exists:
        # Pathological value-skew (a bucket past the cap): fall back to the
        # salted-star machinery wholesale — rare by construction (auto
        # banding targets ~32 per bucket), and the star pairs need the
        # id-keyed embedding join anyway. Result-identical to the fused
        # path on the cold buckets.
        cand = bucket_pairs(
            buckets.select("table_id", "bucket", F.col(id_col).alias("url")),
            ["table_id", "bucket"], id_col="url", cap=max_bucket,
        ).dropDuplicates(["a", "b"])
        scored = track(
            cosine_pairs_exact(cand, emb, id_col=id_col, emb_col=emb_col)
            .persist(StorageLevel.MEMORY_AND_DISK))
        return scored.filter(F.col("cosine") >= threshold)
    # Fused path (guide §8: decide with small rows, move heavy bytes once):
    # drop singleton buckets on the SLIM rows, attach each vector once by
    # id (AQE broadcasts the embedding frame when it fits; SHJ otherwise),
    # then pair + exact-cosine inside one per-bucket aggregation. A pair
    # colliding in several tables is scored per collision (identical fold,
    # identical value) and canonicalized by dropDuplicates — same contract
    # as the join path, minus two per-pair embedding joins and the
    # candidate-pair exchange.
    members = buckets.join(
        sizes.drop("_bsize").hint("shuffle_hash"),
        on=["table_id", "bucket"], how="inner",
    ).join(emb.select(id_col, emb_col), id_col)
    scored = _bucket_scored_edges(members, id_col, emb_col)
    # Threshold BEFORE the (a, b) canonicalization: a pair colliding in k
    # tables carries k identical fold values, so filtering first is
    # result-identical and the dedup exchange moves only the survivors
    # (sub-threshold candidates — the vast majority — never shuffle).
    return (scored.filter(F.col("cosine") >= threshold)
            .dropDuplicates(["a", "b"]))


def embedding_dup_clusters(emb: DataFrame, threshold: float = 0.95,
                           **kwargs) -> DataFrame:
    """(vec_id-as-url, cluster_key) components over embedding_dup_edges."""
    from .cache import cache_scope
    from .components import connected_components

    # Fixpoint materializes edges eagerly; release bucket-size caches on
    # return (see cache.py).
    with cache_scope():
        edges = embedding_dup_edges(emb, threshold, **kwargs).select(
            F.col("a").cast("string").alias("a"),
            F.col("b").cast("string").alias("b"))
        return connected_components(edges)


def ivf_centroids(corpus: DataFrame, n_list: int = 16, seed: int = 42,
                  id_col: str = "vec_id",
                  emb_col: str = "embedding") -> DataFrame:
    """Deterministic IVF coarse-quantizer centroids: the ``n_list`` corpus
    vectors with the smallest Mersenne-31 hash of their id.

    Classic IVF (Jegou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI'11) k-means-trains the coarse quantizer; hash-ranked
    *sampled* centroids are the zero-iteration variant — statistically a
    uniform random sample (the hash is a fixed random permutation of ids),
    so expected list sizes are balanced for non-adversarial corpora, and the
    selection is (a) a cheap distributed top-k (TakeOrdered, no shuffle of
    the data rows) and (b) exactly replayable in SQL for the oracle. A
    Lloyd-refinement pass can be layered on top without changing the search
    path; the contract pins the sampled variant.
    """
    a, b = (int(x[0, 0]) for x in plane_coeffs(1, 1, seed))
    h = F.pmod(F.lit(a) * F.pmod(F.col(id_col), F.lit(_PLANE_M)) + F.lit(b),
               F.lit(_PLANE_M))
    return (
        corpus.select(F.col(id_col).alias("list_id"),
                      F.col(emb_col).alias("centroid"),
                      h.alias("_h"))
        .orderBy("_h", "list_id").limit(n_list).drop("_h")
    )


def lloyd_refine(corpus: DataFrame, cent_pdf: pd.DataFrame, iters: int = 1,
                 id_col: str = "vec_id",
                 emb_col: str = "embedding") -> pd.DataFrame:
    """``iters`` pinned Lloyd iterations over the sampled centroids
    (k-means refinement of the IVF coarse quantizer, Jegou TPAMI'11 §II):
    assign every corpus vector to its nearest centroid (cosine DESC,
    list_id ASC — the same rule the search path uses), move each centroid
    to the per-dimension MEAN of its list, keep the old centroid for an
    empty list. list_ids stay the original sampled ids, so the search path
    and the oracle reference stable lists.

    Scale shape: assignment is the Arrow-batched map ``_ivf_assign`` (no
    shuffle); the mean is a posexplode -> groupBy(list_id, dim) hash
    aggregation — n*d skinny rows with map-side partial combine, then
    n_list result rows to the driver. Cosine is scale-invariant, so the
    un-normalized mean quantizes identically to the spherical-k-means
    normalized mean.

    Float note: the mean is an unordered double aggregation, so centroid
    LSBs can vary with partition order; assignment flips only on exact
    cosine ties against both centroids (~1e-16), and the final ranking
    always re-scores with EXACT embeddings, so integer outputs are stable
    in practice (same acceptance as the sign-LSH bucket oracle)."""
    for _ in range(iters):
        assign = _ivf_assign(corpus, cent_pdf, 1, id_col, emb_col, id_col)
        refined = (
            corpus.join(assign, id_col)
            .select("list_id", F.posexplode(F.col(emb_col)).alias("d", "v"))
            .groupBy("list_id", "d")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .groupBy("list_id")
            .agg(F.array_sort(F.collect_list(F.struct("d", "m"))).alias("dm"))
            .select("list_id", F.expr("transform(dm, x -> x.m)").alias("_rc"))
            .toPandas()
        )
        merged = cent_pdf.merge(refined, on="list_id", how="left")
        merged["centroid"] = [
            rc if isinstance(rc, (list, np.ndarray)) else c
            for c, rc in zip(merged["centroid"], merged["_rc"])
        ]
        cent_pdf = merged[["list_id", "centroid"]]
    return cent_pdf


def _ivf_assign(df: DataFrame, cent_pdf: pd.DataFrame, nprobe: int,
                id_col: str, emb_col: str, out_id: str) -> DataFrame:
    """(out_id, list_id): the ``nprobe`` nearest centroids by
    (cosine DESC, list_id ASC) — numpy batched, centroids broadcast."""
    spark = df.sparkSession
    c_ids = cent_pdf["list_id"].to_numpy()
    c_mat = np.vstack(cent_pdf["centroid"].to_numpy()).astype(np.float64)
    c_mat /= np.maximum(np.linalg.norm(c_mat, axis=1, keepdims=True), 1e-12)
    order = np.argsort(c_ids)  # tie-break on list_id: pre-sort, stable sort
    c_ids, c_mat = c_ids[order], c_mat[order]
    bc = spark.sparkContext.broadcast((c_ids, c_mat))

    schema = T.StructType([
        T.StructField(out_id, T.LongType(), False),
        T.StructField("list_id", T.LongType(), False),
    ])

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat = bc.value
        np_ = min(nprobe, len(ids))
        for pdf in batches:
            if pdf.empty:
                continue
            vids = pdf[id_col].to_numpy()
            v = np.vstack(pdf[emb_col].to_numpy()).astype(np.float64)
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            sims = v @ mat.T  # (batch, n_list); ids ascending -> stable
            # argsort keeps list_id-ASC order among exact cosine ties
            top = np.argsort(-sims, axis=1, kind="stable")[:, :np_]
            yield pd.DataFrame({
                out_id: np.repeat(vids, np_),
                "list_id": ids[top].ravel(),
            })

    return df.select(id_col, emb_col).mapInPandas(assign, schema=schema)


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_list: int = 16, nprobe: int = 4, seed: int = 42,
             id_col: str = "vec_id", emb_col: str = "embedding",
             lloyd_iters: int = 0) -> DataFrame:
    """IVF approximate top-k: corpus vectors are inverted-listed under their
    nearest sampled centroid (``ivf_centroids``); each query probes its
    ``nprobe`` nearest lists and exact cosine re-ranks the candidates.
    ``lloyd_iters`` > 0 runs that many pinned k-means refinement passes over
    the sampled centroids first (``lloyd_refine``) — materially better
    recall on clustered corpora, same search path.

    The scale shape mirrors lsh_topk: centroids are a broadcast-sized frame
    (n_list ~ sqrt(n) at most), assignment is one Arrow-batched map over the
    corpus (no shuffle), and the candidate join is an equi-join on list_id
    whose fan-in is bounded by the list sizes — a hash-sampled quantizer
    keeps expected list size n/n_list, and a skewed corpus degrades to at
    worst nprobe lists per query, never a cross join."""
    cent_pdf = ivf_centroids(corpus, n_list, seed,
                             id_col=id_col, emb_col=emb_col).toPandas()
    if lloyd_iters and not cent_pdf.empty:
        cent_pdf = lloyd_refine(corpus, cent_pdf, lloyd_iters,
                                id_col=id_col, emb_col=emb_col)
    if cent_pdf.empty:
        # An empty corpus would otherwise surface as an opaque np.vstack
        # ValueError inside the assignment UDF (advice r3); an empty result
        # frame is the honest answer — there is nothing to rank.
        return corpus.sparkSession.createDataFrame(
            [], schema=f"query_id long, {id_col} long, cosine double, rank int")
    corpus_lists = _ivf_assign(corpus, cent_pdf, 1, id_col, emb_col, id_col)
    query_lists = _ivf_assign(queries, cent_pdf, nprobe,
                              "query_id", emb_col, "query_id")
    cand = (
        query_lists.join(corpus_lists, "list_id")
        .select("query_id", id_col)
        .dropDuplicates(["query_id", id_col])
    )
    qe = queries.select("query_id", F.col(emb_col).alias("_qe"))
    ce = corpus.select(id_col, F.col(emb_col).alias("_ce"))
    scored = (
        cand.join(qe, "query_id").join(ce, id_col)
        .withColumn("cosine", cosine_col(F.col("_qe"), F.col("_ce")))
        .select("query_id", id_col, "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_tables: int = 8, n_bits: int = 12, seed: int = 42,
             id_col: str = "vec_id", emb_col: str = "embedding",
             max_bucket: int = 4096, hot_obs=None) -> DataFrame:
    """Approximate top-k via shared sign-LSH buckets, exact cosine on
    candidates only. queries: DataFrame (query_id, embedding).

    Skew guard (same discipline as embedding_dup_edges / pairs.bucket_pairs):
    the query-bucket x corpus-bucket equi-join is quadratic on exactly the
    skewed key — a low-entropy embedding region (or n_bits too small) can put
    a large corpus fraction in ONE bucket, making the candidate set
    |queries-in-bucket| x |corpus-in-bucket|. Corpus buckets larger than
    ``max_bucket`` are dropped from candidate generation: a bucket holding
    that much of the corpus carries almost no locality signal anyway (it is
    the LSH analog of a stopword posting, cf. the df-cut in ngram.py), and a
    query whose every table lands hot degrades to no candidates rather than
    an unbounded join. The degradation is observable, never silent: pass
    ``hot_obs`` (a pyspark.sql.Observation) to collect ``hot_buckets`` /
    ``hot_rows`` metrics during the action that materializes the result.
    """
    cb = hyperplane_buckets(corpus, n_tables, n_bits, seed=seed,
                            id_col=id_col, emb_col=emb_col)
    qb = hyperplane_buckets(
        queries.select(F.col("query_id").alias(id_col), emb_col),
        n_tables, n_bits, seed=seed, id_col=id_col, emb_col=emb_col,
    ).withColumnRenamed(id_col, "query_id")
    sizes = cb.groupBy("table_id", "bucket").agg(
        F.count(F.lit(1)).alias("_bsize"))
    if hot_obs is not None:
        sizes = sizes.observe(
            hot_obs,
            F.sum((F.col("_bsize") > max_bucket).cast("long"))
            .alias("hot_buckets"),
            F.sum(F.when(F.col("_bsize") > max_bucket, F.col("_bsize"))
                  .otherwise(F.lit(0))).alias("hot_rows"),
        )
    # The build side is one skinny row per cold bucket — shuffle_hash skips
    # the SMJ sort of the (much wider) corpus bucket rows.
    cold_cb = cb.join(
        sizes.filter(F.col("_bsize") <= max_bucket).drop("_bsize")
        .hint("shuffle_hash"),
        ["table_id", "bucket"],
    )
    cand = (
        qb.join(cold_cb, ["table_id", "bucket"])
        .select("query_id", id_col)
        .dropDuplicates(["query_id", id_col])
    )
    qe = queries.select("query_id", F.col(emb_col).alias("_qe"))
    ce = corpus.select(id_col, F.col(emb_col).alias("_ce"))
    scored = (
        cand.join(qe, "query_id").join(ce, id_col)
        .withColumn("cosine", cosine_col(F.col("_qe"), F.col("_ce")))
        .select("query_id", id_col, "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
