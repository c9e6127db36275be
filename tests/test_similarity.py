"""Embedding similarity tests on the driver-provided embeddings table."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pysparkdedup.similarity import (
    cosine_pairs_exact, cosine_topk, lsh_topk,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _numpy_topk(emb_pdf, query_ids, k):
    mat = np.vstack(emb_pdf["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = emb_pdf["vec_id"].to_numpy()
    out = {}
    for qid in query_ids:
        qi = int(np.where(ids == qid)[0][0])
        sims = mat @ mat[qi]
        order = np.lexsort((ids, -sims))[:k]
        out[qid] = set(ids[order].tolist())
    return out


def test_cosine_topk_matches_numpy(spark, emb):
    emb_pdf = emb.toPandas()
    queries = emb_pdf.head(5).rename(columns={"vec_id": "query_id"})[
        ["query_id", "embedding"]]
    got = cosine_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    expected = _numpy_topk(emb_pdf, queries["query_id"].tolist(), 5)
    assert by_q == expected


def test_cosine_pairs_exact(spark, emb):
    pairs = spark.createDataFrame([(0, 0), (0, 1)], "a long, b long")
    rows = {(r["a"], r["b"]): r["cosine"]
            for r in cosine_pairs_exact(pairs, emb).collect()}
    assert abs(rows[(0, 0)] - 1.0) < 1e-9
    assert -1.0 <= rows[(0, 1)] <= 1.0


def test_lsh_topk_recall_vs_exact(spark, emb):
    """ANN path: top-1 self-similarity always found; decent overlap with
    exact top-k."""
    emb_pdf = emb.toPandas()
    queries_pdf = emb_pdf.head(10).rename(columns={"vec_id": "query_id"})[
        ["query_id", "embedding"]]
    queries = spark.createDataFrame(queries_pdf)
    approx = lsh_topk(emb, queries, k=5, n_tables=16, n_bits=6)
    rows = approx.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    # each query's own vector is its nearest neighbor and shares all buckets
    for qid, found in by_q.items():
        assert qid in found
    exact = _numpy_topk(emb_pdf, queries_pdf["query_id"].tolist(), 5)
    overlaps = [
        len(by_q.get(q, set()) & exact[q]) / 5 for q in exact
    ]
    assert sum(overlaps) / len(overlaps) >= 0.4  # ANN: partial recall OK


def test_embedding_dup_clusters(spark, emb):
    """Duplicated vectors (with tiny noise) cluster together; unrelated
    random vectors do not."""
    from pyspark.sql import functions as F

    from pysparkdedup.similarity import embedding_dup_clusters

    dups = (
        emb.filter(F.col("vec_id") < 5)
        .withColumn("vec_id", F.col("vec_id") + 100000)
    )
    both = emb.unionByName(dups)
    clusters = embedding_dup_clusters(both, threshold=0.999)
    got = {r["url"]: r["cluster_key"] for r in clusters.collect()}
    for i in range(5):
        assert got.get(str(i)) is not None
        assert got[str(i)] == got[str(i + 100000)]
