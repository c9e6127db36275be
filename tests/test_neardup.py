"""Near-dup stack tests: pairs, MinHash-LSH, SimHash, union-find, recall."""

import pytest
from pyspark.sql import functions as F

from pysparkdedup.components import connected_components
from pysparkdedup.config import DedupConfig
from pysparkdedup.corpus import pages_and_truth
from pysparkdedup.minhash import (
    candidate_pairs, estimate_jaccard, lsh_bands, minhash_clusters,
    minhash_signatures,
)
from pysparkdedup.pairs import bucket_pairs
from pysparkdedup.simhash import simhash_clusters, simhash_signatures
from tests.conftest import ts


CFG = DedupConfig()


def test_bucket_pairs_cold(spark):
    df = spark.createDataFrame(
        [("k1", "u1"), ("k1", "u2"), ("k1", "u3"), ("k2", "u4")],
        "bkey string, url string",
    )
    pairs = {(r["a"], r["b"]) for r in bucket_pairs(df, ["bkey"]).collect()}
    assert pairs == {("u1", "u2"), ("u1", "u3"), ("u2", "u3")}


def test_bucket_pairs_hot_star(spark):
    """A bucket above cap degrades to a connectivity-preserving star:
    O(n) pairs, every member reachable from the bucket leader."""
    rows = [("hot", f"u{i:03d}") for i in range(50)]
    df = spark.createDataFrame(rows, "bkey string, url string")
    pairs = bucket_pairs(df, ["bkey"], cap=10, nsalt=4).collect()
    assert len(pairs) < 50 * 49 / 2  # far fewer than full pairwise
    # connectivity: union-find over the star pairs puts all 50 in one component
    edges = spark.createDataFrame(
        [(r["a"], r["b"]) for r in pairs], "a string, b string")
    comp = connected_components(edges)
    ncomp = comp.select("cluster_key").distinct().count()
    assert ncomp == 1
    assert comp.count() == 50


def test_connected_components_chain(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e")], "a string, b string")
    got = {
        (r["url"], r["cluster_key"])
        for r in connected_components(edges).collect()
    }
    assert got == {
        ("a", "cc:a"), ("b", "cc:a"), ("c", "cc:a"),
        ("d", "cc:d"), ("e", "cc:d"),
    }


def test_minhash_identical_docs_identical_sigs(pages_factory):
    text = " ".join(f"w{i}" for i in range(60))
    df = pages_factory([
        ("u/a", ts(0), text, "en"),
        ("u/b", ts(1), text, "en"),
        ("u/c", ts(2), "totally different " + " ".join(f"z{i}" for i in range(60)), "en"),
    ])
    sigs = {r["url"]: r["minhash"] for r in minhash_signatures(df, CFG).collect()}
    assert sigs["u/a"] == sigs["u/b"]
    assert sigs["u/a"] != sigs["u/c"]
    assert len(sigs["u/a"]) == CFG.num_perm


def test_minhash_short_doc_null_sig(pages_factory):
    df = pages_factory([("u/short", ts(0), "one two", "en")])
    row = minhash_signatures(df, CFG).collect()[0]
    assert row["minhash"] is None and row["n_shingles"] == 0


def test_lsh_finds_near_pair_and_jaccard_orders(pages_factory):
    base = [f"w{i}" for i in range(200)]
    near = list(base); near[3] = "xx"; near[100] = "yy"  # ~1% edits
    far = list(base)
    for i in range(0, 200, 3):
        far[i] = f"q{i}"  # ~33% edits
    df = pages_factory([
        ("u/base", ts(0), " ".join(base), "en"),
        ("u/near", ts(1), " ".join(near), "en"),
        ("u/far", ts(2), " ".join(far), "en"),
    ])
    sigs = minhash_signatures(df, CFG)
    pairs = candidate_pairs(lsh_bands(sigs, CFG), CFG)
    scored = {
        (r["a"], r["b"]): r["jaccard"]
        for r in estimate_jaccard(pairs, sigs, CFG).collect()
    }
    assert ("u/base", "u/near") in scored
    assert scored[("u/base", "u/near")] > 0.8
    if ("u/base", "u/far") in scored:
        assert scored[("u/base", "u/far")] < scored[("u/base", "u/near")]


def test_simhash_hamming_neighbors(pages_factory):
    base = " ".join(f"word{i}" for i in range(300))
    tweaked = base.replace("word7 ", "word7x ")  # tiny perturbation
    different = " ".join(f"other{i}" for i in range(300))
    df = pages_factory([
        ("u/a", ts(0), base, "en"),
        ("u/b", ts(1), tweaked, "en"),
        ("u/c", ts(2), different, "en"),
    ])
    cfg = DedupConfig()
    clusters = simhash_clusters(df, cfg)
    got = {r["url"]: r["cluster_key"] for r in clusters.collect()}
    assert got.get("u/a") == got.get("u/b") and got.get("u/a") is not None
    assert "u/c" not in got


def test_simhash_identical_signature(pages_factory):
    text = " ".join(f"tok{i}" for i in range(50))
    df = pages_factory([("u/a", ts(0), text, "en"), ("u/b", ts(1), text, "en")])
    rows = {r["url"]: r["simhash"] for r in simhash_signatures(df).collect()}
    assert rows["u/a"] == rows["u/b"] and rows["u/a"] is not None


@pytest.mark.slow
def test_minhash_recall_on_corpus(spark):
    """Dup-pair recall >= 0.99 on kinds the detector claims (exact copies +
    whitespace + near_j>=threshold) — BASELINE.md target, measured on the
    planted corpus ground truth."""
    pages, truth = pages_and_truth(spark, 2000)
    cfg = DedupConfig()
    clusters = minhash_clusters(pages, cfg)

    claimed = truth.filter(
        F.col("dup_kind").isin(
            "exact", "whitespace", "time_ladder", "undated", "same_ts",
            "boilerplate", "near_j095", "near_j09",
        )
    )
    # ground-truth co-clustered pairs, restricted to claimed kinds
    t1 = claimed.alias("t1")
    t2 = claimed.alias("t2")
    truth_pairs = (
        t1.join(t2, F.col("t1.true_cluster") == F.col("t2.true_cluster"))
        .filter(F.col("t1.url") < F.col("t2.url"))
        .select(F.col("t1.url").alias("a"), F.col("t2.url").alias("b"))
    )
    c1 = clusters.alias("c1")
    c2 = clusters.alias("c2")
    found_pairs = (
        c1.join(c2, F.col("c1.cluster_key") == F.col("c2.cluster_key"))
        .filter(F.col("c1.url") < F.col("c2.url"))
        .select(F.col("c1.url").alias("a"), F.col("c2.url").alias("b"))
    )
    total = truth_pairs.count()
    hit = truth_pairs.join(found_pairs, ["a", "b"], "inner").count()
    assert total > 0
    recall = hit / total
    assert recall >= 0.99, f"recall {recall:.4f} ({hit}/{total})"


def test_connected_components_nonconvergence_observable(spark):
    """max_iter exhaustion must not silently return split components
    (ADVICE r1): raise by default, warn-and-return on request."""
    import warnings

    import pytest

    from pysparkdedup.components import connected_components

    edges = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(12)], ["a", "b"])
    # small_graph_edges=0 forces the distributed fixpoint — the driver-side
    # union-find has no iteration limit to observe
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1,
                             small_graph_edges=0).collect()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = connected_components(edges, max_iter=1, small_graph_edges=0,
                                   on_nonconverged="warn").collect()
    assert any("did not converge" in str(w.message) for w in caught)
    assert len(out) == 13
    # And with enough iterations the chain converges to one component.
    full = connected_components(edges, max_iter=25,
                                small_graph_edges=0).collect()
    assert {r["cluster_key"] for r in full} == {"cc:n00"}


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """reliable=True materializes iterations via checkpoint() (cluster-safe
    storage) and produces identical components (VERDICT r1: localCheckpoint
    dies with lost executors on a real cluster)."""
    from pysparkdedup.components import connected_components

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["a", "b"])
    got = {(r["url"], r["cluster_key"])
           for r in connected_components(edges, reliable=True,
                                         small_graph_edges=0).collect()}
    assert got == {("a", "cc:a"), ("b", "cc:a"), ("c", "cc:a"),
                   ("x", "cc:x"), ("y", "cc:x")}


def test_small_graph_union_find_matches_distributed(spark):
    """The adaptive driver-side union-find (default for small edge sets)
    must produce EXACTLY the distributed fixpoint's labels — pinned on a
    random multi-component graph with chains, stars, duplicate and
    self-referential-ish edges."""
    import random

    from pysparkdedup.components import connected_components

    rng = random.Random(9)
    rows = []
    for comp in range(12):                      # chained stars per component
        hub = f"c{comp:02d}_h"
        for m in range(rng.randint(1, 9)):
            rows.append((hub, f"c{comp:02d}_m{m}"))
        rows.append((f"c{comp:02d}_m0", f"c{comp:02d}_x"))
    rows += rows[:7]                            # duplicate edges
    rng.shuffle(rows)
    edges = spark.createDataFrame(rows, "a string, b string")

    small = {(r["url"], r["cluster_key"])
             for r in connected_components(edges).collect()}
    dist = {(r["url"], r["cluster_key"])
            for r in connected_components(
                edges, small_graph_edges=0).collect()}
    assert small == dist
    assert len({u for u, _ in small}) == len(small)  # one row per node


def test_connected_components_rejects_bad_max_iter(spark):
    import pytest

    from pysparkdedup.components import connected_components

    edges = spark.createDataFrame([("a", "b")], ["a", "b"])
    with pytest.raises(ValueError, match="max_iter"):
        connected_components(edges, max_iter=0)


def test_clusterers_release_internal_caches(spark, pages_factory, monkeypatch):
    """Persist-leak regression (advice r2): minhash_clusters releases its
    signature/bucket-size caches on return — repeated invocations (daemon /
    incremental loops) must not grow the session's persisted-frame set.
    Spied via cache.track (the library imports it per-call), so the check is
    deterministic — no racing the async ContextCleaner over RDD counts."""
    import pysparkdedup.cache as cache
    from pysparkdedup.minhash import minhash_clusters

    rows = [(f"u/{i}", ts(i), "common shared body text words here "
             + ("alpha " if i % 2 else "beta ") * 10, "en")
            for i in range(20)]
    pages = pages_factory(rows)

    captured = []
    real_track = cache.track

    def spy(df):
        captured.append(df)
        return real_track(df)

    monkeypatch.setattr(cache, "track", spy)
    clusters = minhash_clusters(pages, DedupConfig())
    clusters.count()  # the result stays fully usable after release
    assert len(captured) >= 2  # sigs + bucket sizes went through the scope
    for df in captured:
        assert not (df.storageLevel.useMemory or df.storageLevel.useDisk), (
            "a library-persisted frame survived its cache_scope")


def test_cache_scope_unpersists(spark, pages_factory):
    from pyspark import StorageLevel

    from pysparkdedup.cache import cache_scope, track

    df = pages_factory([("u/a", ts(0), "hello world", "en")])
    with cache_scope():
        cached = track(df.persist(StorageLevel.MEMORY_AND_DISK))
        cached.count()
        assert cached.storageLevel.useMemory
    assert not cached.storageLevel.useMemory  # released at scope exit
    # without a scope, track is a no-op and the persist survives
    kept = track(df.select("url").persist(StorageLevel.MEMORY_AND_DISK))
    kept.count()
    assert kept.storageLevel.useMemory
    kept.unpersist()


def test_zero_small_graph_threshold_forces_distributed_even_when_empty(
        spark, monkeypatch):
    """small_graph_edges=0 is the documented escape hatch to the distributed
    fixpoint; it must hold even for an empty edge frame (0 <= 0 would
    otherwise take the driver path and plan-gating tests would silently
    test the wrong code path)."""
    import pysparkdedup.components as components_mod

    def boom(*args, **kwargs):
        raise AssertionError("driver union-find taken despite threshold 0")

    monkeypatch.setattr(components_mod, "_driver_union_find", boom)
    empty = spark.createDataFrame([], "a string, b string")
    out = components_mod.connected_components(empty, small_graph_edges=0)
    assert out.count() == 0
