"""Exact n-gram Jaccard join tests."""

from pysparkdedup.ngram import jaccard_edges, with_shingles
from tests.conftest import ts


def test_with_shingles(pages_factory):
    df = pages_factory([("u/a", ts(0), "One two, three FOUR five six", "en")])
    row = with_shingles(df, k=5).select("shingles").collect()[0]
    assert "one two three four five" in row["shingles"]
    assert "two three four five six" in row["shingles"]
    assert len(row["shingles"]) == 2


def test_jaccard_edges_exact(pages_factory):
    base = " ".join(f"w{i}" for i in range(104))  # 100 5-shingles
    near = " ".join((f"w{i}" if i != 50 else "x") for i in range(104))
    far = " ".join(f"q{i}" for i in range(104))
    df = pages_factory([
        ("u/a", ts(0), base, "en"),
        ("u/b", ts(1), near, "en"),
        ("u/c", ts(2), far, "en"),
    ])
    edges = {(r["a"], r["b"]): r["jaccard"]
             for r in jaccard_edges(df, k=5, threshold=0.5).collect()}
    assert ("u/a", "u/b") in edges
    # one token change kills 5 shingles of 100: J = 95/105
    assert abs(edges[("u/a", "u/b")] - 95 / 105) < 1e-9
    assert all("u/c" not in pair for pair in edges)


def test_with_shingles_short_doc_is_empty_not_crash(spark):
    """Docs shorter than k tokens yield an empty shingle set; previously
    sequence(1,0) descended and slice(start=0) aborted the whole job."""
    from pysparkdedup.ngram import with_shingles

    d = spark.createDataFrame(
        [(1, "only two"), (2, "a b c d e f")], "doc_id long, text string")
    got = {r["doc_id"]: r["shingles"]
           for r in with_shingles(d, 5).collect()}
    assert got[1] == []
    assert len(got[2]) == 2
