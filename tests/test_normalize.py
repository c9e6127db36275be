"""Normalization kernel unit tests — mirrors ref tests/test_mail.py:78-147
(raw vs normalized hash distinctions) and the parametrized normalizer cases
(ref tests/test_mail.py:149-536)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from pysparkdedup import normalize as N


def one(spark, col_expr, value):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(col_expr.alias("out")).collect()[0]["out"]


def test_collapse_ws(spark):
    # " ".join(value.split()) semantics (ref mail.py:525-526)
    assert one(spark, N.collapse_ws(F.col("v")), "  a\t\tb \n c  ") == "a b c"
    assert one(spark, N.collapse_ws(F.col("v")), "abc") == "abc"


def test_strip_all_ws(spark):
    assert one(spark, N.strip_all_ws(F.col("v")), "a b\nc\td ") == "abcd"


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("Re: hello", "hello"),
        ("RE: Fwd: hello", "hello"),
        ("fwd: [list] hello", "hello"),
        ("[tag] hello", "hello"),
        ("plain subject", "plain subject"),
        ("nore: keep", "nore: keep"),
    ],
)
def test_normalize_subject(spark, raw, expected):
    # ref mail.py:539-546
    assert one(spark, N.normalize_subject(F.col("v")), raw) == expected


def test_normalize_content_type(spark):
    got = one(spark, N.normalize_content_type(F.col("v")),
              "text/HTML; charset=utf-8")
    assert got == "text/html"


def test_strip_angle_brackets(spark):
    assert one(spark, N.strip_angle_brackets(F.col("v")), "<id@host>") == "id@host"
    # multiple tokens / commas left untouched (ref mail.py:596-619)
    assert one(spark, N.strip_angle_brackets(F.col("v")), "<a>,<b>") == "<a>,<b>"
    assert one(spark, N.strip_angle_brackets(F.col("v")), "plain") == "plain"


def test_normalize_address(spark):
    got = one(spark, N.normalize_address(F.col("v")),
              '"Jane  Doe" <jane@example.com>')
    assert got == "Jane Doe jane@example.com"


def test_raw_vs_normalized_hash(spark):
    """Whitespace variants share the normalized hash but not the raw hash
    (ref tests/test_mail.py:78-93, mail.py:423-439)."""
    a, b = "hello world\nfoo", "hello  world \n foo"
    raw_a = one(spark, N.raw_text_hash(F.col("v")), a)
    raw_b = one(spark, N.raw_text_hash(F.col("v")), b)
    norm_a = one(spark, N.normalized_text_hash(F.col("v")), a)
    norm_b = one(spark, N.normalized_text_hash(F.col("v")), b)
    assert raw_a != raw_b
    assert norm_a == norm_b
    # And the normalized hash is sha256 of the \s-stripped text, bit-exact.
    assert norm_a == hashlib.sha256(b"helloworldfoo").hexdigest()


def test_collapse_ws_edge_whitespace(spark):
    """Leading/trailing tabs/newlines collapse exactly like
    ' '.join(s.split()) (ADVICE r1: F.trim strips spaces only)."""
    cases = ["\tfoo", "foo\n", "\n\t foo \t bar\t\n", "  ", ""]
    df = spark.createDataFrame([(c,) for c in cases], ["v"])
    got = [r["out"] for r in
           df.select(N.collapse_ws(F.col("v")).alias("out")).collect()]
    assert got == [" ".join(c.split()) for c in cases]


def test_metadata_hash_skip_mode(spark):
    """BodyHasher.SKIP analog (ref deduplicate.py:167,175): key ignores the
    body beyond the normalized first line."""
    from pysparkdedup.config import CONTENT_HASH_SKIP, DedupConfig
    from pysparkdedup.normalize import content_hash_expr
    from tests.conftest import ts

    rows = [
        ("u/a", ts(0), "Title here\nbody one", "en"),
        ("u/b", ts(30), "Re: Title  here\ncompletely different body", "en"),
        ("u/c", ts(0), "Title here\nbody one", "fr"),
    ]
    df = spark.createDataFrame(rows, ["url", "warc_ts", "text", "lang"])
    cfg = DedupConfig(content_hash_mode=CONTENT_HASH_SKIP)
    got = {r["url"]: r["h"] for r in
           df.select("url", content_hash_expr(cfg).alias("h")).collect()}
    assert got["u/a"] == got["u/b"]  # same metadata tuple, bodies differ
    assert got["u/a"] != got["u/c"]  # lang differs


@pytest.mark.parametrize("raw,expected", [
    ("HTTP://Example.COM:80/a/b?utm_source=x&id=5#frag",
     "http://example.com/a/b?id=5"),
    ("https://Host.org:443/path/?utm_campaign=a&utm_medium=b",
     "https://host.org/path"),
    ("http://h/x?fbclid=abc", "http://h/x"),
    ("http://h/x?id=1&gclid=z", "http://h/x?id=1"),
    ("http://h/", "http://h"),
    ("relative/path/#f", "relative/path"),
])
def test_normalize_url(spark, raw, expected):
    assert one(spark, N.normalize_url(F.col("v")), raw) == expected


@pytest.mark.parametrize("raw,expected", [
    # ':80' in a path/query is NOT a port — must survive (code-review r2)
    ("http://ex.com/a:80/b", "http://ex.com/a:80/b"),
    ("http://ex.com/doc:443", "http://ex.com/doc:443"),
    # port directly before the query
    ("http://ex.com:80?q=1", "http://ex.com?q=1"),
    # longer param names embedding a tracking name must survive
    ("http://ex.com/p?myfbclid=2", "http://ex.com/p?myfbclid=2"),
    # consecutive tracking params all removed, separators tidied
    ("http://ex.com/p?utm_a=1&utm_b=2&id=3", "http://ex.com/p?id=3"),
    # port strip is scheme-aware (advice r2): http://h:443 is NOT http://h
    # (a genuinely different origin) and https://h:80 is NOT https://h
    ("http://ex.com:443/x", "http://ex.com:443/x"),
    ("https://ex.com:80/x", "https://ex.com:80/x"),
    ("ftp://ex.com:80/x", "ftp://ex.com:80/x"),
])
def test_normalize_url_boundary_cases(spark, raw, expected):
    assert one(spark, N.normalize_url(F.col("v")), raw) == expected
