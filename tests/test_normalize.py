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
