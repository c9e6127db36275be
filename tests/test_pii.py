"""PII detection/redaction (pii.py) — counts, redaction bytes, summary,
nulls, and the shuffle-free plan property."""

from __future__ import annotations

from pysparkdedup.pii import (
    PII_PATTERNS, pii_summary, redact_pii, with_pii_counts)

ROWS = [
    (1, "write me at jane.doe+spam@example.co.uk today"),
    (2, "server 10.0.0.1 and gateway 192.168.1.254 up"),
    (3, "call +44 20 7946-0958 or +1 555 0100123 now"),
    (4, "card 4111 1111-1111 1111 on file"),
    (5, "a@b.io from 8.8.8.8 dial +33 1 23 45 67 89"),
    (6, "no pii here, just v1.2.3 and the number 12345"),
    (7, None),
]


def _df(spark):
    return spark.createDataFrame(ROWS, "id long, text string")


def test_counts_per_kind(spark):
    rows = {r["id"]: r for r in with_pii_counts(_df(spark)).collect()}
    assert (rows[1]["n_email"], rows[1]["n_pii"]) == (1, 1)
    assert (rows[2]["n_ipv4"], rows[2]["n_pii"]) == (2, 2)
    assert (rows[3]["n_phone"], rows[3]["n_pii"]) == (2, 2)
    assert (rows[4]["n_card"], rows[4]["n_pii"]) == (1, 1)
    assert rows[5]["n_pii"] == 3  # one of each of email/ipv4/phone
    assert rows[6]["n_pii"] == 0  # semver + short number are not PII
    assert rows[7]["n_pii"] == 0  # null text counts as empty


def test_redaction_bytes(spark):
    red = {r["id"]: r["text_redacted"]
           for r in redact_pii(_df(spark)).collect()}
    assert red[1] == "write me at <EMAIL> today"
    assert red[2] == "server <IPV4> and gateway <IPV4> up"
    assert red[3] == "call <PHONE> or <PHONE> now"
    assert red[4] == "card <CARD> on file"
    assert red[5] == "<EMAIL> from <IPV4> dial <PHONE>"
    assert red[6] == ROWS[5][1]  # untouched
    assert red[7] == ""


def test_redaction_subset_kinds(spark):
    red = {r["id"]: r["text_redacted"]
           for r in redact_pii(_df(spark), kinds=("email",)).collect()}
    assert red[1] == "write me at <EMAIL> today"
    assert red[3] == ROWS[2][1]  # phones untouched when only email scrubbed


def test_summary_row(spark):
    row = pii_summary(_df(spark)).collect()[0]
    assert row["n_docs"] == 7
    assert row["docs_with_pii"] == 5
    assert (row["total_email"], row["total_ipv4"],
            row["total_phone"], row["total_card"]) == (2, 3, 3, 1)


def test_counts_equal_placeholders_on_overlapping_matches(spark):
    """Counts must equal the placeholders redaction emits even where the
    raw patterns overlap: ipv4 inside an email, phone/card on one 16-digit
    run (the progressive-counting contract in pii.PII_PATTERNS)."""
    df = spark.createDataFrame(
        [(1, "mail admin@10.1.2.3.com now"),
         (2, "pay +1 2345 6789 0123 4567 ok")],
        "id long, text string")
    out = {r["id"]: r for r in redact_pii(with_pii_counts(df)).collect()}
    for rid in (1, 2):
        emitted = sum(out[rid]["text_redacted"].count(f"<{k.upper()}>")
                      for k in PII_PATTERNS)
        assert out[rid]["n_pii"] == emitted, out[rid]
    # the email swallows the dotted host: no stray <IPV4> count
    assert (out[1]["n_email"], out[1]["n_ipv4"]) == (1, 0)


def test_counts_and_redaction_are_shuffle_free(spark):
    """Per-doc PII work must never shuffle the corpus: the plan is
    scan -> project, zero Exchange nodes."""
    df = redact_pii(with_pii_counts(_df(spark)))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "Exchange" not in plan


def test_patterns_have_no_lookaround():
    """The oracle replays these in RE2 (DuckDB), which has no lookaround or
    backreferences — keep the patterns inside the shared subset."""
    for pat in PII_PATTERNS.values():
        assert "(?=" not in pat and "(?<" not in pat and "\\1" not in pat
