"""trainpipe.curate_and_dedup — the curate -> tiered-dedup composition.

The load-bearing property is the ORDER: dedup keys on CURATED text, so two
pages that differ only in removed boilerplate are exact duplicates after
curation (they are not duplicates of any kind before it — the whole reason
the composition exists, trainpipe.py module docstring). Also covers:
curation-dropped docs never entering the ledger, surviving_docs assembling
the final corpus, durable parquet staging vs localCheckpoint equivalence,
and the CLI --mode pipeline verb end-to-end.
"""

from __future__ import annotations

import json

from pysparkdedup.config import DedupConfig
from pysparkdedup.trainpipe import curate_and_dedup, surviving_docs
from tests.conftest import ts

BOILER = "subscribe to our newsletter"


def rows_boiler():
    """a/b differ ONLY in the boilerplate line (df=3 via c, d); c/d unique."""
    return [
        ("a", ts(0), f"alpha beta gamma\n{BOILER}", "en"),
        ("b", ts(1), "alpha beta gamma", "en"),
        ("c", ts(2), f"unique walrus sentence one\n{BOILER}", "en"),
        ("d", ts(3), f"another distinct walrus line\n{BOILER}", "en"),
    ]


def ledger_map(ledger):
    return {r["url"]: (r["tier"], r["kept_by"]) for r in ledger.collect()}


def test_dedup_keys_on_curated_text(spark, pages_factory):
    pages = pages_factory(rows_boiler())
    curated, ledger = curate_and_dedup(
        pages, DedupConfig(),
        curate_kwargs=dict(boilerplate_min_df=3, line_mode="newline"))
    got = ledger_map(ledger)
    # boilerplate stripped -> a == b byte-for-byte -> exact tier, min-url wins
    assert got["a"] == ("kept", "a")
    assert got["b"] == ("exact", "a")
    assert got["c"] == ("kept", "c")
    assert got["d"] == ("kept", "d")
    cur = {r["url"]: r["text"] for r in curated.collect()}
    assert cur["a"] == cur["b"] == "alpha beta gamma"
    assert BOILER not in cur["c"]


def test_curation_dropped_docs_never_enter_ledger(spark, pages_factory):
    # 'spam' 2-gram repetition ~1.0 > 0.5 -> dropped by the Gopher filter
    pages = pages_factory(rows_boiler() + [
        ("z", ts(9), "spam " * 40, "en"),
    ])
    curated, ledger = curate_and_dedup(
        pages, DedupConfig(),
        curate_kwargs=dict(max_dup_gram_frac=0.5, boilerplate_min_df=3,
                           line_mode="newline"))
    assert "z" not in {r["url"] for r in curated.collect()}
    assert "z" not in ledger_map(ledger)


def test_drop_empty_closes_the_blank_singleton_hole(spark, pages_factory):
    """Corpus-wide keep-first paragraph dedup empties an exact duplicate
    BEFORE the cascade's exact tier can key it (blank docs are
    unconditional singletons) — without drop_empty the husk survives into
    the final corpus as an empty doc; with it, curation removes the husk
    and the ledger never sees it."""
    pages = pages_factory([
        ("a", ts(0), "the one shared paragraph", "en"),
        ("b", ts(1), "the one shared paragraph", "en"),
        ("c", ts(2), "something else entirely here", "en"),
    ])
    kw = dict(dedup_paragraphs=True, line_mode="newline")
    _, led_default = curate_and_dedup(
        pages, DedupConfig(), curate_kwargs=dict(**kw))
    assert ledger_map(led_default)["b"] == ("kept", "b")  # blank husk kept
    cur, led = curate_and_dedup(
        pages, DedupConfig(), curate_kwargs=dict(drop_empty=True, **kw))
    got = ledger_map(led)
    assert "b" not in got
    assert set(got) == {"a", "c"}
    assert {r["url"] for r in surviving_docs(cur, led).collect()} == {"a", "c"}


def test_surviving_docs_is_curated_minus_losers(spark, pages_factory):
    pages = pages_factory(rows_boiler())
    curated, ledger = curate_and_dedup(
        pages, DedupConfig(),
        curate_kwargs=dict(boilerplate_min_df=3, line_mode="newline"))
    corpus = {r["url"]: r["text"] for r in surviving_docs(curated, ledger).collect()}
    assert set(corpus) == {"a", "c", "d"}
    assert corpus["a"] == "alpha beta gamma"  # curated, not raw, text


def test_staging_path_matches_localcheckpoint(spark, pages_factory, tmp_path):
    pages = pages_factory(rows_boiler())
    kw = dict(curate_kwargs=dict(boilerplate_min_df=3, line_mode="newline"))
    _, led_local = curate_and_dedup(pages, DedupConfig(), **kw)
    staging = str(tmp_path / "curated")
    cur_staged, led_staged = curate_and_dedup(
        pages, DedupConfig(), staging_path=staging, **kw)
    assert ledger_map(led_local) == ledger_map(led_staged)
    # the staging IS the curated-corpus deliverable, re-read from parquet
    disk = {r["url"] for r in spark.read.parquet(staging).collect()}
    assert disk == {r["url"] for r in cur_staged.collect()} == {"a", "b", "c", "d"}


def test_cli_pipeline_mode(spark, pages_factory, tmp_path, capsys):
    from pysparkdedup.cli import main

    inp = str(tmp_path / "in")
    pages_factory(rows_boiler()).write.parquet(inp)
    out = str(tmp_path / "ledger")
    curated_out = str(tmp_path / "curated")
    corpus_out = str(tmp_path / "corpus")
    rc = main([
        "--input", inp, "--mode", "pipeline", "--output", out,
        "--boilerplate-min-df", "3", "--line-mode", "newline",
        "--curated-output", curated_out, "--corpus-output", corpus_out,
        "--master", "local[4]",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["DOCS_IN"] == 4
    assert stats["CURATED"] == 4
    assert stats["N_EXACT"] == 1
    assert stats["N_KEPT"] == 3
    got = ledger_map(spark.read.parquet(out))
    assert got["b"] == ("exact", "a")
    corpus = {r["url"] for r in spark.read.parquet(corpus_out).collect()}
    assert corpus == {"a", "c", "d"}
    assert {r["url"] for r in spark.read.parquet(curated_out).collect()} == {
        "a", "b", "c", "d"}
