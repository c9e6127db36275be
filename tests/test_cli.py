"""CLI surface tests (ref tests/test_cli.py, tests/cli-test-suite.toml)."""

import json

import pytest

from pysparkdedup.cli import build_parser, main


def test_parser_accepts_aliases():
    args = build_parser().parse_args([
        "--input", "x", "--strategy", "discard-older", "--strategy",
        "select-one", "--mode", "minhash"])
    assert args.strategy == ["discard-older", "select-one"]


def test_parser_rejects_unknown_strategy():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["--input", "x", "--strategy", "bogus"])


@pytest.mark.slow
def test_cli_end_to_end(spark, pages_factory, tmp_path, capsys):
    """Full CLI run over a parquet input (uses the session's JVM via a second
    SparkSession.getOrCreate on the same master)."""
    from tests.conftest import ts

    rows = [
        ("u/dup-old", ts(0), "pair text", "en"),
        ("u/dup-new", ts(1), "pair text", "en"),
        ("u/solo", ts(2), "solo text", "en"),
    ]
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    pages_factory(rows).write.parquet(inp)
    rc = main([
        "--input", inp, "--strategy", "select-newest",
        "--action", "copy-selected", "--output", out,
        "--master", "local[4]",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["MAIL_FOUND"] == 3
    assert stats["MAIL_SELECTED"] == 1
    assert stats["ACTION_COPY-SELECTED"] == 2
    got = {r["url"] for r in spark.read.parquet(out).collect()}
    assert got == {"u/dup-new", "u/solo"}
