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


def test_config_file_layer(tmp_path):
    """TOML config-file layer (ref tests/test_config.py): file fills
    defaults, CLI flags win."""
    from pysparkdedup.cli import _merge_config, build_parser

    cfg_file = tmp_path / "dedup.toml"
    cfg_file.write_text(
        '[pysparkdedup]\n'
        'size-threshold = 99\n'
        'hash-body = "raw"\n'
        'strategy = ["select-oldest", "select-one"]\n'
    )
    parser = build_parser()
    argv = ["--input", "x", "--config", str(cfg_file)]
    args = _merge_config(parser.parse_args(argv), parser, argv)
    assert args.size_threshold == 99
    assert args.hash_body == "raw"
    assert args.strategy == ["select-oldest", "select-one"]

    # CLI overrides file
    argv = ["--input", "x", "--config", str(cfg_file),
            "--size-threshold", "7", "--strategy", "select-newest"]
    args = _merge_config(parser.parse_args(argv), parser, argv)
    assert args.size_threshold == 7
    assert args.strategy == ["select-newest"]


def test_config_file_unknown_key(tmp_path):
    from pysparkdedup.cli import _merge_config, build_parser

    cfg_file = tmp_path / "bad.toml"
    cfg_file.write_text("unknown-option = 1\n")
    parser = build_parser()
    argv = ["--input", "x", "--config", str(cfg_file)]
    with pytest.raises(ValueError, match="unknown option"):
        _merge_config(parser.parse_args(argv), parser, argv)


def test_config_file_explicit_default_wins(tmp_path):
    """An explicit CLI flag set to its default value still beats the config
    file (code-review r2: default-value sentinel can't detect intent)."""
    from pysparkdedup.cli import _merge_config, build_parser

    cfg_file = tmp_path / "dedup.toml"
    cfg_file.write_text('[pysparkdedup]\nhash-body = "raw"\n')
    parser = build_parser()
    argv = ["--input", "x", "--config", str(cfg_file),
            "--hash-body", "normalized"]  # explicit == default
    args = _merge_config(parser.parse_args(argv), parser, argv)
    assert args.hash_body == "normalized"


def test_config_file_scalar_strategy_and_types(tmp_path):
    from pysparkdedup.cli import _merge_config, build_parser

    cfg_file = tmp_path / "dedup.toml"
    cfg_file.write_text(
        '[pysparkdedup]\nstrategy = "select-oldest"\nsize-threshold = "99"\n')
    parser = build_parser()
    argv = ["--input", "x", "--config", str(cfg_file)]
    args = _merge_config(parser.parse_args(argv), parser, argv)
    assert args.strategy == ["select-oldest"]
    assert args.size_threshold == 99  # coerced through argparse type

    bad = tmp_path / "bad.toml"
    bad.write_text('[pysparkdedup]\nstrategy = "select-everything"\n')
    with pytest.raises(ValueError, match="unknown strategy"):
        _merge_config(parser.parse_args(
            ["--input", "x", "--config", str(bad)]), parser,
            ["--input", "x", "--config", str(bad)])


def test_config_file_bool_flags(tmp_path):
    """store_true flags (type=None) must be real TOML bools: the string
    "false" would otherwise land truthy on args (advice r2)."""
    from pysparkdedup.cli import _merge_config, build_parser

    parser = build_parser()
    ok = tmp_path / "ok.toml"
    ok.write_text('[pysparkdedup]\ndry-run = true\nexport-append = false\n')
    argv = ["--input", "x", "--config", str(ok)]
    args = _merge_config(parser.parse_args(argv), parser, argv)
    assert args.dry_run is True
    assert args.export_append is False

    bad = tmp_path / "bad.toml"
    bad.write_text('[pysparkdedup]\ndry-run = "false"\n')
    argv = ["--input", "x", "--config", str(bad)]
    with pytest.raises(ValueError, match="must be a TOML bool"):
        _merge_config(parser.parse_args(argv), parser, argv)
