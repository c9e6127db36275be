"""Action sink tests (ref tests/test_action.py:82-269)."""

import pytest
from pyspark.sql import functions as F

from pysparkdedup.actions import perform, pointer_dedup
from pysparkdedup.config import DedupConfig
from pysparkdedup.pipeline import run_exact
from tests.conftest import ts


@pytest.fixture()
def final(pages_factory):
    rows = [
        ("u/dup-old", ts(0), "pair text", "en"),
        ("u/dup-new", ts(1), "pair text", "en"),
        ("u/solo", ts(0), "solo text", "en"),
    ]
    cfg = DedupConfig(strategies=("select-newest",))
    return run_exact(pages_factory(rows), cfg)


def test_copy_selected(final, tmp_path):
    out = str(tmp_path / "out")
    res = perform(final, "copy-selected", out)
    assert res == {"action": "copy-selected", "count": 2, "written": True}
    got = {r["url"] for r in final.sparkSession.read.parquet(out).collect()}
    assert got == {"u/dup-new", "u/solo"}


def test_delete_discarded(final, tmp_path):
    out = str(tmp_path / "out")
    res = perform(final, "delete-discarded", out)
    assert res["count"] == 1
    got = {r["url"] for r in final.sparkSession.read.parquet(out).collect()}
    assert got == {"u/dup-new", "u/solo"}


def test_dry_run_writes_nothing(final, tmp_path):
    out = str(tmp_path / "none")
    res = perform(final, "copy-selected", out, dry_run=True)
    assert res["written"] is False
    assert not (tmp_path / "none").exists()


def test_pointer_dedup(final):
    rows = {r["url"]: r for r in pointer_dedup(final).collect()}
    assert rows["u/dup-old"]["kept_url"] == "u/dup-new"
    assert rows["u/dup-new"]["is_canonical"]
    assert rows["u/solo"]["is_canonical"]


def test_unknown_action(final):
    with pytest.raises(ValueError, match="unknown action"):
        perform(final, "explode-everything")


def test_perform_executes_tail_once(final):
    """act+report is ONE execution of the pipeline tail (ref VERDICT r1 #3):
    perform persists `final`, so the count materializes the cache and the
    write reads it — a per-row counter downstream of the pipeline must tick
    exactly n times."""
    import pandas as pd

    spark = final.sparkSession
    acc = spark.sparkContext.accumulator(0)

    def tick(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    counted = final.mapInPandas(tick, schema=final.schema)
    res = perform(counted, "copy-selected",
                  str(_tmp_dir()), pages=None)
    n_rows = final.count()
    assert res["count"] == 2
    assert acc.value == n_rows, (
        f"tail executed {acc.value / n_rows:.1f}x, expected once")


def _tmp_dir():
    import tempfile

    return tempfile.mkdtemp(prefix="pysparkdedup-act-")


@pytest.mark.parametrize("fmt", ["json", "csv"])
def test_export_formats(final, tmp_path, fmt):
    """Multi-format export (ref mail_box.py:490-511 box formats)."""
    out = str(tmp_path / f"out-{fmt}")
    res = perform(final, "copy-selected", out, fmt=fmt)
    assert res["written"] is True
    reader = final.sparkSession.read.option("header", True)
    got = getattr(reader, fmt)(out)
    assert got.count() == 2
    assert "url" in got.columns


def test_export_append(final, tmp_path):
    """--export-append analog (ref cli.py:501): second write appends."""
    out = str(tmp_path / "out")
    perform(final, "copy-selected", out)
    res = perform(final, "copy-selected", out, append=True)
    assert res["written"] is True
    got = final.sparkSession.read.parquet(out)
    assert got.count() == 4


def test_export_table_roundtrip(final, spark):
    """Catalog-table sink/source (the Iceberg path wherever an Iceberg
    catalog is configured; the builtin catalog locally): copy-selected ->
    writeTo(identifier), read back via read_pages(fmt="table"), append
    commits a second snapshot."""
    from pysparkdedup.sources import read_pages

    tbl = "pysparkdedup_export_rt"
    try:
        res = perform(final, "copy-selected", tbl, fmt="table")
        assert res["written"] is True
        got = read_pages(spark, tbl, fmt="table")
        assert got.count() == 2
        assert set(got.columns) == {"url", "warc_ts", "html", "text", "lang"}
        perform(final, "copy-selected", tbl, fmt="table", append=True)
        assert spark.read.table(tbl).count() == 4
        # non-append overwrites: back to one snapshot's worth of rows
        perform(final, "copy-selected", tbl, fmt="table")
        assert spark.read.table(tbl).count() == 2
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_export_unknown_format(final, tmp_path):
    with pytest.raises(ValueError, match="unknown export format"):
        perform(final, "copy-selected", str(tmp_path / "x"), fmt="mbox")


def test_pointer_dedup_blocks_differing_bytes(spark):
    """Reference parity (--hardlink-differing, ref action.py:156-192): a
    duplicate whose bytes differ from the kept copy is NOT pointered unless
    explicitly allowed; it keeps its own url and is flagged."""
    rows = [
        ("u/kept", "selected", "c1", "h-same"),
        ("u/same", "discarded", "c1", "h-same"),
        ("u/diff", "discarded", "c1", "h-other"),
    ]
    fake_final = spark.createDataFrame(
        rows, "url string, status string, cluster_key string, raw_hash string")
    strict = {r["url"]: r for r in pointer_dedup(fake_final).collect()}
    assert strict["u/same"]["kept_url"] == "u/kept"
    assert strict["u/diff"]["kept_url"] == "u/diff"  # left as-is
    assert strict["u/diff"]["blocked_differing"]
    assert not strict["u/same"]["blocked_differing"]
    # a blocked self-pointing duplicate is NOT canonical (advice r2):
    # filtering is_canonical yields exactly one kept copy per set
    assert not strict["u/diff"]["is_canonical"]
    assert strict["u/kept"]["is_canonical"]
    assert sum(r["is_canonical"] for r in strict.values()) == 1
    loose = {r["url"]: r for r in
             pointer_dedup(fake_final, allow_differing=True).collect()}
    assert loose["u/diff"]["kept_url"] == "u/kept"
    assert not loose["u/diff"]["blocked_differing"]
    assert not loose["u/diff"]["is_canonical"]


def test_move_discarded_end_to_end(final, tmp_path, spark):
    """move = copy + rewritten source in ONE verb (verdict r2 #5, ref
    move_mails action.py:94-117): the moved rows land at out_path, the
    source rewrite at source_out_path holds everything else, and the two
    partition the input (MAIL_MOVED accounting identity)."""
    out = str(tmp_path / "moved")
    src_out = str(tmp_path / "rewritten")
    res = perform(final, "move-discarded", out, source_out_path=src_out)
    moved = {r["url"] for r in spark.read.parquet(out).collect()}
    kept = {r["url"] for r in spark.read.parquet(src_out).collect()}
    everything = {r["url"] for r in final.select("url").collect()}
    assert moved == {"u/dup-old"}
    assert res["count"] == len(moved) == 1
    assert moved | kept == everything and not (moved & kept)

    # MAIL_MOVED identity holds through check_stats
    from pysparkdedup.stats import Stat, check_stats, compute_stats

    stats = compute_stats(final)
    stats[Stat.MAIL_MOVED] = res["count"]
    check_stats(stats, action="move-discarded")  # raises on mismatch


def test_move_requires_source_out(final, tmp_path):
    with pytest.raises(ValueError, match="source_out_path"):
        perform(final, "move-selected", str(tmp_path / "x"))
    # dry-run computes counts without requiring any paths
    res = perform(final, "move-selected", dry_run=True)
    assert res["written"] is False
