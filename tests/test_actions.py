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
