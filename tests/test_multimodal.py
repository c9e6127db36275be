"""Multimodal plumbing tests: schema, batch shape, stub gating."""

import pytest
from pyspark.sql import functions as F

from pysparkdedup.multimodal import (
    exact_binary_dedup, extract_features, with_media_meta,
)
from tests.conftest import ts


def test_extract_features_deterministic(pages_factory):
    df = pages_factory([
        ("u/a", ts(0), "payload one", "en"),
        ("u/b", ts(0), "payload one", "en"),   # same html bytes
        ("u/c", ts(0), "payload two", "en"),
    ])
    rows = {r["url"]: r for r in extract_features(df, feature_dim=8).collect()}
    assert rows["u/a"]["feature"] == rows["u/b"]["feature"]
    assert rows["u/a"]["feature"] != rows["u/c"]["feature"]
    assert len(rows["u/a"]["feature"]) == 8
    assert rows["u/a"]["content_sha"] == rows["u/b"]["content_sha"]
    assert rows["u/a"]["n_bytes"] > 0


def test_real_decode_is_gated(pages_factory):
    df = pages_factory([("u/a", ts(0), "payload", "en")])
    with pytest.raises(Exception):  # NotImplementedError inside executor
        extract_features(df, fake_decode=False).collect()


def test_media_meta_schema(pages_factory):
    df = with_media_meta(pages_factory([("u/a", ts(0), "x", "en")]))
    field = dict(zip(df.schema.names, df.schema.fields))["media_meta"]
    names = [f.name for f in field.dataType.fields]
    assert names == ["media_type", "mime", "width", "height", "duration_ms"]


def test_exact_binary_dedup(pages_factory):
    df = pages_factory([
        ("u/a", ts(0), "same", "en"),
        ("u/b", ts(0), "same", "en"),
        ("u/c", ts(0), "diff", "en"),
    ])
    rows = exact_binary_dedup(df).collect()
    by_copies = sorted(r["n_copies"] for r in rows)
    assert by_copies == [1, 2]
    dup = [r for r in rows if r["n_copies"] == 2][0]
    assert dup["kept_url"] == "u/a"
