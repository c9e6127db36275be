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


def test_parse_image_header_kernel():
    """Pure-stdlib container-header parsing: PNG IHDR, GIF LSD, JPEG SOF."""
    import struct

    from pysparkdedup.multimodal import parse_image_header

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00")
    assert parse_image_header(png) == ("image/png", 640, 480)

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert parse_image_header(gif) == ("image/gif", 320, 200)

    jpeg = (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 12
            + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", 480, 640) + b"\x03")
    assert parse_image_header(jpeg) == ("image/jpeg", 640, 480)

    assert parse_image_header(b"not an image at all") == (None, None, None)
    assert parse_image_header(None) == (None, None, None)


def test_with_media_meta_real_dimensions(spark):
    """with_media_meta fills width/height/mime from real header bytes
    (VERDICT r1 #10: de-stubbed header parsing; pixel decode stays gated)."""
    import struct

    from tests.conftest import PAGES_SCHEMA

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 64, 32) + b"\x08\x02\x00\x00\x00")
    rows = [
        ("u/png", ts(0), png, "x", "en"),
        ("u/opaque", ts(0), b"\x00\x01\x02binary", "x", "en"),
    ]
    df = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    got = {r["url"]: r["media_meta"].asDict()
           for r in with_media_meta(df).collect()}
    assert got["u/png"]["mime"] == "image/png"
    assert (got["u/png"]["width"], got["u/png"]["height"]) == (64, 32)
    assert got["u/opaque"]["mime"] == "application/octet-stream"
    assert got["u/opaque"]["width"] is None


def test_resize_images_plumbing(spark):
    """Resize plumbing: real header-derived source dims + deterministic fake
    bitmap of exactly width*height bytes; duplicate payloads resize
    identically (so resized payloads dedup exactly)."""
    import struct

    from pysparkdedup.multimodal import resize_images
    from tests.conftest import PAGES_SCHEMA

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00")
    rows = [("u/a", ts(0), png, "x", "en"),
            ("u/b", ts(1), png, "x", "en"),
            ("u/null", ts(2), None, "x", "en")]
    df = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    got = {r["url"]: r for r in resize_images(df, width=8, height=4).collect()}
    assert (got["u/a"]["src_width"], got["u/a"]["src_height"]) == (640, 480)
    assert len(bytes(got["u/a"]["resized"])) == 8 * 4
    assert bytes(got["u/a"]["resized"]) == bytes(got["u/b"]["resized"])
    assert got["u/null"]["resized"] is None


def test_resize_real_decode_is_gated(pages_factory):
    from pysparkdedup.multimodal import resize_images

    df = pages_factory([("u/a", ts(0), "payload", "en")])
    with pytest.raises(Exception):
        resize_images(df, fake_decode=False).collect()


def test_sample_frames_plumbing(pages_factory):
    """Frame sampling fans out one row per (url, frame_idx) on an even
    timestamp grid; frames are deterministic per (payload, idx)."""
    from pysparkdedup.multimodal import sample_frames

    df = pages_factory([("u/v1", ts(0), "video-bytes", "en"),
                        ("u/v2", ts(1), "video-bytes", "en")])
    rows = sample_frames(df, n_frames=4, duration_ms=8000).collect()
    assert len(rows) == 8
    v1 = sorted((r["frame_idx"], r["frame_ms"]) for r in rows
                if r["url"] == "u/v1")
    assert v1 == [(0, 0), (1, 2000), (2, 4000), (3, 6000)]
    by_key = {(r["url"], r["frame_idx"]): bytes(r["frame"]) for r in rows}
    assert by_key[("u/v1", 0)] == by_key[("u/v2", 0)]  # same payload
    assert by_key[("u/v1", 0)] != by_key[("u/v1", 1)]  # distinct frames


def test_parse_image_header_corrupt_dims_nulled():
    """uint32 dims that overflow int32 metadata fields degrade to None
    instead of crashing the batch (code-review r2)."""
    import struct

    from pysparkdedup.multimodal import parse_image_header

    bad = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + b"\xff\xff\xff\xff" * 2 + b"\x08")
    assert parse_image_header(bad) == ("image/png", None, None)


def test_resize_large_target_dims(pages_factory):
    """Targets > 255 must work (code-review r2: bytes([w,h]) ValueError)."""
    from pysparkdedup.multimodal import resize_images

    df = pages_factory([("u/a", ts(0), "payload", "en")])
    row = resize_images(df, width=256, height=2).collect()[0]
    assert len(bytes(row["resized"])) == 512


def test_with_media_meta_duplicate_urls_row_for_row(spark):
    """Duplicate urls (raw pre-dedup crawl input) must not multiply rows
    (code-review r2: the old join-based implementation produced n^2)."""
    from tests.conftest import PAGES_SCHEMA

    rows = [("u/same", ts(0), b"x1", "a", "en"),
            ("u/same", ts(1), b"x2", "b", "en")]
    df = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    from pysparkdedup.multimodal import with_media_meta

    out = with_media_meta(df)
    assert out.count() == 2
    assert all(r["media_meta"]["mime"] == "application/octet-stream"
               for r in out.collect())


def _make_png(width, height, value=128):
    """Minimal valid grayscale PNG via stdlib zlib — lets the PIL-gated real
    decode path run wherever Pillow exists, with no test asset files."""
    import struct
    import zlib

    def chunk(typ, data):
        raw = typ + data
        return (struct.pack(">I", len(data)) + raw
                + struct.pack(">I", zlib.crc32(raw) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # 8-bit gray
    scanlines = b"".join(b"\x00" + bytes([value]) * width
                         for _ in range(height))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scanlines)) + chunk(b"IEND", b""))


def _have_pil():
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


@pytest.mark.skipif(not _have_pil(), reason="Pillow not installed — the "
                    "plug-in gate keeps real decode env-dependent")
def test_extract_features_real_pil_decode(spark):
    """With Pillow present, fake_decode=False decodes REAL pixels: a uniform
    gray PNG yields a constant feature vector at value/255."""
    from tests.conftest import PAGES_SCHEMA

    png = _make_png(8, 8, value=100)
    df = spark.createDataFrame([("u/png", ts(0), png, "x", "en")],
                               schema=PAGES_SCHEMA)
    row = extract_features(df, feature_dim=4, fake_decode=False).first()
    assert row["feature"] == pytest.approx([100 / 255.0] * 4)


@pytest.mark.skipif(not _have_pil(), reason="Pillow not installed")
def test_resize_images_real_pil_resample(spark):
    from pysparkdedup.multimodal import resize_images
    from tests.conftest import PAGES_SCHEMA

    png = _make_png(16, 8, value=30)
    df = spark.createDataFrame([("u/png", ts(0), png, "x", "en")],
                               schema=PAGES_SCHEMA)
    row = resize_images(df, width=4, height=2, fake_decode=False).first()
    assert (row["src_width"], row["src_height"]) == (16, 8)
    assert row["resized"] == bytes([30] * 8)  # 4x2 raw grayscale bitmap
