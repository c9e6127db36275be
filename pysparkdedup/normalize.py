"""Normalization kernel — column expressions defining *what counts as a duplicate*.

Each function re-expresses one normalizer of the reference's hashing kernel
(SURVEY.md §2.3) as a JVM-side Catalyst expression (whole-stage-codegen'd; no
Python in the hot path):

- collapse_ws            <- ref mail.py:525-526  (" ".join(value.split()))
- strip_all_ws           <- ref mail.py:431-439  (re.sub(r"\\s", "", line))
- normalize_subject      <- ref mail.py:539-546
- normalize_content_type <- ref mail.py:548-565
- normalize_date_day     <- ref mail.py:567-576
- normalize_address      <- ref mail.py:578-594
- strip_angle_brackets   <- ref mail.py:596-619
- raw_text_hash          <- ref mail.py:423-429  (hash_raw_body)
- normalized_text_hash   <- ref mail.py:431-439  (hash_normalized_body)
- content_hash_expr      <- ref deduplicate.py:574,992 (composite dedup key)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .config import (
    CONTENT_HASH_NORMALIZED,
    CONTENT_HASH_RAW,
    CONTENT_HASH_SKIP,
    DedupConfig,
)


def collapse_ws(col: Column) -> Column:
    """Collapse any run of whitespace to a single space and trim.

    Exactly ``" ".join(value.split())`` (ref mail.py:525-526): Python's
    ``str.split()`` drops leading/trailing whitespace too. Collapse BEFORE
    trimming — F.trim strips only spaces, so leading/trailing tabs/newlines
    must first be collapsed into edge spaces ('\\tfoo' -> ' foo' -> 'foo').
    """
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def strip_all_ws(col: Column) -> Column:
    """Remove every whitespace character.

    The reference's *normalized body*: each line passed through
    ``re.sub(r"\\s", "", line)`` then concatenated (ref mail.py:431-439) —
    removing ALL ``\\s`` linewise then joining with "" is equivalent to
    removing all ``\\s`` from the whole text.
    """
    return F.regexp_replace(col, r"\s", "")


def normalize_subject(col: Column) -> Column:
    """Strip leading Re:/Fwd:/[list-tag] prefixes, repeated, case-insensitive.

    Ref mail.py:539-546. Kept for title-like columns of web pages.
    """
    return F.regexp_replace(col, r"(?i)^(?:(?:re|fwd?): +|\[\w[\w_-]*\w?\] +)+", "")


def normalize_content_type(col: Column) -> Column:
    """Keep the MIME type, drop ``;``-separated parameters (ref mail.py:548-565)."""
    return F.lower(F.trim(F.regexp_replace(col, r";.*", "")))


def normalize_date_day(col: Column) -> Column:
    """Collapse a timestamp to its UTC ``YYYY-MM-DD`` day (ref mail.py:567-576)."""
    return F.date_format(col, "yyyy-MM-dd")


def normalize_address(col: Column) -> Column:
    """Drop double quotes, collapse whitespace, strip angle brackets around the
    address part (ref mail.py:578-594)."""
    no_quotes = F.regexp_replace(col, '"', "")
    collapsed = collapse_ws(no_quotes)
    return F.regexp_replace(collapsed, r"[<>]", "")


def strip_angle_brackets(col: Column) -> Column:
    """``<token>`` -> ``token`` iff the value is a single bracketed token with no
    commas; otherwise unchanged (ref mail.py:596-619)."""
    extracted = F.regexp_extract(col, r"^<([^<>,]+)>$", 1)
    return F.when(extracted != "", extracted).otherwise(col)


def normalize_url(col: Column) -> Column:
    """Canonicalize a URL into a dedup identity key — the web analog of the
    reference's path/message-id normalizers (ref mail.py:176-193, 596-619):
    near-identical locators must collapse to one key before URL-level dedup.

    Steps (regexp chain, order matters; RE2-compatible — no lookaround — so
    the DuckDB oracle replays it exactly):
      1. strip the fragment (#...)
      2. lowercase scheme + authority (path/query case is significant)
      3. drop the scheme's OWN default port — :80 after http://, :443 after
         https:// only (http://h:443 is a genuinely different origin than
         http://h, so a blanket strip would falsely merge identities) —
         anchored to the authority, so a ':80' inside a path/query is never
         touched
      4. drop tracking params (utm_*, fbclid, gclid) — anchored to a
         preceding '?'/'&', so longer param names (myfbclid=…) survive —
         keeping the separator, then tidy '&&'/'?&' runs
      5. strip a trailing '?'/'&', then a trailing '/'
    """
    no_frag = F.regexp_replace(col, "#.*$", "")
    lowered = F.concat(
        F.lower(F.regexp_extract(no_frag, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)),
        F.regexp_replace(no_frag, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", ""),
    )
    no_port = F.regexp_replace(
        F.regexp_replace(lowered, "^(http://[^/?#:]*):80([/?]|$)", "$1$2"),
        "^(https://[^/?#:]*):443([/?]|$)", "$1$2")
    no_track = F.regexp_replace(
        no_port, "([?&])(utm_[a-z]+|fbclid|gclid)=[^&#]*", "$1")
    tidy = F.regexp_replace(
        F.regexp_replace(no_track, "&&+", "&"), r"\?&", "?")
    tidy = F.regexp_replace(tidy, "[?&]$", "")
    return F.regexp_replace(tidy, "/$", "")


def raw_text_hash(text: Column, bits: int = 256) -> Column:
    """SHA-2 of the raw text — ref ``hash_raw_body`` (mail.py:423-429)."""
    return F.sha2(text, bits)


def normalized_text_hash(text: Column, bits: int = 256) -> Column:
    """SHA-2 of the whitespace-stripped text — ref ``hash_normalized_body``
    (mail.py:431-439). The exact-dup groupBy key."""
    return F.sha2(strip_all_ws(text), bits)


def content_hash_expr(cfg: DedupConfig, text: Column = None) -> Column:
    """The config-selected dedup key expression (ref deduplicate.py:574,992,
    BodyHasher dispatch deduplicate.py:164-178). Pure column algebra — the
    reference's enum-of-functions becomes an expression registry."""
    if text is None:
        text = F.col("text")
    if cfg.content_hash_mode == CONTENT_HASH_RAW:
        return raw_text_hash(text, cfg.hash_bits)
    if cfg.content_hash_mode == CONTENT_HASH_NORMALIZED:
        return normalized_text_hash(text, cfg.hash_bits)
    if cfg.content_hash_mode == CONTENT_HASH_SKIP:
        return metadata_hash(text, bits=cfg.hash_bits)
    raise ValueError(f"unknown content_hash_mode: {cfg.content_hash_mode}")


def metadata_hash(text: Column = None, lang: Column = None,
                  warc_ts: Column = None, bits: int = 256) -> Column:
    """BodyHasher.SKIP analog (ref deduplicate.py:167,175): the reference keys
    on the serialized-header hash alone, never reading the body. Web rows carry
    no headers, so the stated analog keys on the metadata tuple
    (lang, UTC day of warc_ts, normalized first line as the 'subject') —
    the body influences the key only through its title-like first line."""
    if text is None:
        text = F.col("text")
    if lang is None:
        lang = F.col("lang")
    if warc_ts is None:
        warc_ts = F.col("warc_ts")
    first_line = F.split(F.coalesce(text, F.lit("")), "\n").getItem(0)
    return F.sha2(
        F.concat_ws(
            "|",
            F.coalesce(lang, F.lit("")),
            F.coalesce(normalize_date_day(warc_ts), F.lit("")),
            normalize_subject(collapse_ws(first_line)),
        ),
        bits,
    )
