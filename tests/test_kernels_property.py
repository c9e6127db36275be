"""Property-based tests for the pure-numpy kernels (no SparkSession needed).

The vectorized kernels (tokenhash byte-LUT tokenizer, suffix array) implement
documented semantics; hypothesis checks them against direct Python reference
implementations of those semantics over adversarial inputs.
"""

from __future__ import annotations

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pysparkdedup.suffix import suffix_array
from pysparkdedup.tokenhash import batch_token_hashes

# The kernel's documented token rule over UTF-8 bytes: word bytes are
# [0-9a-z_] after ASCII lowering, plus every byte >= 0x80
# (pysparkdedup/tokenhash.py module doc).
_TOKEN_RE = re.compile(rb"[0-9A-Za-z_\x80-\xff]+")


def ref_tokens(s: str) -> list[bytes]:
    return [t.lower() for t in
            _TOKEN_RE.findall(s.encode("utf-8", "surrogatepass"))]


texts = st.text(
    alphabet=st.characters(codec="utf-8"),
    max_size=200,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(texts, max_size=8))
def test_token_counts_match_reference(batch):
    doc_lens, hashes = batch_token_hashes(batch)
    expected = [len(ref_tokens(t)) for t in batch]
    assert doc_lens.tolist() == expected
    assert len(hashes) == sum(expected)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_token_hashes_follow_token_identity(s):
    """Equal byte-tokens hash equal; the hash stream is per-token in order
    and case-insensitive (ASCII)."""
    toks = ref_tokens(s)
    # ASCII-only uppercasing (the kernel lowercases ASCII only; Unicode case
    # maps like 'ß'->'SS' change the byte sequence and are out of scope)
    ascii_upper = "".join(
        c.upper() if "a" <= c <= "z" else c for c in s)
    _, h1 = batch_token_hashes([s])
    _, h2 = batch_token_hashes([ascii_upper])
    assert np.array_equal(h1, h2)  # ASCII case-insensitive
    # identical tokens at different positions share a hash
    seen: dict[bytes, int] = {}
    for tok, h in zip(toks, h1.tolist()):
        if tok in seen:
            assert seen[tok] == h
        seen[tok] = h


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abc\x01", max_size=60))
def test_suffix_array_matches_naive(s):
    got = suffix_array(s).tolist()
    expected = sorted(range(len(s)), key=lambda i: s[i:])
    assert got == expected
