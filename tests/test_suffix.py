"""Suffix-array pass: exactness vs naive references (no Spark needed).

Mirrors the reference's bsdiff suffix-sort verification posture
(docs/TESTING.md round-trip gates): the vectorized structures must agree
with the O(n^2)-style naive definitions on adversarial small inputs.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pcompress_spark.functions.suffix import (
    codepoints,
    lcp_of_pairs,
    lcs_length,
    lcs_span,
    lcs_span_str,
    suffix_array,
)


def naive_sa(s: str) -> list[int]:
    return sorted(range(len(s)), key=lambda i: s[i:])


def naive_lcs(a: str, b: str) -> int:
    """O(n*m) DP longest common substring length."""
    best = 0
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0] * (len(b) + 1)
        for j, cb in enumerate(b, 1):
            if ca == cb:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    return best


# small alphabet forces repeats/ties — the adversarial regime for suffix
# sorting and for maximal-span canonicalization
TEXT = st.text(alphabet="abc", max_size=60)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_suffix_array_matches_naive(s: str) -> None:
    sa, _ = suffix_array(codepoints(s))
    assert sa.tolist() == naive_sa(s)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_lcp_matches_naive(s: str) -> None:
    cp = codepoints(s)
    sa, levels = suffix_array(cp)
    if len(s) < 2:
        return
    x, y = sa[:-1], sa[1:]
    h = lcp_of_pairs(levels, len(s), x, y)
    for xi, yi, hi in zip(x.tolist(), y.tolist(), h.tolist()):
        sx, sy = s[xi:], s[yi:]
        naive = 0
        while naive < min(len(sx), len(sy)) and sx[naive] == sy[naive]:
            naive += 1
        assert hi == naive


@settings(max_examples=200, deadline=None)
@given(TEXT, TEXT)
def test_lcs_length_matches_dp(a: str, b: str) -> None:
    assert lcs_length(codepoints(a), codepoints(b)) == naive_lcs(a, b)


@settings(max_examples=150, deadline=None)
@given(TEXT, TEXT)
def test_lcs_span_is_canonical_and_verbatim(a: str, b: str) -> None:
    ln, off_a, off_b = lcs_span_str(a, b)
    assert ln == naive_lcs(a, b)
    if ln == 0:
        assert (off_a, off_b) == (0, 0)
        return
    # verbatim: the reported span really is shared
    assert a[off_a : off_a + ln] == b[off_b : off_b + ln]
    # canonical: lexicographically smallest (off_a, off_b) among maximal
    spans = [
        (i, j)
        for i in range(len(a) - ln + 1)
        for j in range(len(b) - ln + 1)
        if a[i : i + ln] == b[j : j + ln]
    ]
    assert (off_a, off_b) == min(spans)


@pytest.mark.parametrize(
    ("a", "b", "want"),
    [
        ("", "", 0),
        ("x", "", 0),
        ("abc", "xyz", 0),
        ("same", "same", 4),
        ("aaaa", "aa", 2),
        ("汉字文本去重引擎", "重引擎测试", 3),  # CJK: codepoint domain
        ("ab" * 30, "ba" * 30, 59),  # periodic ties
    ],
)
def test_lcs_known_answers(a: str, b: str, want: int) -> None:
    ln, off_a, off_b = lcs_span_str(a, b)
    assert ln == want
    if want:
        assert a[off_a : off_a + ln] == b[off_b : off_b + ln]


def test_lcs_span_long_planted() -> None:
    """A 2048-char planted span (production substring_min_len scale) is
    recovered exactly, at the right offsets."""
    rng = np.random.default_rng(7)
    span = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 2048))
    a = "A" * 100 + span + "B" * 50
    b = "C" * 37 + span + "D" * 200
    ln, off_a, off_b = lcs_span_str(a, b)
    assert (ln, off_a, off_b) == (2048, 100, 37)
