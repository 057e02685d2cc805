"""Suffix-array pass: exact longest-common-substring extraction (F11).

Reference: bsdiff builds a suffix sort over the old block (Larsson-Sadakane
qsufsort, bsdiff/bsdiff.c:~90-200) and walks it to find, for every new-block
offset, the longest verbatim match in the old block — the spans its delta
encoding copies. Document analog: for each verified substring pair, the
single longest shared span (offset in each doc + exact length), the
strongest backref a delta encoder can emit (rabin_dedup.c:1190-1245).

Spark-first shape: the suffix array is built PER CANDIDATE PAIR inside an
Arrow-batched pandas UDF (numpy prefix doubling — Manber-Myers via
np.lexsort, fully vectorized), never globally: candidate generation already
reduced the corpus to verified pairs, so the quadratic-ish global structure
the reference affords on one block never needs to exist cluster-wide.

Domain note: all offsets/lengths are CODEPOINTS (utf-32 units), matching
the char semantics of Spark's `substring` and ANSI `substr` so the driver
oracle can replay the arithmetic in SQL.
"""

from __future__ import annotations

import numpy as np

# one past the unicode codepoint range — never occurs in real text, so the
# concatenation separator matches nothing and no common prefix crosses it
_SEP = 0x110000


def codepoints(text: str) -> np.ndarray:
    """str -> int64 codepoint array (utf-32-le reinterpret, no python loop)."""
    if not text:
        return np.empty(0, dtype=np.int64)
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(
        np.int64
    )


def suffix_array(s: np.ndarray) -> tuple[np.ndarray, list[np.ndarray]]:
    """(sa, rank_levels) for an integer array `s`.

    Prefix doubling (Manber-Myers): at level j, `rank_levels[j][i]` is the
    dense rank of the (truncated) window s[i : i + 2^j]; equal rank <=>
    equal window (same content AND same truncation). `sa` is the suffix
    array. O(n log n) space for the kept levels buys a fully vectorized
    LCP (see lcp_of_pairs) with no per-char python loop — the same
    time/space trade as the reference's qsufsort V/I arrays
    (bsdiff/bsdiff.c:~90-200).
    """
    n = int(s.size)
    if n == 0:
        return np.empty(0, dtype=np.int64), []
    rank = np.unique(s, return_inverse=True)[1].astype(np.int64)
    levels = [rank]
    sa = np.argsort(rank, kind="stable").astype(np.int64)
    k = 1
    while k < n and int(rank[sa[-1]]) < n - 1:
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        sa = np.lexsort((second, rank)).astype(np.int64)
        r_sa = rank[sa]
        s_sa = second[sa]
        diff = np.ones(n, dtype=bool)
        diff[1:] = (r_sa[1:] != r_sa[:-1]) | (s_sa[1:] != s_sa[:-1])
        rank = np.empty(n, dtype=np.int64)
        rank[sa] = np.cumsum(diff) - 1
        levels.append(rank)
        k *= 2
    return sa, levels


def lcp_of_pairs(
    levels: list[np.ndarray], n: int, x: np.ndarray, y: np.ndarray
) -> np.ndarray:
    """Exact LCP of suffix pairs (x[i], y[i]), vectorized over all pairs.

    Descends the doubling levels: where the 2^j-windows at the two cursors
    are full-length and rank-equal, both cursors advance 2^j. Equal rank at
    a level certifies window equality (suffix_array contract), so the
    accumulated advance is exactly the common-prefix length.
    """
    m = x.size
    h = np.zeros(m, dtype=np.int64)
    if m == 0 or not levels:
        return h
    cx = x.astype(np.int64).copy()
    cy = y.astype(np.int64).copy()
    for j in range(len(levels) - 1, -1, -1):
        w = 1 << j
        ok = (cx + w <= n) & (cy + w <= n)
        idx = np.flatnonzero(ok)
        if idx.size == 0:
            continue
        eq = levels[j][cx[idx]] == levels[j][cy[idx]]
        adv = idx[eq]
        h[adv] += w
        cx[adv] += w
        cy[adv] += w
    return h


def lcs_length(a: np.ndarray, b: np.ndarray) -> int:
    """Exact longest-common-substring length of two codepoint arrays.

    Concatenate a ⊕ SEP ⊕ b, build one suffix array, and take the max LCP
    over ADJACENT cross-document entries: the classic reduction — for the
    optimal cross pair, every suffix between them in SA order shares the
    optimum as a prefix, so some adjacent pair in that range also crosses
    documents and attains it (the unique separator pins LCP 0 around
    itself, so it never sits inside a positive-LCP range).
    """
    la = int(a.size)
    if la == 0 or b.size == 0:
        return 0
    s = np.concatenate([a, np.array([_SEP], dtype=np.int64), b])
    sa, levels = suffix_array(s)
    x, y = sa[:-1], sa[1:]
    cross = ((x < la) != (y < la)) & (x != la) & (y != la)
    if not cross.any():
        return 0
    return int(lcp_of_pairs(levels, int(s.size), x[cross], y[cross]).max())


def lcs_span(a: np.ndarray, b: np.ndarray) -> tuple[int, int, int]:
    """(lcs_len, off_a, off_b): the longest shared span and its canonical
    position — minimal off_a, then minimal off_b among maximal spans
    (0-based codepoint offsets).

    Length comes from the suffix array (lcs_length); the canonical
    position from a single rolling-hash pass at width = lcs_len: because
    lcs_len is MAXIMAL, every verified length-lcs_len window match is a
    maximal span start, so the first (off_a, off_b) in lexicographic order
    is the canonical one. Hash hits are byte-confirmed — collisions cannot
    mis-position the span.
    """
    from pcompress_spark.functions.hashing import window_hashes_all

    ln = lcs_length(a, b)
    if ln == 0:
        return 0, 0, 0
    wa = window_hashes_all(a.astype(np.uint64), ln)
    wb = window_hashes_all(b.astype(np.uint64), ln)
    for off_a in np.flatnonzero(np.isin(wa, wb)).tolist():
        win_a = a[off_a : off_a + ln]
        for off_b in np.flatnonzero(wb == wa[off_a]).tolist():
            if np.array_equal(win_a, b[off_b : off_b + ln]):
                return ln, off_a, off_b
    # unreachable short of a 2^-64 hash collision on EVERY candidate;
    # degrade honestly rather than emit a wrong offset
    return ln, -1, -1


def lcs_span_str(text_a: str, text_b: str) -> tuple[int, int, int]:
    """lcs_span over python strings (codepoint domain)."""
    return lcs_span(codepoints(text_a or ""), codepoints(text_b or ""))
