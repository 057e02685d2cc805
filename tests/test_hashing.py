"""Unit tests: hashing primitives vs pure references (SURVEY §5.1)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pcompress_spark.functions import hashing as H
from pcompress_spark.xxh64 import xxh64, xxh64_signed


def test_xxh64_known_vectors():
    # public xxHash reference vectors (Cyan4973/xxHash)
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    assert xxh64(b"a", 0) == 0xD24EC4F1A98C6E5B


def test_xxh64_matches_spark(spark):
    urls = ["", "x", "abcd", "a" * 7, "a" * 8, "a" * 31, "a" * 32, "a" * 33,
            "https://en.example.org/0000/0000000001", "ü" * 40, "漢字テスト" * 9]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select("url", F.xxhash64("url").alias("h")).collect()
    for r in rows:
        assert r["h"] == xxh64_signed(r["url"]), r["url"]


def test_shingles_deterministic_and_content_defined():
    t = "the quick brown fox jumps over the lazy dog " * 10
    s1 = H.shingle_hashes(t, 16)
    s2 = H.shingle_hashes(t, 16)
    assert np.array_equal(s1, s2)
    assert s1.size > 0
    # offset shift does not change shingle *values* (content-defined)
    shifted = "PREFIX-PADDING " + t
    s3 = H.shingle_hashes(shifted, 16)
    common = np.intersect1d(s1, s3).size
    assert common >= s1.size * 0.95


def test_shingles_short_doc_empty():
    assert H.shingle_hashes("short", 16).size == 0


def test_minhash_jaccard_estimate():
    rng = np.random.default_rng(7)
    base = rng.integers(0, 1 << 63, 2000).astype(np.uint64)
    a_set = np.unique(base)
    b_set = np.unique(np.concatenate([base[:1400], rng.integers(0, 1 << 63, 600).astype(np.uint64)]))
    true_j = H.jaccard(a_set, b_set)
    a, b = H.minhash_params(256, 42)
    ma = H.minhash_from_shingles(a_set, a, b)
    mb = H.minhash_from_shingles(b_set, a, b)
    est = float((ma == mb).mean())
    assert abs(est - true_j) < 0.12  # 256 perms -> ~3 sigma


def test_minhash_identical_sets_equal_sigs():
    a, b = H.minhash_params(20, 42)
    s = np.unique(np.random.default_rng(1).integers(0, 1 << 63, 500).astype(np.uint64))
    assert np.array_equal(
        H.minhash_from_shingles(s, a, b), H.minhash_from_shingles(s, a, b)
    )


def test_simhash_similar_docs_close():
    rng = np.random.default_rng(3)
    base = np.unique(rng.integers(0, 1 << 63, 3000).astype(np.uint64))
    sim = np.unique(np.concatenate([base[:2900], rng.integers(0, 1 << 63, 100).astype(np.uint64)]))
    far = np.unique(rng.integers(0, 1 << 63, 3000).astype(np.uint64))
    h_base = H.simhash_from_shingles(base)
    h_sim = H.simhash_from_shingles(sim)
    h_far = H.simhash_from_shingles(far)
    assert H.hamming64(h_base, h_sim) <= 6
    assert H.hamming64(h_base, h_far) > 10


def test_sliding_min_matches_naive():
    rng = np.random.default_rng(11)
    h = rng.integers(0, 1 << 60, 500).astype(np.uint64)
    for s in (3, 7, 64, 499, 500, 700):
        got = H._sliding_min(h, s)
        if h.size <= s:
            assert got.size == 1 and got[0] == h.min()
        else:
            naive = np.array(
                [h[i : i + s].min() for i in range(h.size - s + 1)], dtype=np.uint64
            )
            assert np.array_equal(got, naive), f"s={s}"


def test_winnow_guarantee_shared_span():
    """Two docs sharing a span >= width+stride-1 must share an anchor."""
    rng = np.random.default_rng(5)

    def rand_text(n):
        return "".join(chr(97 + int(c)) for c in rng.integers(0, 26, n))

    span = rand_text(1100)  # >= 64 + 992 - 1
    a = rand_text(3000) + span + rand_text(2000)
    b = rand_text(500) + span + rand_text(4000)
    aa = H.winnow_anchors(a, 64, 992)
    bb = H.winnow_anchors(b, 64, 992)
    assert np.intersect1d(aa, bb).size >= 1


def test_cjk_codepoint_shingles_naive_equiv():
    """shingle_hashes_chars must equal hashing every width-codepoint
    window independently (the O(n*w) definition the O(n) roll replaces)."""
    text = "汉字漢字かな한글" * 12 + "mixed latin 混入テキスト" * 5
    w = 8
    got = H.shingle_hashes_chars(text, w)
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    naive = np.unique(
        H._splitmix64(
            np.array(
                [H.window_hashes_all(cps[i : i + w], w)[0] for i in range(cps.size - w + 1)],
                dtype=np.uint64,
            )
        )
    )
    assert np.array_equal(got, naive)


def test_cjk_dispatch_improves_shingle_granularity():
    """P6 adaptive config: a zh doc gets ~1 shingle per codepoint window;
    byte-domain shingling of the same doc spans only ~5 Han chars per
    16-byte window, over-fragmenting the linguistic units."""
    zh = "这是一个测试文档，包含足够多的汉字来产生许多指纹。" * 20
    char_sh = H.shingles_for(zh, "zh", 16, 8)
    byte_sh = H.shingles_for(zh, "en", 16, 8)
    assert char_sh.size > 0 and byte_sh.size > 0
    # codepoint shingles cover 8 chars; byte shingles cover ~5 — the
    # codepoint domain yields the spec'd width, independent of encoding
    assert char_sh.size == np.unique(
        H.shingle_hashes_chars(zh, 8)
    ).size
    # dispatch: non-CJK langs stay in the byte domain
    assert np.array_equal(H.shingles_for(zh, "fr", 16, 8), H.shingle_hashes(zh, 16))


def test_cjk_near_dup_jaccard_sensitivity():
    """Codepoint shingles must give near-dup zh docs high Jaccard and
    unrelated zh docs low Jaccard (recall precondition for the zh class)."""
    rng = np.random.default_rng(7)
    # non-repetitive synthetic zh: random Han codepoints (U+4E00..U+9FA5)
    def han(n, g):
        return "".join(chr(0x4E00 + int(c)) for c in g.integers(0, 0x9FA5 - 0x4E00, n))

    base = han(600, rng)
    near = base[:560] + han(40, rng)  # ~93% shared prefix
    other = han(600, rng)
    s_base = H.shingle_hashes_chars(base, 8)
    s_near = H.shingle_hashes_chars(near, 8)
    s_other = H.shingle_hashes_chars(other, 8)

    def jac(a, b):
        return np.intersect1d(a, b).size / np.union1d(a, b).size

    assert jac(s_base, s_near) > 0.8
    assert jac(s_base, s_other) < 0.05
