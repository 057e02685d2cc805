"""Content-defined chunking (operators/cdc.py).

Pins the properties the reference's rabin chunker is built for
(rabin/rabin_dedup.c:620-724): chunks reassemble to the original bytes,
boundaries are content-defined (shift-resynchronizing), min/max bounds
hold, and CDC finds cross-doc shared chunks that grid-aligned fixed
blocks structurally cannot after a 1-char shift.
"""

import hashlib

import numpy as np
import pytest

from pcompress_spark.operators import cdc


def _naive_cuts(data: bytes, width, mask_bits, min_len, max_len):
    """Per-byte reference chunker: naive window hash at every offset,
    same bound walk — the oracle for cut_positions_bytes."""
    from pcompress_spark.functions.hashing import _MULT

    n = len(data)
    if n == 0:
        return []
    mask = (1 << mask_bits) - 1
    cand = []
    for j in range(0, n - width + 1):
        h = 0
        for t in range(width):
            h = (h * int(_MULT) + data[j + t]) % (1 << 64)
        if h & mask == 0:
            cand.append(j + width)
    cuts, start = [], 0
    while True:
        nxt = [c for c in cand if start + min_len <= c <= start + max_len]
        if nxt and nxt[0] < n:
            cut = nxt[0]
        elif start + max_len < n:
            cut = start + max_len
        else:
            break
        cuts.append(cut)
        start = cut
    cuts.append(n)
    return cuts


@pytest.fixture(scope="module")
def sample_texts(pages_pdf):
    return list(pages_pdf["text"].head(60))


def test_rolling_cuts_match_naive(sample_texts):
    rng = np.random.default_rng(7)
    blobs = [t.encode("utf-8") for t in sample_texts[:10]] + [
        rng.integers(0, 256, size=m, dtype=np.uint8).tobytes()
        for m in (0, 1, 15, 16, 17, 300, 1000)
    ]
    for b in blobs:
        got = cdc.cut_positions_bytes(b, 16, 6, 32, 256)
        want = _naive_cuts(b, 16, 6, 32, 256)
        assert got == want


def test_rolling_bounds_and_reassembly(sample_texts):
    for t in sample_texts:
        b = t.encode("utf-8")
        cuts = cdc.cut_positions_bytes(b, 16, 6, 32, 256)
        if not b:
            assert cuts == []
            continue
        assert cuts[-1] == len(b)
        prev = 0
        for i, c in enumerate(cuts):
            ln = c - prev
            assert ln <= 256
            if i < len(cuts) - 1:
                assert ln >= 32
            prev = c


def test_rolling_shift_resync():
    """Insert a prefix: chunking resynchronizes — the tail chunks of the
    shifted doc are (mostly) the same byte spans as the original's."""
    rng = np.random.default_rng(11)
    b = rng.integers(0, 256, size=4000, dtype=np.uint8).tobytes()
    shifted = b"PREFIX-INSERTED:" + b

    def shas(data):
        cuts = cdc.cut_positions_bytes(data, 16, 6, 32, 256)
        prev, out = 0, []
        for c in cuts:
            out.append(hashlib.sha256(data[prev:c]).hexdigest()[:16])
            prev = c
        return out

    s1, s2 = set(shas(b)), set(shas(shifted))
    # all but the first few pre-resync chunks must be shared
    assert len(s1 & s2) >= len(s1) - 3


def test_sql_chunker_reassembles(spark, pages_df):
    docs = pages_df.selectExpr("xxhash64(url) as doc_id", "text").limit(80)
    chunks = cdc.chunk_explode(docs).toPandas()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(chunks["doc_id"]) == {d for d, t in texts.items() if t}
    for doc_id, grp in chunks.groupby("doc_id"):
        grp = grp.sort_values("chunk_idx")
        t = texts[doc_id]
        # offsets tile the doc exactly
        assert grp["off"].iloc[0] == 0
        assert (grp["off"] + grp["chunk_len"]).iloc[-1] == len(t)
        assert (
            grp["off"].iloc[1:].to_numpy()
            == (grp["off"] + grp["chunk_len"]).iloc[:-1].to_numpy()
        ).all()
        # chunk hashes are of the real substrings
        for _, r in grp.head(4).iterrows():
            sub = t[r["off"]: r["off"] + r["chunk_len"]]
            assert hashlib.sha256(sub.encode()).hexdigest()[:16] == r["chunk_sha"]


def test_sql_chunker_shift_invariance(spark):
    """The unbounded sha-rule cuts shift exactly with an inserted prefix:
    every chunk of the original after its first cut reappears verbatim in
    the shifted doc's chunk set (what makes CDC dedup work)."""
    base = "".join(f"sentence {i % 89} of the corpus body. " for i in range(160))
    df = spark.createDataFrame(
        [(1, base), (2, "an inserted leading clause. " + base)],
        "doc_id long, text string",
    )
    ch = cdc.chunk_explode(df).toPandas()
    g1 = ch[ch.doc_id == 1].sort_values("chunk_idx")
    g2 = ch[ch.doc_id == 2]
    interior = g1["chunk_sha"].iloc[1:]          # all but the head chunk
    assert len(interior) >= 3
    assert set(interior) <= set(g2["chunk_sha"])


def test_cdc_beats_fixed_blocks_under_shift(spark):
    """The claim fixed_blocks cannot make: after a 1-char shift, grid
    blocks share nothing but CDC still dedups the shared tail."""
    from pcompress_spark.driver_queries import FIXED_BLK

    base = "".join(f"shared web boilerplate line {i % 53}; " for i in range(120))
    df = spark.createDataFrame(
        [(1, base), (2, "X" + base)], "doc_id long, text string"
    )
    ch = cdc.chunk_explode(df).toPandas()
    shared_cdc = set(ch[ch.doc_id == 1]["chunk_sha"]) & set(
        ch[ch.doc_id == 2]["chunk_sha"]
    )
    assert len(shared_cdc) >= 3

    def grid(t):
        return {
            hashlib.sha256(t[i: i + FIXED_BLK].encode()).hexdigest()
            for i in range(0, len(t), FIXED_BLK)
        }

    assert len(grid(base) & grid("X" + base)) == 0


def test_rolling_spark_variant(spark, pages_df):
    docs = pages_df.selectExpr("xxhash64(url) as doc_id", "text").limit(50)
    out = cdc.cdc_chunks_rolling(docs).toPandas()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, grp in out.groupby("doc_id"):
        grp = grp.sort_values("chunk_idx")
        b = texts[doc_id].encode("utf-8")
        assert (grp["off"] + grp["chunk_len"]).iloc[-1] == len(b)
        r = grp.iloc[0]
        sub = b[r["off"]: r["off"] + r["chunk_len"]]
        assert hashlib.sha256(sub).hexdigest()[:16] == r["chunk_sha"]


def test_dedup_stats_consistency(spark, pages_df):
    docs = pages_df.selectExpr("xxhash64(url) as doc_id", "text").limit(200)
    chunks = cdc.chunk_explode(docs)
    stats = cdc.dedup_stats(chunks).collect()[0]
    total_chars = sum(
        len(r["text"]) for r in docs.collect() if r["text"]
    )
    assert stats["total_chars"] == total_chars
    assert stats["stored_chars"] <= stats["total_chars"]
    assert stats["dedup_ratio"] >= 1.0
    assert stats["distinct_chunks"] <= stats["total_chunks"]
