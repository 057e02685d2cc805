"""Arrow-batched pandas UDFs for signatures and verification.

These are the engine's only Python-side compute (everything else is
JVM/codegen). Each UDF is vectorized: numpy over Arrow batches, no per-row
Python in the hot loop beyond the unavoidable per-document array ops
(documents are variable-length — the same reason the reference processes
blocks per-segment, rabin/rabin_dedup.c:959-994).

Reference parity:
- sig UDF        ≙ rabin chunking + per-block hashing + KMV sketch
                   (rabin_dedup.c:620-714, :793-797, :976-994)
- jaccard UDF    ≙ memcmp byte-verification of hash matches
                   (rabin_dedup.c:1350-1354) — never trust the sketch alone
- lcs UDF        ≙ bsdiff similar-block delta pairing (bsdiff/bsdiff.c)
- anchors UDF    ≙ content-defined boundary sampling (rabin_dedup.c:664-666)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pcompress_spark.config import PipelineConfig
from pcompress_spark.functions import hashing as H

SIG_SCHEMA = T.StructType(
    [
        T.StructField("nshingles", T.IntegerType()),
        T.StructField("minhash", T.ArrayType(T.LongType())),
        T.StructField("simhash", T.LongType()),
    ]
)


def make_sig_udf(cfg: PipelineConfig):
    """pandas UDF: text -> struct(nshingles, minhash[K], simhash).

    One shingling pass feeds both sketches (the reference likewise derives
    the KMV sketch and similarity_hash from one chunking pass).
    """
    width = cfg.shingle_width
    a_params, b_params = H.minhash_params(cfg.minhash_k, cfg.seed)

    @F.pandas_udf(SIG_SCHEMA)
    def sig_udf(texts: pd.Series) -> pd.DataFrame:
        n = len(texts)
        nsh = np.zeros(n, dtype=np.int32)
        mh = [None] * n
        sh = np.zeros(n, dtype=np.int64)
        for i, t in enumerate(texts):
            shingles = H.shingle_hashes(t or "", width)
            nsh[i] = shingles.size
            mh[i] = H.to_signed(H.minhash_from_shingles(shingles, a_params, b_params))
            sh[i] = np.int64(
                np.uint64(H.simhash_from_shingles(shingles)).view(np.int64)
            )
        return pd.DataFrame({"nshingles": nsh, "minhash": mh, "simhash": sh})

    return sig_udf


def make_sig_udf_lang(cfg: PipelineConfig):
    """Lang-aware sig UDF: (text, lang) -> struct(nshingles, minhash,
    simhash), with per-lang shingle dispatch (P6 adaptive config) — CJK
    docs shingle in codepoints (cfg.cjk_shingle_chars), others in bytes
    (cfg.shingle_width). Dispatch lives in hashing.shingles_for, shared
    with the golden oracle."""
    byte_width = cfg.shingle_width
    cjk_chars = cfg.cjk_shingle_chars
    a_params, b_params = H.minhash_params(cfg.minhash_k, cfg.seed)

    @F.pandas_udf(SIG_SCHEMA)
    def sig_udf(texts: pd.Series, langs: pd.Series) -> pd.DataFrame:
        n = len(texts)
        nsh = np.zeros(n, dtype=np.int32)
        mh = [None] * n
        sh = np.zeros(n, dtype=np.int64)
        for i in range(n):
            shingles = H.shingles_for(
                texts.iloc[i] or "", langs.iloc[i] or "", byte_width, cjk_chars
            )
            nsh[i] = shingles.size
            mh[i] = H.to_signed(
                H.minhash_from_shingles(shingles, a_params, b_params)
            )
            sh[i] = np.int64(
                np.uint64(H.simhash_from_shingles(shingles)).view(np.int64)
            )
        return pd.DataFrame({"nshingles": nsh, "minhash": mh, "simhash": sh})

    return sig_udf


def make_shingle_hashes_lang_udf(cfg: PipelineConfig):
    """Lang-aware twin of make_shingle_hashes_udf: (text, lang) ->
    array<long>, same per-lang dispatch as make_sig_udf_lang so verify
    Jaccard is computed over the same sets the signatures sketched."""
    byte_width = cfg.shingle_width
    cjk_chars = cfg.cjk_shingle_chars

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def shingles_udf(texts: pd.Series, langs: pd.Series) -> pd.Series:
        return pd.Series(
            [
                H.to_signed(
                    H.shingles_for(
                        texts.iloc[i] or "",
                        langs.iloc[i] or "",
                        byte_width,
                        cjk_chars,
                    )
                )
                for i in range(len(texts))
            ]
        )

    return shingles_udf


def make_shingle_hashes_udf(cfg: PipelineConfig):
    """pandas UDF: text -> array<long> of distinct hashed byte-window
    shingles (the exact sets the golden oracle uses). Vectorized numpy
    rolling hash — ~0.5ms/doc vs ~50ms/doc for the equivalent JVM
    higher-order-function expression (per-element lambda + allocation)."""
    width = cfg.shingle_width

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def shingles_udf(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [H.to_signed(H.shingle_hashes(t or "", width)) for t in texts]
        )

    return shingles_udf


def make_jaccard_lang_udf(cfg: PipelineConfig):
    """pandas UDF: (text_a, lang_a, text_b, lang_b) -> exact shingle-set
    Jaccard, per-lang shingle dispatch on each side.

    Ships TEXT through the pair join, not shingle arrays: a doc's utf-8
    text is ~8x smaller than its int64 shingle-hash array, and the array
    join was measured shuffle-bound (verify stage scaling eff 0.54 at
    2->8 cores from memory-bandwidth contention). Re-shingling costs
    ~0.1 ms/doc vectorized — each doc is re-shingled once per candidate
    partner (avg degree ~10, bounded by the degree cap), still far below
    the array-shuffle cost it replaces. Shingle sets are produced by the
    same `shingles_for` the golden oracle uses — identical by
    construction."""
    byte_width = cfg.shingle_width
    cjk_chars = cfg.cjk_shingle_chars

    @F.pandas_udf(T.DoubleType())
    def jaccard_lang_udf(
        text_a: pd.Series,
        lang_a: pd.Series,
        text_b: pd.Series,
        lang_b: pd.Series,
    ) -> pd.Series:
        out = np.zeros(len(text_a), dtype=np.float64)
        for i in range(len(text_a)):
            sa = H.shingles_for(
                text_a.iloc[i] or "", lang_a.iloc[i] or "", byte_width, cjk_chars
            )
            sb = H.shingles_for(
                text_b.iloc[i] or "", lang_b.iloc[i] or "", byte_width, cjk_chars
            )
            out[i] = H.jaccard(sa, sb)
        return pd.Series(out)

    return jaccard_lang_udf


def make_jaccard_udf(cfg: PipelineConfig):
    """pandas UDF: (text_a, text_b) -> exact Jaccard on shingle sets.

    Recomputes shingles from text at verify time instead of persisting the
    (large) shingle arrays through shuffles — shingling is a cheap
    vectorized pass; shipping 8B/char arrays through a join is not.
    """
    width = cfg.shingle_width

    @F.pandas_udf(T.DoubleType())
    def jaccard_udf(text_a: pd.Series, text_b: pd.Series) -> pd.Series:
        out = np.zeros(len(text_a), dtype=np.float64)
        for i in range(len(text_a)):
            sa = H.shingle_hashes(text_a.iloc[i] or "", width)
            sb = H.shingle_hashes(text_b.iloc[i] or "", width)
            out[i] = H.jaccard(sa, sb)
        return pd.Series(out)

    return jaccard_udf


def make_lcs_udf(cfg: PipelineConfig):
    """pandas UDF: (text_a, text_b) -> bool, share >= min_len verbatim span.

    Exact (hash candidates + byte confirmation). Runs only on winnowing
    candidates, mirroring how the reference runs bsdiff only on
    sketch-matched blocks (rabin_dedup.c:1368-1395).
    """
    min_len = cfg.substring_min_len

    @F.pandas_udf(T.BooleanType())
    def lcs_udf(text_a: pd.Series, text_b: pd.Series) -> pd.Series:
        from pcompress_spark.oracle import has_common_substring

        out = np.zeros(len(text_a), dtype=bool)
        for i in range(len(text_a)):
            out[i] = has_common_substring(
                text_a.iloc[i] or "", text_b.iloc[i] or "", min_len
            )
        return pd.Series(out)

    return lcs_udf


def make_window_hashes_udf(cfg: PipelineConfig):
    """pandas UDF: text -> array<long> of distinct `substring_min_len`-byte
    rolling window hashes (every offset).

    Precomputed ONCE per doc so candidate pairs can be screened JVM-side
    with `array_intersect` — two docs share a >= min_len verbatim span iff
    their window-hash sets intersect (modulo 2^-64 collisions, which the
    byte-confirming lcs UDF then rejects). This replaces re-hashing both
    full texts once per candidate pair (the round-1 hot spot).
    """
    min_len = cfg.substring_min_len

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def window_hashes_udf(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                H.to_signed(
                    np.unique(
                        H.window_hashes_all((t or "").encode("utf-8"), min_len)
                    )
                )
                for t in texts
            ]
        )

    return window_hashes_udf


def make_anchors_udf(cfg: PipelineConfig):
    """pandas UDF: text -> array<long> winnowing anchors (substring channel)."""
    width = cfg.substring_window
    stride = cfg.substring_stride

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def anchors_udf(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                H.to_signed(H.winnow_anchors(t or "", width, stride))
                for t in texts
            ]
        )

    return anchors_udf
