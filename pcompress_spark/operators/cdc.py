"""Content-defined chunking (CDC) — the reference's defining primitive.

The reference's core is a rabin rolling-fingerprint chunker: a W-byte
window hash is evaluated at every offset and the stream is cut wherever
the hash satisfies a sparse predicate, yielding variable-length chunks
whose boundaries move WITH the content — an insertion early in a file
shifts every byte, yet all chunks after the first resynchronizing cut
hash identically to before, which is what makes chunk-level dedup work
(rabin/rabin_dedup.c:620-666 rolling window; :513-538 the fixed-block
bypass our `fixed_blocks` query models; rabin_dedup.h:85-96 window=16 /
min/avg/max block bounds).

Two implementations, same semantics family:

- `cdc_cut_positions` / `chunk_explode` — pure-codegen chunker. Boundary
  rule: cut after character i iff the sha-256 hex of the W-char window
  ending at i starts below a threshold prefix (P = threshold/256 per
  position, so the mean chunk length is 256/threshold). sha-256 here
  plays the rabin polynomial's role as the window fingerprint; it is
  chosen because BOTH engines of the correctness gate (Spark `sha2`,
  DuckDB `sha256`) compute it identically over identical char-domain
  substrings, so the whole chunker is oracle-replicable SQL. Unbounded
  (no min/max): every predicate hit cuts, exactly the textbook
  content-defined scheme.

- `cdc_chunks_rolling` — the production-shaped variant: O(n) polynomial
  rolling hashes over UTF-8 BYTES (functions/hashing.window_hashes_all —
  the same modular-inverse prefix-sum roll the winnowing channel uses),
  sparse mask predicate, and the reference's min/avg/max chunk bounds
  (rabin_dedup.h:87-96): candidate cuts closer than `min_len` to the
  previous cut are skipped, and a cut is forced at `max_len` when no
  candidate lands in [min_len, max_len]. Arrow-batched mapInPandas; the
  per-doc bound enforcement is a numpy searchsorted walk over the
  candidate array (O(#chunks log #candidates) per doc — the sequential
  dependency is inherent to min/max CDC and stays inside one row).
  Equality with a naive per-byte Python chunker is pinned in
  tests/test_cdc.py, as are the reassembly and boundary-shift
  (resynchronization) properties.

Scale: chunk rows are (long, int, int, 16-char sha prefix) — narrow;
chunk-level dedup is one hash-partitioned groupBy on the chunk hash, the
same shuffle shape as `fixed_blocks`. Nothing here collects to the
driver; at 100 TB the chunker is a scan-side projection and the dedup agg
is the only shuffle.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

CDC_WIDTH = 16       # window chars/bytes (reference: RAB_POLYNOMIAL_WIN_SIZE 16)
CDC_PREFIX = "04"    # cut iff sha2(window)[0:2] < this hex prefix -> P=4/256,
                     # mean chunk 64 chars (matches FIXED_BLK for comparability)


def _cuts_expr(width: int, prefix: str, text_col: str = "text") -> str:
    """SQL array of cut positions (1-based char index of each boundary's
    last window char), strictly inside (0, length) so chunk bounds are
    monotone. Identical text -> identical cuts in Spark and DuckDB."""
    t = text_col
    return (
        f"filter(transform("
        f"IF(length({t}) >= {width}, sequence({width}, length({t})), array()),"
        f" i -> IF(substring(sha2(substring({t}, i-{width - 1}, {width}), 256),"
        f" 1, {len(prefix)}) < '{prefix}', i, -1)),"
        f" x -> x > 0 AND x < length({t}))"
    )


def chunk_explode(
    docs: DataFrame,
    width: int = CDC_WIDTH,
    prefix: str = CDC_PREFIX,
) -> DataFrame:
    """(doc_id, chunk_idx, off, chunk_len, chunk_sha): one row per
    content-defined chunk. `off` is the 0-based char offset, chunks
    concatenate back to the doc text (pinned in tests), `chunk_sha` is
    the 16-hex-char sha-256 prefix of the chunk text (F2 identity key)."""
    cuts = _cuts_expr(width, prefix)
    bounded = docs.filter(F.length("text") > 0).select(
        "doc_id",
        "text",
        F.expr(
            f"concat(array(0), {cuts}, array(length(text)))"
        ).alias("bounds"),
    )
    return bounded.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(bounds) - 1), j -> struct("
                "j - 1 as chunk_idx,"
                " element_at(bounds, j) as off,"
                " element_at(bounds, j + 1) - element_at(bounds, j) as chunk_len,"
                " substring(sha2(substring(text, element_at(bounds, j) + 1,"
                " element_at(bounds, j + 1) - element_at(bounds, j)), 256),"
                " 1, 16) as chunk_sha))"
            )
        ).alias("c"),
    ).select("doc_id", "c.chunk_idx", "c.off", "c.chunk_len", "c.chunk_sha")


def chunk_dedup(chunks: DataFrame) -> DataFrame:
    """Chunk-level identity dedup [J1/A3 over CDC chunks]: per distinct
    chunk hash — occurrence count, distinct docs, earliest holder
    (backward-ref representative), chunk length. The reference's
    global-dedup index keyed by chunk checksum (rabin/global/index.c)."""
    return chunks.groupBy("chunk_sha").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.min("doc_id").alias("rep_doc"),
        F.max("chunk_len").alias("chunk_len"),
    )


def dedup_stats(chunks: DataFrame) -> DataFrame:
    """One-row corpus dedup statistic — the reference's headline number
    (pcompress prints chunks_total/chunks_unique + bytes saved;
    rabin_dedup.c dedupe stats). stored_chars counts each distinct chunk
    once (its retained copy); dedup_ratio = total/stored."""
    per = chunks.groupBy("chunk_sha").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("chunk_len").alias("l"),
    )
    return per.agg(
        F.sum("n").cast("long").alias("total_chunks"),
        F.count(F.lit(1)).cast("long").alias("distinct_chunks"),
        F.sum(F.col("n") * F.col("l")).cast("long").alias("total_chars"),
        F.sum("l").cast("long").alias("stored_chars"),
        F.round(
            F.sum(F.col("n") * F.col("l")) / F.sum("l"), 6
        ).alias("dedup_ratio"),
    )


# ---------------------------------------------------------------------------
# Production-shaped variant: O(n) rolling hash over bytes + min/max bounds
# ---------------------------------------------------------------------------

CDC_MIN_LEN = 32     # reference scales min/max off the average (rabin_dedup.h)
CDC_MAX_LEN = 256
CDC_MASK_BITS = 6    # cut iff low 6 bits of window hash == 0 -> avg 64 bytes


def cut_positions_bytes(
    data: bytes,
    width: int = CDC_WIDTH,
    mask_bits: int = CDC_MASK_BITS,
    min_len: int = CDC_MIN_LEN,
    max_len: int = CDC_MAX_LEN,
) -> list[int]:
    """Bounded CDC cut positions (byte offsets, exclusive chunk ends) for
    one document. Candidates = every offset whose W-byte window hash has
    `mask_bits` low zero bits; the walk then enforces the reference's
    bounds: skip candidates < min_len after the previous cut, force a cut
    at max_len when the window [min_len, max_len] has no candidate
    (rabin_dedup.c:666-724 equivalent logic). Final partial chunk may be
    shorter than min_len."""
    from pcompress_spark.functions.hashing import window_hashes_all

    n = len(data)
    if n == 0:
        return []
    mask = np.uint64((1 << mask_bits) - 1)
    h = window_hashes_all(data, width)
    # h[j] covers bytes [j, j+width); a hit cuts AFTER byte j+width-1
    cand = (np.nonzero((h & mask) == 0)[0] + width) if h.size else np.empty(
        0, dtype=np.int64
    )
    cuts: list[int] = []
    start = 0
    while True:
        limit = start + max_len
        lo = np.searchsorted(cand, start + min_len, side="left")
        if lo < cand.size and cand[lo] <= limit and cand[lo] < n:
            cut = int(cand[lo])          # candidate inside the bound window
        elif limit < n:
            cut = limit                  # no candidate -> forced max_len cut
        else:
            break                        # tail chunk runs to EOF
        cuts.append(cut)
        start = cut
    cuts.append(n)
    return cuts


def cdc_chunks_rolling(
    docs: DataFrame,
    width: int = CDC_WIDTH,
    mask_bits: int = CDC_MASK_BITS,
    min_len: int = CDC_MIN_LEN,
    max_len: int = CDC_MAX_LEN,
) -> DataFrame:
    """(doc_id, chunk_idx, off, chunk_len, chunk_sha) over UTF-8 bytes
    with the reference's min/avg/max bounds. Arrow-batched mapInPandas;
    offsets/lengths are BYTE units (the rabin domain), chunk_sha is the
    16-hex sha-256 prefix of the chunk bytes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            offs: list[int] = []
            lens: list[int] = []
            shas: list[str] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = (text or "").encode("utf-8")
                prev = 0
                for k, cut in enumerate(
                    cut_positions_bytes(b, width, mask_bits, min_len, max_len)
                ):
                    ids.append(doc_id)
                    idxs.append(k)
                    offs.append(prev)
                    lens.append(cut - prev)
                    shas.append(
                        hashlib.sha256(b[prev:cut]).hexdigest()[:16]
                    )
                    prev = cut
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "off": pd.Series(offs, dtype="int32"),
                    "chunk_len": pd.Series(lens, dtype="int32"),
                    "chunk_sha": pd.Series(shas, dtype="object"),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        gen,
        "doc_id long, chunk_idx int, off int, chunk_len int, chunk_sha string",
    )
