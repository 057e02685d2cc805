"""Read-back path: reconstruction audit + shared-span delta descriptors.

The reference is not just a detector — `pcompress -d` re-expands the
archive and byte-verifies every chunk against its stored checksum
(pcompress.c:838 decompression entry; rabin/rabin_dedup.c:1552-1723
backward-ref resolution re-materializing deduped chunks from their
originals; bsdiff/bspatch.c applying deltas). These operators are that
entry point re-expressed over the dedup tables:

- `reconstruct_audit` — rebuild every identity-dup member's text from its
  representative (the only stored copy) and re-verify the rebuilt bytes
  against the member's own content hash. The analog of backward-ref
  resolution + checksum verify on read-back.
- `delta_spans`       — per verified substring pair, a compact shared-span
  descriptor (start offset in each doc + shared-window count + estimated
  span length) computed from L-length window matches: the analog of the
  dedupe-index backref entry (rabin_dedup.c:1190-1245) that records
  *where* the shared bytes live, which is what a delta encoder consumes.

Both are pure DataFrame compositions — joins, groupBy, codegen string
exprs; no Python in the hot path. Window matching joins on
`xxhash64(window)` (8-byte keys in the shuffle, never 96-char strings);
an in-doc collision merges two positions (P ~ 2^-64 per doc) and a
cross-doc collision is excluded upstream by the byte-confirmed pair set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def identity_index(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(members, reps): the stored form of an identity-deduped corpus.

    members(doc_id, text_sha, rep_id) — every doc, text replaced by a
    backward ref; reps(rep_id, rep_text) — the one retained copy per
    distinct text (earliest doc_id wins, J7 backward-ref semantics).
    """
    d = docs.select(
        "doc_id", "text", F.sha2("text", 256).alias("text_sha")
    )
    g = d.groupBy("text_sha").agg(F.min("doc_id").alias("rep_id"))
    members = d.join(g, "text_sha").select("doc_id", "text_sha", "rep_id")
    reps = (
        d.join(g, "text_sha")
        .filter(F.col("doc_id") == F.col("rep_id"))
        .select("rep_id", F.col("text").alias("rep_text"))
    )
    return members, reps


def reconstruct_audit(docs: DataFrame) -> DataFrame:
    """Rebuild each doc from its representative and hash-verify the bytes.

    -> (doc_id, rep_id, is_dup, rebuilt_sha_prefix, sha_ok). `sha_ok`
    compares sha256(rebuilt text) against the member's own stored
    text_sha — a false value means the read-back path lost bytes (the
    failure `pcompress -d`'s chunk checksums exist to catch). The rep join
    shuffles only (rep_id, rep_text) for distinct texts, not the corpus.
    """
    members, reps = identity_index(docs)
    rebuilt = members.join(reps, "rep_id").withColumn(
        "rebuilt_sha", F.sha2("rep_text", 256)
    )
    return rebuilt.select(
        "doc_id",
        "rep_id",
        (F.col("doc_id") != F.col("rep_id")).alias("is_dup"),
        F.substring("rebuilt_sha", 1, 16).alias("rebuilt_sha_prefix"),
        (F.col("rebuilt_sha") == F.col("text_sha")).alias("sha_ok"),
    )


def window_positions(docs: DataFrame, span_len: int) -> DataFrame:
    """(doc_id, wh, pos): earliest 1-based offset of each distinct
    span_len-char window, hashed to a long. All codegen — transform/
    sequence builds (pos, hash) structs, explode + groupBy(min) keeps the
    first occurrence; only 16-byte rows enter the shuffle."""
    return (
        docs.filter(F.length("text") >= span_len)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(text) - {span_len} + 1),"
                    f" i -> struct(i as pos,"
                    f" xxhash64(substring(text, i, {span_len})) as wh))"
                )
            ).alias("w"),
        )
        .groupBy("doc_id", F.col("w.wh").alias("wh"))
        .agg(F.min("w.pos").alias("pos"))
    )


def delta_spans(
    docs: DataFrame, pairs: DataFrame, span_len: int
) -> DataFrame:
    """Shared-span descriptors for verified substring pairs.

    pairs(id_a, id_b) -> (id_a, id_b, off_a, off_b, n_win, est_span_len):
    off_* = earliest offset of any shared window in each doc, n_win =
    number of distinct shared span_len-char windows, est_span_len =
    n_win + span_len - 1 (exact when the shared content is one contiguous
    run — a run of S chars contributes S - L + 1 distinct windows).
    This tuple is what a delta encoder needs to copy the shared bytes
    from the partner instead of storing them (rabin_dedup.c:1190-1245's
    backref = (index, offset, length) triple).
    """
    w = window_positions(docs, span_len)
    wa = w.select(
        F.col("doc_id").alias("id_a"), "wh", F.col("pos").alias("pos_a")
    )
    wb = w.select(
        F.col("doc_id").alias("id_b"), "wh", F.col("pos").alias("pos_b")
    )
    return (
        pairs.select("id_a", "id_b")
        .join(wa, "id_a")
        .join(wb, ["id_b", "wh"])
        .groupBy("id_a", "id_b")
        .agg(
            F.min("pos_a").cast("long").alias("off_a"),
            F.min("pos_b").cast("long").alias("off_b"),
            F.count(F.lit(1)).alias("n_win"),
        )
        .withColumn("est_span_len", F.col("n_win") + F.lit(span_len - 1))
    )


def apply_delta_spans(
    docs: DataFrame, spans: DataFrame, span_col: str = "est_span_len"
) -> DataFrame:
    """CONSUME the backref descriptors: rebuild each pair's B side from the
    partner's span + B's own unique regions, then byte-verify by content
    hash — the bspatch read-back (bsdiff/bspatch.c:268 applying copy+extra
    blocks; rabin_dedup.c:1685-1703 re-materializing a deduped chunk from
    its original). A descriptor that can't rebuild its member is dead
    plumbing; this is the proof it isn't.

    spans(id_a, id_b, off_a, off_b, est_span_len) ->
    (id_a, id_b, off_a, off_b, est_span_len, sha_ok):
        rebuilt_b = B[1 .. off_b-1]                       (unique prefix)
                  ⊕ A[off_a .. off_a+est_span_len-1]      (copy from partner)
                  ⊕ B[off_b+est_span_len .. ]             (unique suffix)
        sha_ok    = sha256(rebuilt_b) == sha256(B)
    All codegen (substring/concat/sha2) — no Python, no text shuffle
    beyond the two partner-text joins. With the default span_col
    (est_span_len, from delta_spans) the length is exact for contiguous
    shared runs; with span_col="lcs_len" (from lcs_spans, the suffix-array
    pass) the span is verbatim-shared by construction, so sha_ok must hold
    for EVERY pair — the strongest read-back certificate.
    """
    ta = docs.select(
        F.col("doc_id").alias("id_a"), F.col("text").alias("text_a")
    )
    tb = docs.select(
        F.col("doc_id").alias("id_b"), F.col("text").alias("text_b")
    )
    rebuilt = F.concat(
        F.expr("substring(text_b, 1, cast(off_b - 1 as int))"),
        F.expr(f"substring(text_a, cast(off_a as int), cast({span_col} as int))"),
        F.expr(
            f"substring(text_b, cast(off_b + {span_col} as int),"
            " length(text_b))"
        ),
    )
    return (
        spans.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            "off_a",
            "off_b",
            span_col,
            (F.sha2(rebuilt, 256) == F.sha2(F.col("text_b"), 256)).alias(
                "sha_ok"
            ),
        )
    )


def lcs_spans(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Suffix-array pass [F11]: the EXACT longest shared span per verified
    substring pair — (off_a, off_b, lcs_len), offsets 1-based codepoints.

    Where `delta_spans` estimates span length from L-window match counts
    (exact only for one contiguous run), this is the maximal backref: a
    per-pair suffix array + vectorized LCP (functions/suffix.py — the
    bsdiff qsufsort analog, bsdiff/bsdiff.c:~90-200) extracts the true
    longest span, canonically positioned (min off_a, then min off_b among
    maximal spans) so the result is deterministic and SQL-replayable.

    Scale shape: one Arrow batch row per VERIFIED pair (already
    degree-capped + byte-confirmed upstream) — the suffix structure is
    per-pair and bounded, never a global index; the only shuffle is the
    two text-attach joins.
    """
    from pcompress_spark.operators.verify import attach_texts

    @F.pandas_udf("struct<lcs_len: long, off_a: long, off_b: long>")
    def lcs_udf(text_a, text_b):  # type: ignore[no-untyped-def]
        import pandas as pd

        from pcompress_spark.functions.suffix import lcs_span_str

        rows = [
            lcs_span_str(a, b)
            for a, b in zip(text_a.tolist(), text_b.tolist())
        ]
        return pd.DataFrame(rows, columns=["lcs_len", "off_a", "off_b"])

    return (
        attach_texts(pairs, docs)
        .withColumn("_lcs", lcs_udf("text_a", "text_b"))
        .select(
            "id_a",
            "id_b",
            (F.col("_lcs.off_a") + 1).alias("off_a"),
            (F.col("_lcs.off_b") + 1).alias("off_b"),
            F.col("_lcs.lcs_len").alias("lcs_len"),
        )
    )
