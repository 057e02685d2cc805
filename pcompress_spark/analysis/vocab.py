"""Vocabulary head + rare-token quality signal over a document corpus.

`vocab_stats` is the tokenizer-coverage audit every training-data pipeline
runs before committing to a vocabulary: the top-N token frequency head
with per-rank cumulative coverage (what fraction of all token occurrences
the first k vocabulary entries explain). `rare_token_stats` is the
model-free perplexity stand-in built from the same counts: the fraction
of a document's token occurrences whose corpus-wide frequency is at or
below a rarity cutoff — junk/gibberish documents score high because their
tokens appear nowhere else.

Reference lineage: both are the byte-class-histogram analyzer
(/root/reference/filters/analyzer/analyzer.c:32-97) lifted from bytes to
tokens — the reference decides text/binary/markup routing from a global
frequency profile; a corpus pipeline decides tokenizer fit and document
quality from the token frequency profile.

Scale shape (100-TB discipline):
  - token counting is explode -> ONE token-keyed groupBy; map-side
    partial aggregation collapses hot tokens ("the" at 10^11 occurrences)
    to one row per map partition before the exchange, so no salting is
    needed — identical skew story to linedup.first_occurrence;
  - the head is orderBy(count desc).limit(N) — Spark plans TakeOrdered
    (per-partition top-N + driver merge of N*P rows), never a global
    sort of the |vocab| frame;
  - the rank/cumulative window runs over the N-row head ONLY (single
    partition of N rows — bounded by construction, never by data);
  - rare_token_stats joins occurrences back to the grouped counts on the
    token key (shuffle join; the counts side is |vocab| rows, far smaller
    than occurrences) and re-aggregates by doc — two shuffles total,
    both keyed, both combiner-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pcompress_spark.analysis.webtext import TOKEN_RE, _frac6

DEFAULT_TOP_N = 20
DEFAULT_RARE_MAX = 2


def token_occurrences(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, token) — one row per token OCCURRENCE, lowercased.

    Tokenization is webtext.TOKEN_RE (whitespace runs; CJK codepoints are
    their own tokens), lowercased for counting — the same case fold the
    decontamination index applies (analysis/decontam.py)."""
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0
    )
    return docs.select("doc_id", F.explode(toks).alias("token"))


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, n_occ) — corpus-wide occurrence count per distinct token.

    ONE groupBy keyed by the token string (exact — no hash collisions);
    partial aggregation makes hot tokens ship O(#map partitions) rows."""
    return (
        token_occurrences(docs, text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
    )


def vocab_stats(
    docs: DataFrame, top_n: int = DEFAULT_TOP_N, text_col: str = "text"
) -> DataFrame:
    """Top-N vocabulary head with coverage curve:

      (token, n_occ, rank, share, cum_share)

    rank orders by n_occ desc then token asc (deterministic ties);
    share = n_occ / total corpus occurrences, cum_share = running
    coverage through this rank — both 1e-6-floor-rounded (webtext._frac6)
    so the DuckDB oracle reproduces every double bit-for-bit. The
    ordering+limit is a TakeOrdered (bounded driver merge), and the
    window runs over the N-row head only — N is a config constant, so
    the single-partition window can never be data-sized."""
    counts = token_counts(docs, text_col)
    total = counts.agg(F.sum("n_occ").cast("long").alias("_total"))
    head = (
        counts.orderBy(F.col("n_occ").desc(), F.col("token").asc())
        .limit(int(top_n))
    )
    w = Window.orderBy(F.col("n_occ").desc(), F.col("token").asc())
    return (
        head.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .withColumn(
            "_cum", F.sum("n_occ").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .select(
            "token",
            "n_occ",
            "rank",
            _frac6(F.col("n_occ"), F.col("_total")).alias("share"),
            _frac6(F.col("_cum"), F.col("_total")).alias("cum_share"),
        )
    )


def rare_token_stats(
    docs: DataFrame,
    rare_max: int = DEFAULT_RARE_MAX,
    text_col: str = "text",
) -> DataFrame:
    """Per-document rare-token signal:

      (doc_id, n_tok, n_rare, rare_frac)

    n_rare counts the doc's token OCCURRENCES whose corpus-wide count is
    <= rare_max; rare_frac = n_rare / n_tok (1e-6-floor-rounded). Docs
    with zero tokens emit (0, 0, 0.0) — never null, so both engines hash
    identically. High rare_frac flags gibberish/OCR-junk documents whose
    vocabulary the rest of the corpus never uses."""
    occ = token_occurrences(docs, text_col)
    counts = token_counts(docs, text_col)
    per_doc = (
        occ.join(counts, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.sum(
                F.when(F.col("n_occ") <= int(rare_max), 1).otherwise(0)
            ).cast("long").alias("n_rare"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tok", F.lit(0)).cast("long").alias("n_tok"),
            F.coalesce("n_rare", F.lit(0)).cast("long").alias("n_rare"),
            _frac6(
                F.coalesce("n_rare", F.lit(0)), F.coalesce("n_tok", F.lit(0))
            ).alias("rare_frac"),
        )
    )
