"""Benchmark decontamination: n-gram overlap against a held-out set.

A training-data pipeline must drop (or flag) corpus documents that leak
evaluation data — the standard recipe (GPT-3 appendix C / The Pile) is
exact n-gram collision: a document is contaminated when any length-N
token window also occurs in the benchmark set. This is the same
shape as the reference's global dedup probe — a cheap exact-match key
screened against a global index before any expensive handling
(rabin/global/index.c:485-558) — with the benchmark n-gram set playing
the index role.

Scale shape (the part that must survive 100 TB): benchmark sets are
metadata-scale next to the corpus (10^6-10^8 n-grams vs 10^12 docs), so
the n-gram index is BROADCAST and the corpus side is one scan + explode
+ broadcast-hash semi-join + per-doc count — no corpus-sized shuffle at
all except the final per-doc aggregation over HITS (bounded by actual
contamination, not corpus size). The corpus n-grams are deduped per doc
(array_distinct) before the explode so a pathological doc repeating one
window a million times emits each gram once.

Determinism contract: tokens come from the repo-wide TOKEN_RE (lowercase
+ CJK-codepoint-or-word runs, analysis/webtext.py) and grams are joined
with a single space — both engines (Spark / DuckDB-RE2) produce
byte-identical gram strings, and all outputs are integers/booleans, so
the driver oracle reproduces every bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pcompress_spark.analysis.webtext import TOKEN_RE

# GPT-3 used 13-gram collision; The Pile 13, PaLM 8. The synthetic
# fixture's planted near-dups share runs well past 8 tokens, so 8 gives
# the test corpus a non-trivial contaminated set while remaining the
# published operating point (PaLM). Callers override per corpus.
DEFAULT_N = 8


def ngram_sets(docs: DataFrame, n: int = DEFAULT_N,
               text_col: str = "text") -> DataFrame:
    """(doc_id, grams) — the DISTINCT lowercase token n-grams per doc.

    Pure codegen: regexp_extract_all -> transform(sequence) -> slice ->
    array_join -> array_distinct. Guarded for docs shorter than n tokens
    (Spark's sequence(1, k) is DESCENDING for k < 1, so the guard is
    required, not cosmetic).
    """
    ws = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    k = F.size(ws) - F.lit(n - 1)
    grams = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(ws, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select("doc_id", F.array_distinct(grams).alias("grams"))


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = DEFAULT_N,
    text_col: str = "text",
    broadcast_index: bool = True,
) -> DataFrame:
    """Flag corpus docs sharing any token n-gram with the benchmark.

    corpus/benchmark: (doc_id, text, ...). Returns one row per corpus doc:
      (doc_id, n_grams, n_hits, contaminated)
    with n_hits = |distinct grams(doc) ∩ grams(benchmark)| and
    contaminated = n_hits > 0.

    broadcast_index=True ships the benchmark gram set to every executor
    (the normal case — eval suites are tiny next to the corpus); pass
    False to fall back to a shuffle join when the benchmark side is
    genuinely large.
    """
    cg = ngram_sets(corpus, n, text_col)
    bench_grams = (
        ngram_sets(benchmark, n, text_col)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    if broadcast_index:
        bench_grams = F.broadcast(bench_grams)
    hits = (
        cg.select("doc_id", F.explode("grams").alias("gram"))
        .join(bench_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        cg.select("doc_id", F.size("grams").alias("n_grams"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def novelty(
    docs: DataFrame, n: int = DEFAULT_N, text_col: str = "text"
) -> DataFrame:
    """Per-document n-gram novelty against the rest of the corpus:

      (doc_id, n_grams, n_novel, novelty_frac)

    n_novel counts the doc's DISTINCT n-grams whose corpus-wide first
    occurrence (min doc_id — the reference's earliest-wins backref
    orientation, rabin_dedup.c:1606-1615) is this doc; novelty_frac =
    n_novel / n_grams (1e-6-floor-rounded, 0.0 for gram-less docs). Low
    novelty marks documents that mostly restate earlier corpus content —
    the document-granularity information-gain signal data-pruning
    pipelines rank on, and the corpus-internal dual of `contamination`
    (same gram domain, the corpus itself playing the index role).

    Scale shape: one explode -> ONE gram-keyed groupBy for first
    occurrence (map-side combine collapses hot boilerplate grams — the
    linedup.first_occurrence skew story), one join back on the gram key,
    one per-doc re-aggregation. No broadcast needed and no Python."""
    from pcompress_spark.analysis.webtext import _frac6

    cg = ngram_sets(docs, n, text_col)
    occ = cg.select("doc_id", F.explode("grams").alias("gram"))
    firsts = occ.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    per = (
        occ.join(firsts, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(
                F.when(F.col("doc_id") == F.col("first_doc"), 1).otherwise(0)
            ).cast("long").alias("n_novel"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            _frac6(
                F.coalesce("n_novel", F.lit(0)),
                F.coalesce("n_grams", F.lit(0)),
            ).alias("novelty_frac"),
        )
    )
