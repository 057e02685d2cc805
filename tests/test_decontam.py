"""Benchmark decontamination: known-answer + plan-shape tests."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pcompress_spark.analysis import decontam as DC  # noqa: E402


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_known_answer(spark):
    """A doc sharing one 8-token window with the benchmark is flagged;
    an unrelated doc is not; hit counts are exact."""
    window = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    bench = _df(spark, [(100, f"prefix {window} suffix words here")])
    corpus = _df(
        spark,
        [
            # contains the full window once -> exactly 1 distinct hit
            (1, f"intro {window} outro"),
            # 7-token overlap only -> no 8-gram collision
            (2, "alpha beta gamma delta epsilon zeta eta DIFFERENT"),
            # unrelated
            (3, "totally unrelated text with many words going on and on"),
        ],
    )
    out = {
        r.doc_id: r
        for r in DC.contamination(corpus, bench, n=8).collect()
    }
    assert out[1].contaminated and out[1].n_hits == 1
    assert not out[2].contaminated and out[2].n_hits == 0
    assert not out[3].contaminated
    # n_grams = tokens - 7 (doc 1 has 10 tokens -> 3 windows, all distinct)
    assert out[1].n_grams == 3


def test_short_docs_and_repeats(spark):
    """Docs shorter than n yield zero grams (Spark sequence() guard); a
    doc repeating one contaminated window counts it ONCE (array_distinct
    before the explode)."""
    window = "w1 w2 w3 w4 w5 w6 w7 w8"
    bench = _df(spark, [(100, window)])
    corpus = _df(
        spark,
        [
            (1, "too short"),
            (2, f"{window} {window} {window}"),  # window recurs
        ],
    )
    out = {r.doc_id: r for r in DC.contamination(corpus, bench, n=8).collect()}
    assert out[1].n_grams == 0 and not out[1].contaminated
    assert out[2].contaminated
    # every distinct gram of doc 2 lies inside the repeated window text;
    # the planted window itself is counted once despite 3 occurrences
    assert out[2].n_hits >= 1
    grams = (
        DC.ngram_sets(corpus.filter(F.col("doc_id") == 2), 8)
        .select(F.explode("grams").alias("g"))
        .collect()
    )
    assert len({r.g for r in grams}) == len(grams)  # already distinct


def test_case_folding_and_cjk_tokens(spark):
    """Tokenizer is lowercased TOKEN_RE: case differences don't defeat
    the match, and CJK codepoints tokenize individually."""
    bench = _df(spark, [(100, "Alpha BETA gamma DELTA epsilon ZETA eta THETA")])
    corpus = _df(spark, [(1, "alpha beta GAMMA delta EPSILON zeta ETA theta")])
    out = DC.contamination(corpus, bench, n=8).collect()[0]
    assert out.contaminated and out.n_hits == 1
    cjk = _df(spark, [(5, "一二三四五六七八")])
    grams = DC.ngram_sets(cjk, 8).collect()[0].grams
    assert grams == ["一 二 三 四 五 六 七 八"]


def test_broadcast_index_plan(spark):
    """The benchmark gram index must broadcast (no corpus-sized shuffle
    for the join) when broadcast_index=True."""
    bench = _df(spark, [(100, "a b c d e f g h i j")])
    corpus = _df(spark, [(1, "a b c d e f g h i j k l")])
    plan = (
        DC.contamination(corpus, bench, n=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_novelty_known_answer(spark):
    """n=2 grams: doc 1 'a b c' owns {a b, b c}; doc 2 'a b c d' re-uses
    both and adds {c d} -> novelty 1/3; doc 3 repeats doc 1 exactly ->
    0.0; doc 4 too short -> (0, 0, 0.0)."""
    rows = [(1, "a b c"), (2, "a b c d"), (3, "a b c"), (4, "q")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in DC.novelty(docs, n=2).collect()}
    assert (out[1].n_grams, out[1].n_novel, out[1].novelty_frac) == (2, 2, 1.0)
    assert (out[2].n_grams, out[2].n_novel, out[2].novelty_frac) == (
        3, 1, 0.333333
    )
    assert (out[3].n_grams, out[3].n_novel) == (2, 0)
    assert (out[4].n_grams, out[4].n_novel, out[4].novelty_frac) == (0, 0, 0.0)


def test_novelty_distinct_grams_per_doc(spark):
    """A gram repeated within one doc counts once (array_distinct), and
    the doc still owns it if no earlier doc has it."""
    docs = spark.createDataFrame(
        [(5, "x y x y x y")], "doc_id long, text string"
    )
    out = DC.novelty(docs, n=2).collect()[0]
    # distinct 2-grams of [x y x y x y]: 'x y', 'y x' -> both novel
    assert (out.n_grams, out.n_novel, out.novelty_frac) == (2, 2, 1.0)
