"""Known-answer tests for analysis/vocab.py (vocabulary head + rare-token
quality signal)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcompress_spark.analysis import vocab as V  # noqa: E402


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vocab_stats_hand_counts(spark):
    """Corpus 'a a a b b c' + 'b c c' -> counts a:3 b:3 c:3; ties order by
    token asc; shares are exact ninths, 1e-6-floor-rounded."""
    docs = _docs(spark, [(1, "a a a b b c"), (2, "b c c")])
    rows = V.vocab_stats(docs, top_n=2).orderBy("rank").collect()
    assert [(r.token, r.n_occ, r.rank) for r in rows] == [
        ("a", 3, 1), ("b", 3, 2)
    ]
    # share = floor(3/9*1e6+0.5)/1e6 = 0.333333; cum at rank 2 = 0.666667
    assert rows[0].share == 0.333333
    assert rows[1].cum_share == 0.666667


def test_vocab_stats_case_fold_and_limit(spark):
    """'The the THE' counts as one token x3; limit keeps the top-n head
    only."""
    docs = _docs(spark, [(1, "The the THE x")])
    rows = V.vocab_stats(docs, top_n=1).collect()
    assert len(rows) == 1
    assert rows[0].token == "the" and rows[0].n_occ == 3
    assert rows[0].cum_share == 0.75


def test_vocab_stats_cjk_codepoint_tokens(spark):
    """CJK codepoints tokenize individually (TOKEN_RE script dispatch):
    '深度学习 深度' -> 深:2 度:2 学:1 习:1."""
    docs = _docs(spark, [(1, "深度学习 深度")])
    got = {
        r.token: r.n_occ for r in V.vocab_stats(docs, top_n=10).collect()
    }
    assert got == {"深": 2, "度": 2, "学": 1, "习": 1}


def test_rare_token_stats_known_answer(spark):
    """rare_max=1: doc 1 = 'a a zzz' (a:2 not rare, zzz:1 rare) ->
    n_tok 3, n_rare 1, frac 0.333333; doc 2 all common -> 0."""
    docs = _docs(spark, [(1, "a a zzz"), (2, "a a")])
    out = {r.doc_id: r for r in V.rare_token_stats(docs, rare_max=1).collect()}
    assert (out[1].n_tok, out[1].n_rare, out[1].rare_frac) == (3, 1, 0.333333)
    assert (out[2].n_tok, out[2].n_rare, out[2].rare_frac) == (2, 0, 0.0)


def test_rare_token_stats_empty_doc(spark):
    """A zero-token doc emits (0, 0, 0.0) — present, never null."""
    docs = _docs(spark, [(1, ""), (2, "   "), (3, "w")])
    out = {r.doc_id: r for r in V.rare_token_stats(docs, rare_max=2).collect()}
    for did in (1, 2):
        assert (out[did].n_tok, out[did].n_rare, out[did].rare_frac) == (
            0, 0, 0.0
        )
    assert out[3].n_rare == 1


def test_rare_token_counts_are_occurrences_not_docs(spark):
    """A token appearing 3x in ONE doc has corpus count 3 (occurrence
    counting, not doc frequency): with rare_max=2 it is NOT rare."""
    docs = _docs(spark, [(1, "q q q")])
    out = V.rare_token_stats(docs, rare_max=2).collect()[0]
    assert (out.n_tok, out.n_rare) == (3, 0)
