"""Cross-doc line dedup, mixture reweighting, rep policies: known-answer
tests for analysis/linedup.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pcompress_spark.analysis import linedup as LD  # noqa: E402


def _docs(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


def test_doc_lines_token_block(spark):
    """12-token blocks: 26 tokens -> 3 blocks of 12/12/2; positions are
    0-based and ordered."""
    text = " ".join(f"t{i}" for i in range(26))
    rows = LD.doc_lines(
        _docs(spark, [(1, text)]), mode="token_block", block_tokens=12
    ).orderBy("pos").collect()
    assert [r.pos for r in rows] == [0, 1, 2]
    assert rows[0].line == " ".join(f"t{i}" for i in range(12))
    assert rows[2].line == "t24 t25"


def test_doc_lines_newline_mode(spark):
    rows = LD.doc_lines(
        _docs(spark, [(1, "line one\nline two\nline one")]), mode="newline"
    ).orderBy("pos").collect()
    assert [r.line for r in rows] == ["line one", "line two", "line one"]


def test_first_occurrence_earliest_wins(spark):
    """The same line in (doc 2, pos 0), (doc 1, pos 3), (doc 1, pos 1):
    only (1, 1) keeps — min doc_id then min pos, the reference's
    earliest-block backref orientation."""
    lines = spark.createDataFrame(
        [
            (2, 0, "dup line"),
            (1, 3, "dup line"),
            (1, 1, "dup line"),
            (1, 0, "unique line"),
        ],
        "doc_id long, pos int, line string",
    )
    out = {(r.doc_id, r.pos): r.keep for r in LD.first_occurrence(lines).collect()}
    assert out[(1, 1)] is True
    assert out[(1, 3)] is False
    assert out[(2, 0)] is False
    assert out[(1, 0)] is True


def test_line_dedup_docs_rollup(spark):
    """Doc 1 donates a block; doc 2 repeats it (removed) around its own
    unique block (kept); surviving text preserves original order."""
    blk = " ".join(f"b{i}" for i in range(12))
    uniq = " ".join(f"u{i}" for i in range(12))
    docs = _docs(spark, [(1, blk), (2, f"{blk} {uniq}")])
    out = {
        r.doc_id: r
        for r in LD.line_dedup_docs(
            docs, mode="token_block", block_tokens=12
        ).collect()
    }
    assert out[1].n_lines == 1 and out[1].n_removed == 0
    assert out[1].text_dedup == blk
    assert out[2].n_lines == 2 and out[2].n_removed == 1
    assert out[2].text_dedup == uniq  # the shared block was doc 1's
    # a doc that is ALL dups collapses to '' (never null)
    docs3 = _docs(spark, [(1, blk), (3, blk)])
    out3 = {
        r.doc_id: r
        for r in LD.line_dedup_docs(
            docs3, mode="token_block", block_tokens=12
        ).collect()
    }
    assert out3[3].n_kept == 0 and out3[3].text_dedup == ""


def test_mix_weights_uniform_target(spark):
    """Two sources at 30 and 10 tokens: shares 0.75/0.25, weights
    (40/2)/30 and (40/2)/10 -> 0.666667 / 2.0 (1e-6 floor-rounded)."""
    docs = spark.createDataFrame(
        [
            (1, " ".join(["a"] * 30), "s1"),
            (2, " ".join(["b"] * 10), "s2"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in LD.mix_weights(docs).collect()}
    assert out["s1"].n_tokens == 30 and out["s2"].n_tokens == 10
    assert abs(out["s1"].token_share - 0.75) < 1e-9
    assert abs(out["s1"].weight - 0.666667) < 1e-9
    assert abs(out["s2"].weight - 2.0) < 1e-9


def test_cluster_rep_policies(spark):
    """Cluster {1,2,3}: doc 2 is longest -> 'longest' picks 2 for all
    members; 'earliest' picks 1; length ties resolve to min doc_id."""
    docs = _docs(
        spark,
        [(1, "aa bb"), (2, "aa bb cc dd ee"), (3, "aa bb cc"), (9, "zz")],
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9)], "doc_id long, cluster_id long"
    )
    longest = {
        r.doc_id: r.rep_id
        for r in LD.cluster_rep_policy(docs, labels, "longest").collect()
    }
    assert longest == {1: 2, 2: 2, 3: 2, 9: 9}
    earliest = {
        r.doc_id: r.rep_id
        for r in LD.cluster_rep_policy(docs, labels, "earliest").collect()
    }
    assert earliest == {1: 1, 2: 1, 3: 1, 9: 9}
    # tie on length -> min doc_id
    docs_tie = _docs(spark, [(5, "xx yy"), (6, "pp qq")])
    labels_tie = spark.createDataFrame(
        [(5, 5), (6, 5)], "doc_id long, cluster_id long"
    )
    tie = {
        r.doc_id: r.rep_id
        for r in LD.cluster_rep_policy(docs_tie, labels_tie, "longest").collect()
    }
    assert tie == {5: 5, 6: 5}


def test_line_dedup_plan_shape(spark):
    """No per-row Python UDF and no cartesian product in the rollup plan;
    the first-occurrence agg keeps partial aggregation (map-side combine
    is the hot-line skew defense)."""
    docs = _docs(spark, [(1, "a b c"), (2, "a b c")])
    plan = (
        LD.line_dedup_docs(docs, mode="token_block", block_tokens=12)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_min" in plan or "HashAggregate" in plan


def test_mixture_sample_hand_recomputed(spark):
    """Two sources, hand-computed weights: s1 has 6 tokens, s2 has 2 ->
    total 8, uniform target 4 per group -> w(s1)=0.666667, w(s2)=2.0
    (1e-6-floor-rounded). n_copies = floor(w) + 1{u < frac(w)} with
    u = Knuth-hash(doc_id)/2^32 recomputed here in plain Python."""
    rows = [
        (1, "a b c", "s1"), (2, "d e f", "s1"), (3, "g h", "s2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.doc_id: r for r in LD.mixture_sample(docs, "source").collect()}
    assert out[1].weight == 0.666667 and out[3].weight == 2.0

    def u(doc_id):
        return ((doc_id % 2**31) * 2654435761 % 2**32) / 2**32

    for did, w in ((1, 0.666667), (2, 0.666667), (3, 2.0)):
        expect = int(w) + (1 if u(did) < w - int(w) else 0)
        assert out[did].n_copies == expect, (did, u(did), w)
    # integer weight -> frac(w)=0 -> u < 0 never true -> exactly floor(w)
    assert out[3].n_copies == 2


def test_mixture_sample_deterministic(spark):
    """Same corpus twice -> identical copies (u is a pure function of
    doc_id, not RNG state)."""
    rows = [(i, "w " * (i % 5 + 1), f"s{i % 3}") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    a = sorted((r.doc_id, r.n_copies)
               for r in LD.mixture_sample(docs, "source").collect())
    b = sorted((r.doc_id, r.n_copies)
               for r in LD.mixture_sample(docs, "source").collect())
    assert a == b


def test_mixture_sample_empty_text_group(spark):
    """A group whose every doc is empty has 0 tokens -> weight 0.0 ->
    0 copies; the nonempty group still gets weighted."""
    rows = [(1, "", "empty"), (2, "   ", "empty"), (3, "a b", "full")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.doc_id: r for r in LD.mixture_sample(docs, "source").collect()}
    assert out[1].weight == 0.0 and out[1].n_copies == 0
    # target = total/ngroups = 1 token; "full" holds 2 -> w = 0.5;
    # u(3) = (3*2654435761 mod 2^32)/2^32 ~= 0.854 >= 0.5 -> 0 copies
    assert out[3].weight == 0.5 and out[3].n_copies == 0


def test_mixture_sample_expected_mass(spark):
    """LLN check: many same-size docs in a 3:1 token imbalance -> realized
    copy mass per group approaches weight * n_docs (within 10%), i.e. the
    stochastic rounding actually rebalances the mix."""
    rows = [(i, "w x y z", "big") for i in range(600)]
    rows += [(1000 + i, "w x y z", "small") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = LD.mixture_sample(docs, "source").collect()
    mass = {}
    for r in out:
        mass[r.source] = mass.get(r.source, 0) + r.n_copies
    # uniform target: 400 tokens-worth each -> big w=2/3 -> ~400 copies;
    # small w=2.0 -> exactly 400 (integer weight, deterministic)
    assert mass["small"] == 400
    assert abs(mass["big"] - 400) <= 40
