"""Read-back path: reconstruction audit + delta-span descriptors.

Constructed fixtures with KNOWN shared spans: the descriptor must point at
the exact implanted offsets, and copying est_span_len chars from the
partner at those offsets must reproduce the implanted bytes — the
round-trip the reference's decompression verify performs.
"""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from pcompress_spark.operators.reconstruct import (
    delta_spans,
    reconstruct_audit,
    window_positions,
)

L = 96


def _rand_text(rng, n):
    return "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz "), n))


def test_reconstruct_audit_roundtrip_exact_dups(spark):
    rng = np.random.default_rng(7)
    base = _rand_text(rng, 400)
    rows = [
        (1, base),
        (2, base),            # exact dup of 1
        (3, _rand_text(rng, 300)),
        (4, base),            # another dup of 1
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in reconstruct_audit(docs).collect()}
    assert len(out) == 4
    # every rebuilt text hash-verifies
    assert all(r.sha_ok for r in out.values())
    # dups point back at the earliest copy; uniques at themselves
    assert out[2].rep_id == 1 and out[2].is_dup
    assert out[4].rep_id == 1 and out[4].is_dup
    assert out[3].rep_id == 3 and not out[3].is_dup
    assert out[1].rep_id == 1 and not out[1].is_dup


def test_delta_span_descriptor_points_at_implanted_block(spark):
    rng = np.random.default_rng(11)
    shared = _rand_text(rng, 250)          # one contiguous implanted run
    pre_a, post_a = _rand_text(rng, 97), _rand_text(rng, 120)
    pre_b, post_b = _rand_text(rng, 33), _rand_text(rng, 80)
    text_a = pre_a + shared + post_a       # shared starts at offset 98 (1-based)
    text_b = pre_b + shared + post_b       # shared starts at offset 34
    docs = spark.createDataFrame(
        [(1, text_a), (2, text_b)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    d = delta_spans(docs, pairs, L).collect()
    assert len(d) == 1
    r = d[0]
    assert (r.off_a, r.off_b) == (len(pre_a) + 1, len(pre_b) + 1)
    # contiguous run of S chars shares S - L + 1 windows
    assert r.n_win == len(shared) - L + 1
    assert r.est_span_len == len(shared)
    # ROUND TRIP: copy est_span_len chars from the partner at the descriptor
    # offsets — must reproduce the implanted bytes exactly
    assert (
        text_b[r.off_b - 1 : r.off_b - 1 + r.est_span_len]
        == text_a[r.off_a - 1 : r.off_a - 1 + r.est_span_len]
        == shared
    )


def test_window_positions_are_earliest_occurrence(spark):
    text = "x" * 200  # every window identical -> one row, pos 1
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = window_positions(docs, L).collect()
    assert len(rows) == 1 and rows[0].pos == 1


def test_apply_delta_spans_rebuilds_and_verifies(spark):
    """Applying a descriptor must rebuild B byte-exactly from partner span
    + B's unique regions (bspatch read-back analog)."""
    from pcompress_spark.operators.reconstruct import apply_delta_spans

    rng = np.random.default_rng(11)
    shared = _rand_text(rng, 150)
    rows = [
        (1, _rand_text(rng, 80) + shared + _rand_text(rng, 60)),
        (2, _rand_text(rng, 40) + shared + _rand_text(rng, 90)),
        (3, shared + _rand_text(rng, 50)),          # span at offset 1
        (4, _rand_text(rng, 70) + shared),          # span at the tail
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3)], "id_a long, id_b long"
    )
    spans = delta_spans(docs, pairs, L)
    out = apply_delta_spans(docs, spans).collect()
    assert len(out) == 4
    assert all(r.sha_ok for r in out), [
        (r.id_a, r.id_b) for r in out if not r.sha_ok
    ]


def test_apply_delta_spans_detects_corrupt_descriptor(spark):
    """A corrupted offset must FAIL the byte verification — sha_ok is a
    real check, not a constant."""
    from pcompress_spark.operators.reconstruct import apply_delta_spans

    rng = np.random.default_rng(13)
    shared = _rand_text(rng, 150)
    rows = [
        (1, _rand_text(rng, 80) + shared),
        (2, _rand_text(rng, 40) + shared),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    spans = delta_spans(docs, pairs, L).withColumn(
        "off_a", F.col("off_a") + 1
    )
    out = apply_delta_spans(docs, spans).collect()
    assert len(out) == 1 and not out[0].sha_ok


def test_lcs_spans_exact_even_when_shared_content_is_split(spark):
    """The suffix-array pass must return the LONGEST single span when the
    shared content is non-contiguous — the case where delta_spans'
    window-count estimate over-counts (it sums windows across runs) and
    only the exact backref rebuilds cleanly."""
    from pcompress_spark.operators.reconstruct import (
        apply_delta_spans,
        lcs_spans,
    )

    rng = np.random.default_rng(17)
    run_a = _rand_text(rng, 140)          # longest shared run
    run_b = _rand_text(rng, 110)          # second, disjoint shared run
    rows = [
        (1, run_a + _rand_text(rng, 30) + run_b),
        (2, run_b + _rand_text(rng, 55) + run_a),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")

    out = lcs_spans(docs, pairs).collect()
    assert len(out) == 1
    r = out[0]
    assert r.lcs_len == 140               # the longer run, exactly
    assert (r.off_a, r.off_b) == (1, 110 + 55 + 1)  # 1-based positions

    # the exact backref must rebuild byte-perfectly (verbatim by
    # construction), even though the shared content is split in two
    applied = apply_delta_spans(
        docs, lcs_spans(docs, pairs), span_col="lcs_len"
    ).collect()
    assert len(applied) == 1 and applied[0].sha_ok
