"""Connected-components unit tests (large-star/small-star, §4.3)."""

import pytest
from pyspark.sql import functions as F

from pcompress_spark.operators.components import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    labels = connected_components(df)
    return {r["doc_id"]: r["cluster_id"] for r in labels.collect()}


def test_cc_single_edge(spark):
    assert _cc(spark, [(2, 1)]) == {1: 1, 2: 1}


def test_cc_chain(spark):
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {i: 1 for i in range(1, 6)}


def test_cc_two_components_and_star(spark):
    edges = [(10, 11), (11, 12), (20, 21), (21, 22), (22, 20)]
    got = _cc(spark, edges)
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 22: 20}


def test_cc_long_path_log_rounds(spark):
    n = 64
    edges = [(i, i + 1) for i in range(1, n)]
    got = _cc(spark, edges)
    assert set(got.values()) == {1}
    assert len(got) == n


def test_cc_negative_ids(spark):
    # doc_id = xxhash64 -> negative longs are the common case
    got = _cc(spark, [(-5, 3), (3, -1), (7, 9)])
    assert got == {-5: -5, 3: -5, -1: -5, 7: 7, 9: 7}


def test_cc_self_loops_and_dups_ignored(spark):
    got = _cc(spark, [(1, 1), (2, 1), (1, 2), (2, 1)])
    assert got == {1: 1, 2: 1}
