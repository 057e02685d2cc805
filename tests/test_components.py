"""Connected-components unit tests (large-star/small-star, §4.3), plus the
gated driver-side union-find dispatcher (cluster_labels)."""

import random

import pytest
from pyspark.sql import functions as F

from pcompress_spark.operators.components import (
    cluster_labels,
    connected_components,
    union_find_min_labels,
)


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


def _random_edges(seed=7, n_nodes=300, n_edges=450):
    rng = random.Random(seed)
    return [
        (rng.randrange(-n_nodes, n_nodes), rng.randrange(-n_nodes, n_nodes))
        for _ in range(n_edges)
    ]


def test_cluster_labels_driver_matches_distributed(spark):
    """The gated dispatcher's two paths (driver union-find / distributed
    large-star loop) must produce identical labels on a random multigraph
    with self-loops, dups, and negative ids."""
    edges = _random_edges()
    df = spark.createDataFrame(edges, "src long, dst long")
    via_driver = {
        r["doc_id"]: r["cluster_id"]
        for r in cluster_labels(df, driver_max_edges=10**9).collect()
    }
    via_dist = {
        r["doc_id"]: r["cluster_id"]
        for r in cluster_labels(df, driver_max_edges=0).collect()
    }
    assert via_driver == via_dist
    assert len(via_driver) > 0
    # spot-check against the pure-python union-find directly
    assert via_driver == union_find_min_labels(
        (a, b) for a, b in edges if a != b
    )


def test_cluster_labels_empty_and_self_loops(spark):
    df = spark.createDataFrame([(5, 5)], "src long, dst long")
    assert cluster_labels(df).collect() == []
    empty = spark.createDataFrame([], "src long, dst long")
    assert cluster_labels(empty).collect() == []
