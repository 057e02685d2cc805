"""Connected components: iterative large-star / small-star (§4.3).

Reproduces the reference's cluster semantics — every duplicate chain
resolves to its earliest member (backward refs only,
rabin/rabin_dedup.c:1606-1615) — as transitive closure with
representative = min(doc_id).

Algorithm: Kiveris et al., "Connected Components in MapReduce and Beyond"
(SoCC 2014), alternating large-star/small-star over the edge list;
converges in O(log n) rounds, each round is two hash-partitioned
aggregations + joins — no driver-side graph state, scales to edge lists
that don't fit anywhere.

Each iteration is localCheckpoint'ed to truncate lineage (the loop would
otherwise build an exponentially growing plan). The checkpoint is LAZY
(eager=False): the per-round fixpoint signature — a 1-row aggregate —
triggers it, so every round costs exactly ONE Spark job instead of an
eager-materialize job plus a signature job. At 60k docs the loop is
~6 rounds; halving the per-round barrier count matters for the N→4N
scaling efficiency more than any per-row math here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Orient src > dst, drop self-loops, distinct."""
    return (
        edges.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect strictly-larger neighbors of each node to the neighborhood min."""
    bidir = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = bidir.groupBy("src").agg(F.min("dst").alias("mn"))
    mins = mins.select(
        "src", F.least("src", "mn").alias("m")
    )
    return (
        bidir.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame, canonical: bool = False) -> DataFrame:
    """Within each node's not-larger neighborhood, link all to the min.
    `canonical=True` skips re-orientation when the caller guarantees
    src > dst, self-loop-free, distinct edges — _large_star's output is
    exactly that (m <= src < dst on every emitted row), so the in-loop
    call saves a full distinct shuffle of the edge set per round."""
    oriented = edges if canonical else _canon(edges)  # src > dst
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    joined = oriented.join(mins, "src")
    to_min = joined.select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    self_edge = mins.select("src", F.col("m").alias("dst"))
    return (
        to_min.unionByName(self_edge)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _signature(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("sig"),
    ).collect()[0]
    return int(row["n"]), int(row["sig"])


def connected_components(
    edges: DataFrame, max_iter: int = 50
) -> DataFrame:
    """edges(src, dst) -> labels(doc_id, cluster_id=min of component).

    Only nodes appearing in edges are labeled; callers default isolated
    docs to their own doc_id.
    """
    e = _canon(edges).localCheckpoint(eager=False)
    prev = _signature(e)
    for _ in range(max_iter):
        e = _small_star(_large_star(e), canonical=True).localCheckpoint(
            eager=False
        )
        cur = _signature(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} iters")
    # converged edge set is a forest of stars (node -> component min):
    # labels for non-root nodes, plus the roots themselves
    labels = e.select(F.col("src").alias("doc_id"), F.col("dst").alias("cluster_id"))
    roots = e.select(F.col("dst").alias("doc_id"), F.col("dst").alias("cluster_id"))
    return labels.unionByName(roots).groupBy("doc_id").agg(
        F.min("cluster_id").alias("cluster_id")
    )
