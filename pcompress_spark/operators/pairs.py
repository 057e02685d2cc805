"""Bucket → candidate-pair generation, shared by every LSH-family channel.

This is the distributed replacement for the reference's semaphore-serialized
global hash index (pcompress.c:2617-2624 + rabin/global/index.c:485-558):
the shuffle exchange on the bucket key IS the distributed hashtable, and the
"probe chain" becomes a self-equi-join within each bucket.

Skew strategy (north_rule):
1. identical-text docs are collapsed to one delegate *before* any bucketing
   (operators/exact.py) — the biggest bucket inflators never reach the join;
2. bucket-size stats are computed with a plain partial-aggregating groupBy
   (no windowed sort over a hot key);
3. buckets larger than `cap` switch from all-pairs (m²) to a star on the
   bucket's min doc_id (m-1 edges) — connectivity for clustering is
   preserved, pair explosion is bounded, and the downgrade is *logged*,
   never silent;
4. AQE skew-join splitting handles residual hot keys in the self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pcompress_spark.cache import tracked_persist


def bucket_pairs(
    buckets: DataFrame,
    key_cols: list[str],
    cap: int,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """All candidate pairs (id_a < id_b) from same-bucket co-occurrence.

    Returns (pairs, hot_buckets) where hot_buckets is the log of buckets
    that exceeded `cap` and were star-connected instead of all-paired:
    (key_cols…, n_docs).
    """
    # the bucket frame is referenced three times (stats, all-pairs self-join
    # sides) — persist so any upstream Python-UDF stage runs exactly once
    buckets = tracked_persist(buckets)
    stats = buckets.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("_n"), F.min(id_col).alias("_rep")
    )
    joined = buckets.join(stats, key_cols)

    small = joined.filter(F.col("_n") <= cap).select(*key_cols, id_col)
    a, b = small.alias("a"), small.alias("b")
    cond = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in key_cols]
    cond.append(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    full_pairs = a.join(b, cond).select(
        F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
    )

    big = joined.filter((F.col("_n") > cap) & (F.col(id_col) != F.col("_rep")))
    star_pairs = big.select(
        F.col("_rep").alias("id_a"), F.col(id_col).alias("id_b")
    )

    hot = stats.filter(F.col("_n") > cap).select(
        *key_cols, F.col("_n").alias("n_docs")
    )
    return full_pairs.unionByName(star_pairs), hot
