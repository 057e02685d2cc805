"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship near-duplicate clustering over the sf0.001
               documents table (MinHash-LSH candidates → exact-Jaccard
               verification → connected components).
queries()    — one entry per implemented operator family (SURVEY.md §2 +
               training-data-pipeline extensions); each callable takes
               (spark, sf_dir) and returns a DataFrame.
oracle_sql() — DuckDB-equivalent ANSI SQL per query (omitted only for the
               intentionally-approximate LSH-ANN path).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pcompress_spark import driver_queries as DQ  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: cluster assignments for every sf0.001 document, with the
    earliest-doc representative and member count per cluster."""
    sf_dir = "/root/testdata/sf0.001"
    clusters = DQ.q_dedup_clusters(spark, sf_dir)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        clusters.join(sizes, "cluster_id")
        .withColumn("is_representative", F.col("doc_id") == F.col("cluster_id"))
        .select("doc_id", "cluster_id", "cluster_size", "is_representative")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(DQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(DQ.ORACLES)
