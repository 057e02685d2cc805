"""Sorted source — locality clustering of similar docs (S5).

The reference's archive mode external-merge-sorts members by
(extension[4], size) before compression so similar files sit adjacent in
the stream and the compressor's window actually sees the redundancy
(/root/reference/pc_archive.c:706-800 sort-key build, :467-520 merge).

The Spark analog groups similar documents into the same partitions and
orders them within each partition: range-partition by (lang, doc length
bucket, url), then sortWithinPartitions.  Downstream per-partition work
(pandas-UDF shingling batches, parquet row groups, column compression)
then sees runs of same-language, similar-length pages — the same
locality payoff, delivered by the shuffle instead of a merge sort.

Optional (the reference only sorts in archive mode; the dedup channels
are locality-independent because they shuffle on content keys anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sorted_source(
    pages: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """Cluster similar pages: range-partition + in-partition sort by
    (lang, length bucket, url).  Row set is unchanged — only placement
    and intra-partition order move (verified in tests)."""
    keyed = pages.withColumn(
        "_len_bkt", (F.length("text") / F.lit(256)).cast("int")
    )
    parted = (
        keyed.repartitionByRange(num_partitions, "lang", "_len_bkt", "url")
        if num_partitions
        else keyed.repartitionByRange("lang", "_len_bkt", "url")
    )
    return parted.sortWithinPartitions("lang", "_len_bkt", "url").drop(
        "_len_bkt"
    )
