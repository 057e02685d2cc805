"""pcompress_spark — PySpark-native web-scale near-duplicate detection.

A brand-new engine with the query/data-processing capabilities of the
reference (gburd/pcompress, a content-defined-chunking dedup archiver),
re-expressed Spark-first over tables of web pages:

- exact dedup        (reference: SHA-256 global block index, rabin/global/index.c)
- MinHash + LSH      (reference: K-min-values segment sketch, rabin_dedup.c:959-1036)
- SimHash            (reference: similarity_hash min-heap sketch, utils/heap.c:42-75)
- substring dedup    (reference: bsdiff delta of similar blocks, bsdiff/bsdiff.c)
- connected components clustering (reference: backward-ref semantics,
  rabin_dedup.c:1606-1615 — every dup points at the earliest occurrence)

All heavy math is vectorized (numpy inside Arrow-batched pandas UDFs);
everything relational is DataFrame/SQL so Catalyst/AQE plan it.
"""

from pcompress_spark.config import PipelineConfig
from pcompress_spark.session import get_spark

__all__ = ["PipelineConfig", "get_spark"]
__version__ = "0.1.0"
