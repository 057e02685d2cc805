"""Small-operator coverage: size parsing (F13), CRC32 (F5), sorted source
(S5), fixed-block projection (P2)."""

import os
import sys
import zlib

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pcompress_spark.config import PipelineConfig, parse_size  # noqa: E402
from pcompress_spark.operators.locality import sorted_source  # noqa: E402


def test_parse_size_suffixes():
    assert parse_size("8k") == 8192
    assert parse_size("8K") == 8192
    assert parse_size("2m") == 2 * 1024 * 1024
    assert parse_size("1G") == 1 << 30
    assert parse_size("3t") == 3 << 40
    assert parse_size("512") == 512
    assert parse_size(512) == 512
    for bad in ("", "k", "1.5m", "m1", "12x"):
        with pytest.raises(ValueError):
            parse_size(bad)


def test_config_from_args_routes_size_fields():
    cfg = PipelineConfig.from_args(substring_min_len="2k", min_doc_len=64)
    assert cfg.substring_min_len == 2048
    assert cfg.min_doc_len == 64
    # non-size fields pass through untouched
    cfg2 = PipelineConfig.from_args(tau_extra=0.5)
    assert cfg2.tau_extra == 0.5


def test_crc32_matches_zlib(spark):
    """F5: Spark's crc32 is the same CRC-32 the reference's chunk headers
    use (pcompress.c:2079-2094) — known-answer vs zlib."""
    rows = ["", "hello world", "the quick brown fox" * 10]
    df = spark.createDataFrame([(s,) for s in rows], "s string")
    got = {
        r.s: r.c
        for r in df.select("s", F.crc32(F.col("s").cast("binary")).alias("c")).collect()
    }
    for s in rows:
        assert got[s] == zlib.crc32(s.encode()), s


def test_sorted_source_reorders_not_drops(spark):
    from pcompress_spark.datagen import gen_pages_spark

    pages = gen_pages_spark(spark, 400, partitions=8)
    out = sorted_source(pages, num_partitions=4)
    # row set preserved exactly
    assert out.count() == 400
    assert out.select("url").subtract(pages.select("url")).count() == 0
    # partitions are internally sorted by the locality key
    def check_sorted(it):
        prev = None
        for row in it:
            key = (row.lang, len(row.text) // 256, row.url)
            assert prev is None or key >= prev, (prev, key)
            prev = key
        yield None

    out.select("lang", "text", "url").rdd.mapPartitions(
        lambda it: check_sorted(it)
    ).count()


def test_fixed_blocks_groups_shared_blocks(spark):
    """Two docs sharing an identical aligned 64-char block meet in one
    block_sha group with the earlier doc as representative."""
    from pcompress_spark.driver_queries import FIXED_BLK

    shared = "x" * FIXED_BLK
    df = spark.createDataFrame(
        [(1, shared + "a" * 10), (2, shared + "b" * 10), (3, "c" * 70)],
        "doc_id long, text string",
    )
    blocks = df.filter(F.length("text") > 0).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, cast(ceil(length(text) / {FIXED_BLK}.0)"
                f" as int) - 1), i -> sha2(substring(text, i * {FIXED_BLK} + 1,"
                f" {FIXED_BLK}), 256))"
            )
        ).alias("block_sha"),
    )
    agg = blocks.groupBy("block_sha").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.min("doc_id").alias("rep_doc"),
    )
    multi = [r for r in agg.collect() if r.n_docs > 1]
    assert len(multi) == 1
    assert multi[0].n_docs == 2 and multi[0].rep_doc == 1
