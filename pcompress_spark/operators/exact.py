"""Exact (identity) dedup — the reference's MODE_SIMPLE global index.

Reference: per-block SHA-256 lookup-insert in the shared hashtable emits a
backref to the first occurrence (rabin/rabin_dedup.c:814-895,
rabin/global/index.c:485-558); matches are byte-verified (memcmp,
rabin_dedup.c:1350-1354). Spark-first shape: `groupBy(sha2(text,256))` with
a `min(doc_id)` representative — the shuffle hash exchange is the index, the
partial/final aggregation is the per-thread/global merge (A5), and earliest-
occurrence (min doc_id) reproduces backward-ref semantics
(rabin_dedup.c:1606-1615).

SHA-256 equality stands in for memcmp: the reference itself trusts the
256-bit digest in global mode (dedupe_config.h:36).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pcompress_spark.config import PipelineConfig
from pcompress_spark.functions.shingling import make_sig_udf_lang


def base_ids(pages: DataFrame) -> DataFrame:
    """pages -> (url, doc_id, text_sha, lang, text) — the codegen-only
    identity columns, WITHOUT the sketch UDF. Split out so cheap
    pre-passes (in-batch url dedup, redelivery anti-joins) can run before
    any Arrow batch is paid for (operators/incremental.py classifies a
    redelivered batch to zero rows without ever sketching it)."""
    return (
        pages.select("url", "text", "lang")
        .withColumn("doc_id", F.xxhash64("url"))
        .withColumn("text_sha", F.sha2("text", 256))
    )


def attach_sigs(base: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Attach (nshingles, minhash, simhash) to a base_ids-shaped frame —
    the expensive vectorized sketch pass, applied to exactly the rows the
    caller kept."""
    sig_udf = make_sig_udf_lang(cfg)
    return base.withColumn("_sig", sig_udf("text", "lang")).select(
        "url",
        "doc_id",
        "text_sha",
        "lang",
        "text",
        F.col("_sig.nshingles").alias("nshingles"),
        F.col("_sig.minhash").alias("minhash"),
        F.col("_sig.simhash").alias("simhash"),
    )


def build_sigs(pages: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """pages -> sigs(url, doc_id, text_sha, lang, text, nshingles, minhash,
    simhash).

    doc_id = xxhash64(url): stable across runs/partitionings/cluster sizes
    (SURVEY §7 determinism rule — never monotonically_increasing_id).
    text_sha is the hex sha2-256 (DuckDB-comparable; reference uses the raw
    digest, dedupe_config.h:36).

    `text` rides along into the sigs checkpoint: the source scan (or
    generator) runs exactly once per pipeline, and every later stage that
    needs text (winnow anchors, verification) reads it back from columnar
    storage with projection pushdown instead of re-scanning the source.
    """
    return attach_sigs(base_ids(pages), cfg)


def text_groups(sigs: DataFrame) -> DataFrame:
    """One row per distinct text: (text_sha, rep_id, n_members)."""
    return sigs.groupBy("text_sha").agg(
        F.min("doc_id").alias("rep_id"), F.count(F.lit(1)).alias("n_members")
    )


def exact_edges(sigs: DataFrame, groups: DataFrame) -> DataFrame:
    """edges(src=rep, dst=member, jaccard=1.0, kind='exact') for dup groups."""
    return (
        sigs.join(groups.filter(F.col("n_members") > 1), "text_sha")
        .filter(F.col("doc_id") != F.col("rep_id"))
        .select(
            F.col("rep_id").alias("src"),
            F.col("doc_id").alias("dst"),
            F.lit(1.0).alias("jaccard"),
            F.lit("exact").alias("kind"),
        )
    )


def representatives(sigs: DataFrame, groups: DataFrame) -> DataFrame:
    """Delegate rows (one per distinct text) — input to all fuzzy channels.

    Collapsing identical texts first is both the exact-dedup output AND the
    pair-explosion guard: a text duplicated 10^6 times contributes ONE row
    to LSH instead of 10^12 candidate pairs (analog of run-merge compaction,
    rabin_dedup.c:1426-1447).
    """
    return sigs.join(
        groups.select("text_sha", "rep_id"),
        (sigs["text_sha"] == groups["text_sha"]) & (sigs["doc_id"] == groups["rep_id"]),
    ).select(sigs["*"])
