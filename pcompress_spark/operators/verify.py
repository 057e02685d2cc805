"""Candidate-pair verification (J4) — never trust the sketch alone.

Reference: every index hit is re-verified against the full checksum and,
with verify_chunks, the actual bytes (rabin/rabin_dedup.c:1132-1180,
:1350-1354). Ours: exact Jaccard on re-computed shingle sets for every
candidate pair; winnow-channel pairs that fail the Jaccard threshold get
an exact >=L common-substring check before being admitted as `substring`
edges.

Edge kinds (golden fixture vocabulary):
  exact      — identical text (emitted by operators/exact.py, J == 1)
  near       — exact Jaccard >= tau_extra (0.4, DELTA_EXTRA)
  substring  — J < 0.4 but sharing a >= 2048-char verbatim span
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pcompress_spark.config import PipelineConfig
from pcompress_spark.functions.shingling import make_jaccard_udf, make_lcs_udf


def attach_texts(
    candidates: DataFrame, reps_with_text: DataFrame
) -> DataFrame:
    """candidates(id_a,id_b,channels) + texts of both sides.

    Two shuffle-hash joins on doc_id; text is projected late (only for
    surviving distinct pairs), which keeps the wide string column out of
    the band/bucket shuffles entirely.
    """
    texts = reps_with_text.select("doc_id", "text")
    a = texts.alias("ta")
    b = texts.alias("tb")
    return (
        candidates.join(a, candidates["id_a"] == F.col("ta.doc_id"))
        .join(b, candidates["id_b"] == F.col("tb.doc_id"))
        .select(
            "id_a",
            "id_b",
            "channels",
            F.col("ta.text").alias("text_a"),
            F.col("tb.text").alias("text_b"),
        )
    )


def merge_candidates(*channel_dfs: DataFrame) -> DataFrame:
    """Union candidates from all channels, one row per pair with the set of
    channels that proposed it (SO1 union + A6 distinct)."""
    unioned = channel_dfs[0]
    for df in channel_dfs[1:]:
        unioned = unioned.unionByName(df)
    return unioned.groupBy("id_a", "id_b").agg(
        F.collect_set("channel").alias("channels")
    )


def verify_edges(
    cands_with_text: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """-> edges(src, dst, jaccard, kind) for near + substring pairs."""
    jaccard_udf = make_jaccard_udf(cfg)
    lcs_udf = make_lcs_udf(cfg)
    scored = cands_with_text.withColumn(
        "jaccard", jaccard_udf("text_a", "text_b")
    )
    near = scored.filter(F.col("jaccard") >= cfg.tau_extra).select(
        F.col("id_a").alias("src"),
        F.col("id_b").alias("dst"),
        "jaccard",
        F.lit("near").alias("kind"),
    )
    # substring check only for winnow-proposed pairs below the near bar,
    # and only when both sides are long enough to contain the span
    sub = (
        scored.filter(
            (F.col("jaccard") < cfg.tau_extra)
            & F.array_contains("channels", "winnow")
            & (F.length("text_a") >= cfg.substring_min_len)
            & (F.length("text_b") >= cfg.substring_min_len)
        )
        .filter(lcs_udf("text_a", "text_b"))
        .select(
            F.col("id_a").alias("src"),
            F.col("id_b").alias("dst"),
            "jaccard",
            F.lit("substring").alias("kind"),
        )
    )
    return near.unionByName(sub)
