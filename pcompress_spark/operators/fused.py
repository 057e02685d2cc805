"""Fused candidate generation — ONE bucket shuffle for all three channels.

The three LSH-family channels (minhash bands J3, simhash pigeonhole blocks
J5, winnowing anchors F11) all reduce to the same shape: explode per-doc
keys, self-join within buckets (operators/pairs.py). Round 2 ran them as
three concurrent jobs; each channel's bucket frame, stats groupBy, and
salted self-join moved its own shuffle, and on a fixed-memory-bandwidth
box the three interleaved shuffles were the measured scaling bottleneck
(candidates stage 2.3x of 4x at 2->8 cores, BENCH_SCALING r2). Fusing
them into ONE narrow keyed frame

    (doc_id: long, ch: tinyint, key: long)

gives one persist, one bucket-stats groupBy, one salted triangle
self-join, and one per-pair aggregation carrying ALL channels — roughly a
third of the shuffled bytes and stage count, with identical pair
semantics: the bucket join key is the composite (ch, key), so channels
never mix inside a bucket, and per-channel caps/salting behave exactly as
the per-channel joins did.

Reference analog: the reference likewise keeps ONE global index probed by
every key kind (exact checksum, KMV sketch values, similarity hash —
rabin/global/index.c:485-558) rather than one index per channel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pcompress_spark.config import PipelineConfig
from pcompress_spark.operators import lsh, simhash, substring
from pcompress_spark.operators.pairs import bucket_pairs

CH_MINHASH = 0
CH_SIMHASH = 1
CH_WINNOW = 2

CHANNEL_NAMES = {CH_MINHASH: "lsh", CH_SIMHASH: "simhash", CH_WINNOW: "winnow"}


def fused_keyed_rows(reps: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """(doc_id, ch, key): the union of all three channels' bucket keys.

    Per-channel keys are packed into a single long (xxhash64 of the
    channel's natural key tuple) so a shuffle row is 17 bytes instead of
    the per-channel (idx int + hash long) pairs — the ch tag disambiguates
    key spaces, and a cross-channel 64-bit collision is impossible because
    ch is part of the join key."""
    ch_col = lambda c: F.lit(c).cast("tinyint").alias("ch")  # noqa: E731
    mh = lsh.band_explode(reps, cfg).select(
        "doc_id",
        ch_col(CH_MINHASH),
        F.xxhash64("band_idx", "band_hash").alias("key"),
    )
    sh = simhash.simhash_blocks(reps, cfg).select(
        "doc_id",
        ch_col(CH_SIMHASH),
        F.xxhash64("blk_idx", "blk_val").alias("key"),
    )
    wn = substring.anchor_explode(reps, cfg).select(
        "doc_id", ch_col(CH_WINNOW), F.col("anchor").alias("key")
    )
    return mh.unionByName(sh).unionByName(wn)


def fused_candidates(
    reps: DataFrame, cfg: PipelineConfig
) -> tuple[DataFrame, DataFrame]:
    """reps -> (candidates(id_a, id_b, channels, mh_overlap, is_star),
    hot_log(ch, key, n_docs)).

    One bucket_pairs pass over the fused keyed frame; the per-pair groupBy
    recovers each channel's verdict:
      - minhash: band co-occurrence count == signature overlap when r == 1
        (the reference's segmented-index hit count, rabin_dedup.c:1042-1058);
        for r > 1 band counts are NOT signature overlap (a J=0.8 pair
        expects ~1.3 matches at b=4/r=5), so mh_overlap is emitted null and
        the prefilter falls back to the exact array-intersect path.
      - simhash: bucket co-occurrence is only the pigeonhole screen — the
        exact hamming distance is confirmed here with codegen bit_count,
        exactly as the standalone channel does (operators/simhash.py).
      - winnow: anchor co-occurrence (byte-confirmation happens later in
        verify_edges, as before).
    Pairs whose only proposer was a simhash bucket that fails the hamming
    ball are dropped (same as the standalone channel's post-join filter).

    Exact counts under the star downgrade: an over-cap MINHASH bucket
    suppresses member-member pair emission, so raw band co-occurrence
    would UNDERCOUNT signature overlap for any pair sharing a hot bucket
    (r2 ADVICE). Correction: star rows are EXCLUDED from the count and
    every pair instead adds `|hot_keys(a) ∩ hot_keys(b)|` — the number of
    over-cap band buckets both docs sit in (per-doc hot-key arrays, tiny
    left joins that AQE broadcasts at bench scale and degrades to a
    shuffle join only when the corpus is mostly boilerplate). Each band
    where the pair co-occurs is counted exactly once — via its pair row
    when the bucket was emitted, via the hot-key intersect when it was
    star-downgraded — so `mh_overlap` IS the signature overlap for every
    pair and the prefilter needs no star exemption.
    """
    rows = fused_keyed_rows(reps, cfg)
    pairs, hot = bucket_pairs(
        rows,
        ["ch", "key"],
        cap=cfg.max_bucket_docs,
        salt_min=cfg.salt_min,
        salt_groups=cfg.salt_buckets,
        carry=["ch"],
    )
    # rows was persisted inside bucket_pairs (same plan -> cache hit here)
    hot_mh = hot.filter(F.col("ch") == CH_MINHASH).select("key")
    hot_docs = (
        rows.filter(F.col("ch") == CH_MINHASH)
        .join(hot_mh, "key", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_set("key").alias("_hk"))
    )
    agg = pairs.groupBy("id_a", "id_b").agg(
        F.sum(
            F.when((F.col("ch") == CH_MINHASH) & ~F.col("is_star"), 1).otherwise(0)
        )
        .cast("int")
        .alias("_mh_cnt"),
        F.max(F.col("ch") == CH_MINHASH).alias("_mh_any"),
        F.max(F.col("ch") == CH_SIMHASH).alias("_sh_bucket"),
        F.max(F.col("ch") == CH_WINNOW).alias("_wn"),
        F.max((F.col("ch") == CH_MINHASH) & F.col("is_star")).alias("is_star"),
    )
    ha = hot_docs.select(F.col("doc_id").alias("id_a"), F.col("_hk").alias("_hk_a"))
    hb = hot_docs.select(F.col("doc_id").alias("id_b"), F.col("_hk").alias("_hk_b"))
    agg = (
        agg.join(ha, "id_a", "left")
        .join(hb, "id_b", "left")
        .withColumn(
            "_mh_cnt",
            F.col("_mh_cnt")
            + F.when(
                F.col("_hk_a").isNotNull() & F.col("_hk_b").isNotNull(),
                F.size(F.array_intersect("_hk_a", "_hk_b")),
            ).otherwise(F.lit(0)),
        )
        .drop("_hk_a", "_hk_b")
    )
    sims = reps.select("doc_id", "simhash")
    sa = sims.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("_sim_a"))
    sb = sims.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("_sim_b"))
    scored = (
        agg.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "_sh_ok",
            F.col("_sh_bucket")
            & (
                F.bit_count(F.col("_sim_a").bitwiseXOR(F.col("_sim_b")))
                <= cfg.simhash_radius
            ),
        )
    )
    channels = F.array_compact(
        F.array(
            F.when(F.col("_mh_any"), F.lit("minhash")),
            F.when(F.col("_sh_ok"), F.lit("simhash")),
            F.when(F.col("_wn"), F.lit("winnow")),
        )
    )
    if cfg.lsh_rows == 1:
        mh_overlap = F.when(F.col("_mh_any"), F.col("_mh_cnt"))
    else:
        mh_overlap = F.lit(None)
    out = (
        scored.withColumn("channels", channels)
        .filter(F.size("channels") > 0)
        .select(
            "id_a",
            "id_b",
            "channels",
            mh_overlap.cast("int").alias("mh_overlap"),
            "is_star",
        )
    )
    return out, hot
