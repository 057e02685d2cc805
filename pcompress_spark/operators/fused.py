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

Round 4 shrank the post-aggregation fan-in (the remaining 2->8-core
efficiency sink, BENCH_SCALING r3: candidates stage 0.68-0.79 on the
degraded-memory VM class):
  - the per-pair groupBy carries TWO aggregation buffers (a count and a
    bit_or'd channel bitmask) instead of five boolean max's;
  - the hot-key correction joins broadcast the per-doc hot-key arrays
    when they are small (the normal case — hot buckets are the
    exception), so the junk-dominated pair stream is never shuffled for
    them; a measured count gates the hint so a boilerplate-degenerate
    corpus falls back to the shuffle join instead of OOMing the driver;
  - the simhash hamming-confirm join runs ONLY over pairs some simhash
    bucket actually proposed — band-noise pairs (the ~99% majority at
    b=20/r=1) never reach it;
  - `fused_prefiltered` additionally folds the signature prefilter
    (operators/verify.py semantics, r==1 band-count mode) into the same
    pass: junk pairs are dropped straight off the persisted count frame,
    before ANY wide join, and the drop log is produced here so drops
    stay non-silent.

Reference analog: the reference likewise keeps ONE global index probed by
every key kind (exact checksum, KMV sketch values, similarity hash —
rabin/global/index.c:485-558) rather than one index per channel, and
probes the cheap key before any expensive verify (rabin_dedup.c:1132-1180).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pcompress_spark.cache import tracked_persist
from pcompress_spark.config import PipelineConfig
from pcompress_spark.operators import lsh, simhash, substring
from pcompress_spark.operators.pairs import bucket_pairs

CH_MINHASH = 0
CH_SIMHASH = 1
CH_WINNOW = 2

CHANNEL_NAMES = {CH_MINHASH: "lsh", CH_SIMHASH: "simhash", CH_WINNOW: "winnow"}

# channel bitmask aggregated per pair (bit_or): one long buffer replaces
# four boolean max aggregations
_FL_MH = 1
_FL_SH = 2
_FL_WN = 4
_FL_STAR = 8  # minhash star-downgrade rows only (matches the old
#               max((ch==MINHASH) & is_star) semantics)

# per-doc hot-key arrays above this row count are joined by shuffle, not
# broadcast: docs carry <= lsh_bands hot keys (~200 B/row), so 500k rows
# ~= 100 MB — the edge of a comfortable broadcast on a 1000-executor
# cluster. Only a boilerplate-degenerate corpus exceeds it.
HOT_DOCS_BROADCAST_MAX = 500_000


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
    over-cap band buckets both docs sit in. Each band where the pair
    co-occurs is counted exactly once — via its pair row when the bucket
    was emitted, via the hot-key intersect when it was star-downgraded —
    so `mh_overlap` IS the signature overlap for every pair and the
    prefilter needs no star exemption.
    """
    out, hot, _ = _fused_impl(reps, cfg, min_matches=None)
    return out, hot


def fused_prefiltered(
    reps: DataFrame, cfg: PipelineConfig, min_matches: int = 3
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """fused_candidates + the signature prefilter fused into one pass:
    reps -> (kept, hot_log, prefilter_drop_log(doc_id, n_dropped)).

    Output-equivalent to
        verify.prefilter_candidates(fused_candidates(reps, cfg)[0], reps,
                                    min_matches, overlap_from_bands=True)
    (asserted by tests/test_fused.py) but drops band-noise pairs straight
    off the narrow persisted count frame, BEFORE the hot-key / simhash /
    prefilter joins ever see them: only pairs that could still pass —
    proposed by a non-minhash channel, carrying >= min_matches band hits,
    or hot-key-correctable (both endpoints in over-cap buckets) — continue
    into the wide tail. Requires cfg.lsh_rows == 1 (band co-occurrence ==
    signature overlap); r > 1 configs must verify overlap exactly via
    verify.prefilter_candidates(overlap_from_bands=False)."""
    if cfg.lsh_rows != 1:
        raise ValueError(
            "fused_prefiltered requires r == 1 banding; use "
            "fused_candidates + prefilter_candidates(overlap_from_bands="
            "False) for r > 1"
        )
    return _fused_impl(reps, cfg, min_matches=min_matches)


def _fused_impl(
    reps: DataFrame, cfg: PipelineConfig, min_matches: int | None
) -> tuple[DataFrame, DataFrame, DataFrame | None]:
    rows = fused_keyed_rows(reps, cfg)
    if cfg.packed_bucket_keys:
        # pack (ch, key) into ONE long: channel in the low 2 bits, key
        # shifted up 2 (its top 2 bits drop — it is a hash, and the
        # within-channel collision odds move from 2^-64 to 2^-62; the
        # candidate superset is verified downstream either way). Every
        # candidate-stage exchange then ships and sorts one 8-byte key
        # instead of (tinyint, long) — measured as the 2->8-core
        # efficiency sink on memory-bandwidth-limited boxes
        # (BENCH_SCALING r4: candidates stage 0.67-0.69 vs >=0.93
        # elsewhere). Cross-channel collisions stay impossible: the ch
        # bits differ.
        keyed = rows.select(
            "doc_id",
            F.shiftleft("key", 2)
            .bitwiseOR(F.col("ch").cast("long"))
            .alias("k2"),
        )
        pairs, hotp = bucket_pairs(
            keyed,
            ["k2"],
            cap=cfg.max_bucket_docs,
            salt_min=cfg.salt_min,
            salt_groups=cfg.salt_buckets,
            carry=["k2"],
        )
        _ch2 = F.col("k2").bitwiseAND(F.lit(3)).cast("tinyint")
        pairs = pairs.withColumn("ch", _ch2).drop("k2")
        # unpack for the hot log's public (ch, key, n_docs) shape.
        # CAVEAT (r4 ADVICE): under packed keys the logged `key` is the
        # LOW-62-BIT REMNANT of the original bucket key (its top 2 bits
        # were dropped by the shiftleft pack), i.e. an OPAQUE bucket id —
        # stable within a run for dedup/counting, but NOT equal to any
        # channel's actual band/block/anchor key and NOT comparable
        # across the packed/unpacked A/B lever or to incremental-index
        # keys. Consumers must treat it as an identifier only; `ch` and
        # `n_docs` remain exact. (Recovering the original key would take
        # an extra full pass over the exploded rows frame — not worth it
        # for a drop-accounting log.)
        hot = hotp.select(
            _ch2.alias("ch"),
            F.shiftrightunsigned("k2", 2).alias("key"),
            "n_docs",
        )
        hot_mh_k2 = hotp.filter(
            F.col("k2").bitwiseAND(F.lit(3)) == CH_MINHASH
        ).select("k2")
        hot_docs = tracked_persist(
            keyed.filter(F.col("k2").bitwiseAND(F.lit(3)) == CH_MINHASH)
            .join(hot_mh_k2, "k2", "left_semi")
            .groupBy("doc_id")
            .agg(F.collect_set("k2").alias("_hk"))
        )
    else:
        pairs, hot = bucket_pairs(
            rows,
            ["ch", "key"],
            cap=cfg.max_bucket_docs,
            salt_min=cfg.salt_min,
            salt_groups=cfg.salt_buckets,
            carry=["ch"],
        )
        # rows was persisted inside bucket_pairs (same plan -> cache hit)
        hot_mh = hot.filter(F.col("ch") == CH_MINHASH).select("key")
        hot_docs = tracked_persist(
            rows.filter(F.col("ch") == CH_MINHASH)
            .join(hot_mh, "key", "left_semi")
            .groupBy("doc_id")
            .agg(F.collect_set("key").alias("_hk"))
        )
    # metadata-scale action (docs in over-cap buckets); gates the
    # broadcast so a boilerplate-degenerate corpus degrades to a shuffle
    # join instead of an oversized broadcast
    n_hot = hot_docs.count()

    flag = (
        F.when(
            F.col("ch") == CH_MINHASH,
            F.when(F.col("is_star"), F.lit(_FL_MH | _FL_STAR)).otherwise(
                F.lit(_FL_MH)
            ),
        )
        .when(F.col("ch") == CH_SIMHASH, F.lit(_FL_SH))
        .otherwise(F.lit(_FL_WN))
    )
    agg = pairs.groupBy("id_a", "id_b").agg(
        F.sum(
            F.when((F.col("ch") == CH_MINHASH) & ~F.col("is_star"), 1).otherwise(0)
        )
        .cast("int")
        .alias("_mh_cnt"),
        F.bit_or(flag).cast("int").alias("_fl"),
    )
    if n_hot == 0:
        # no over-cap bucket anywhere (the common case away from
        # boilerplate-degenerate corpora): the hot-key correction is
        # identically zero — skip its two joins over the full pair
        # frame rather than paying a no-op pass (r4 VERDICT task #4:
        # candidate-stage fixed cost).
        corrected = tracked_persist(agg)
    else:
        ha = hot_docs.select(
            F.col("doc_id").alias("id_a"), F.col("_hk").alias("_hk_a")
        )
        hb = hot_docs.select(
            F.col("doc_id").alias("id_b"), F.col("_hk").alias("_hk_b")
        )
        if n_hot <= HOT_DOCS_BROADCAST_MAX:
            ha, hb = F.broadcast(ha), F.broadcast(hb)
        corrected = tracked_persist(
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

    def _has(bit: int):
        return F.col("_fl").bitwiseAND(F.lit(bit)) != 0

    dropped_early = None
    surv = corrected
    if min_matches is not None:
        # a pair failing this was proposed ONLY by minhash bands (no sh/wn
        # bit) with a final count below the gate — the prefilter drops it
        # unconditionally, so drop it here, before any wide join
        keep0 = (
            _has(_FL_SH | _FL_WN) | (F.col("_mh_cnt") >= F.lit(min_matches))
        )
        dropped_early = corrected.filter(~keep0)
        surv = corrected.filter(keep0)

    # hamming confirm only where some simhash bucket proposed the pair —
    # band-noise pairs never join the simhash table
    sims = reps.select("doc_id", "simhash")
    sa = sims.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("_sim_a"))
    sb = sims.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("_sim_b"))
    sh_rows = (
        surv.filter(_has(_FL_SH))
        .join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "_sh_ok",
            F.bit_count(F.col("_sim_a").bitwiseXOR(F.col("_sim_b")))
            <= cfg.simhash_radius,
        )
        .drop("_sim_a", "_sim_b")
    )
    scored = sh_rows.unionByName(
        surv.filter(~_has(_FL_SH)).withColumn("_sh_ok", F.lit(False))
    )

    channels = F.array_compact(
        F.array(
            F.when(_has(_FL_MH), F.lit("minhash")),
            F.when(F.col("_sh_ok"), F.lit("simhash")),
            F.when(_has(_FL_WN), F.lit("winnow")),
        )
    )
    if cfg.lsh_rows == 1:
        mh_overlap = F.when(_has(_FL_MH), F.col("_mh_cnt"))
    else:
        mh_overlap = F.lit(None)
    sel = [
        F.col("id_a"),
        F.col("id_b"),
        F.col("channels"),
        mh_overlap.cast("int").alias("mh_overlap"),
        _has(_FL_STAR).alias("is_star"),
    ]
    if cfg.lsh_rows != 1:
        # r > 1: band co-occurrence is NOT signature overlap, so
        # mh_overlap stays null — but the exact band-hit count is still
        # a NECESSARY-condition floor (each co-occurring band certifies
        # r agreeing signature positions), which the prefilter's screen
        # uses to skip the array-shipping exact intersect for pairs that
        # already provably pass (r4 VERDICT task #5).
        sel.append(
            F.when(_has(_FL_MH), F.col("_mh_cnt"))
            .cast("int")
            .alias("band_hits")
        )
    out = (
        scored.withColumn("channels", channels)
        .filter(F.size("channels") > 0)
        .select(*sel)
    )
    if min_matches is None:
        return out, hot, None

    # residual prefilter (verify.prefilter_candidates semantics): a
    # survivor whose simhash bucket failed the hamming ball can fall back
    # to minhash-only with a sub-gate count. Pairs left with NO channel
    # (hamming-failed, never minhash-proposed) are silently dropped
    # exactly as fused_candidates always did.
    keep = (
        F.coalesce(F.col("mh_overlap"), F.lit(0)) >= F.lit(min_matches)
    ) | (F.col("channels") != F.array(F.lit("minhash")))
    kept = out.filter(keep)
    dropped_ids = (
        dropped_early.select("id_a", "id_b")
        .unionByName(out.filter(~keep).select("id_a", "id_b"))
        .select(F.explode(F.array("id_a", "id_b")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )
    return kept, hot, dropped_ids
