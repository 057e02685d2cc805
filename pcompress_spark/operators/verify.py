"""Candidate-pair verification (J4) — never trust the sketch alone.

Reference: every index hit is re-verified against the full checksum and,
with verify_chunks, the actual bytes (rabin/rabin_dedup.c:1132-1180,
:1350-1354). Ours: exact Jaccard on shingle sets for every candidate pair.
The utf-8 TEXT of each side is joined onto the pair (text is ~8x smaller
than the doc's int64 shingle-hash array, so this is the cheaper shuffle),
then one Arrow-batched pandas UDF re-shingles both sides and intersects —
cost O(|candidates| * shingles_per_doc), independent of corpus size.
Winnow-channel pairs that fail the Jaccard threshold get an exact >=L
common-substring check (vectorized pandas UDF) before being admitted as
`substring` edges.

Shingle sets here are hashed 16-byte windows of the utf-8 text (the
vectorized numpy polynomial rolling hash in functions/hashing.py — the
same function the golden oracle uses, so the sets are identical by
construction); Jaccard over any injective window fingerprint equals
Jaccard over the windows themselves (modulo 2^-64 collisions).

Edge kinds (golden fixture vocabulary):
  exact      — identical text (emitted by operators/exact.py, J == 1)
  near       — exact Jaccard >= tau_extra (0.4, DELTA_EXTRA)
  substring  — J < 0.4 but sharing a >= 2048-char verbatim span
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pcompress_spark.cache import tracked_persist
from pcompress_spark.config import PipelineConfig
from pcompress_spark.functions.shingling import make_lcs_udf


def shingle_hash_rows(docs_text: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """(doc_id, h) — distinct hashed w-byte-window shingles per doc.

    The hash set is produced by the vectorized numpy rolling-hash UDF (the
    same function the golden oracle uses — identical sets by construction);
    explode + the downstream joins stay JVM-side, and only (long, long)
    rows enter the verify shuffle. Byte windows (not chars) so multi-byte
    scripts hash identically to the byte-oriented oracle.
    """
    from pcompress_spark.functions.shingling import make_shingle_hashes_lang_udf

    shingles_udf = make_shingle_hashes_lang_udf(cfg)
    lang_col = F.col("lang") if "lang" in docs_text.columns else F.lit("")
    return docs_text.select(
        "doc_id", F.explode(shingles_udf(F.col("text"), lang_col)).alias("h")
    )


def attach_texts(
    candidates: DataFrame, reps_with_text: DataFrame
) -> DataFrame:
    """candidates + texts of both sides (used only by the narrow substring
    branch; the Jaccard path never moves text)."""
    texts = reps_with_text.select("doc_id", "text")
    a = texts.select(F.col("doc_id").alias("id_a"), F.col("text").alias("text_a"))
    b = texts.select(F.col("doc_id").alias("id_b"), F.col("text").alias("text_b"))
    return candidates.join(a, "id_a").join(b, "id_b")


def prefilter_candidates(
    candidates: DataFrame,
    reps: DataFrame,
    min_matches: int = 3,
    overlap_from_bands: bool = True,
    band_rows: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Signature-level pre-filter before exact verification — the
    distributed analog of the reference probing the full checksum before
    memcmp (rabin_dedup.c:1132-1180).

    b=20/r=1 banding (reference semantics) is noisy: an unrelated pair with
    background J≈0.02 still collides in ≥1 band with P≈0.33, so at corpus
    scale most candidates are junk. Keep a minhash-channel pair only when
    >= min_matches of its K=20 signature values agree (signatures are
    already shuffled with reps — no text movement). Recall cost at the
    τ=0.4 boundary: P[Binomial(20, 0.4) < 3] ≈ 0.4%, and such pairs are
    usually also proposed by the simhash/winnow channels, which bypass
    this filter (their own verification is already strong).

    Pairs proposed by any non-minhash channel (`channels` has more than
    'minhash') are exempt from the min-matches gate: their own
    verification (hamming ball / verbatim anchor match) is already strong.
    Star-downgraded pairs need NO exemption: the channels compute exact
    signature overlap even under the star downgrade (star rows excluded
    from the count, shared over-cap buckets added back via hot-key
    intersect — operators/fused.py / lsh.py). A blanket is_star exemption
    was measured at 171k junk pairs (5x the verify set) on a 100k-doc
    boilerplate corpus; gating on the exact value keeps a genuinely
    similar pair (J >= 0.4) w.p. ~0.996 and cuts that junk.
    `overlap_from_bands=False` (required when cfg.lsh_rows != 1, where
    band co-occurrence is NOT signature overlap) recomputes overlap
    exactly via array_intersect on the minhash signatures — but only for
    the pairs whose fate the exact value can still change. When the
    candidate frame carries `band_hits` (the exact band co-occurrence
    count, emitted by the fused/bipartite channels for r > 1), each
    co-occurring band certifies `band_rows` agreeing signature
    positions in disjoint band slices, so band_hits * band_rows is a
    PROVEN FLOOR on the exact overlap: pairs whose floor already meets
    min_matches — and pairs any non-minhash channel proposed — keep
    without shipping their signature arrays (their mh_overlap is the
    floor, a conservative rank for the degree cap); only minhash-only
    pairs below the floor pay the array join (r4 VERDICT task #5 — the
    r>1 leg's array-intersect premium).

    Returns (kept, drop_log(doc_id, n_dropped)) — like the bucket cap and
    degree cap, drops are logged, never silent.
    """
    if "mh_overlap" in candidates.columns and overlap_from_bands:
        # overlap measured upstream as (corrected) band co-occurrence
        # (r == 1: band hash == minhash value, so the count == signature
        # overlap). Null (non-minhash channels) stays null: the degree
        # cap ranks those channel-aware.
        scored = tracked_persist(candidates)
        keep = (
            (F.coalesce(F.col("mh_overlap"), F.lit(0)) >= min_matches)
            | (F.col("channels") != F.array(F.lit("minhash")))
        )
        dropped = (
            scored.filter(~keep)
            .select(F.explode(F.array("id_a", "id_b")).alias("doc_id"))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_dropped"))
        )
        return scored.filter(keep), dropped
    if "band_hits" in candidates.columns:
        floor_ok = (
            F.coalesce(F.col("band_hits"), F.lit(0)) * band_rows
            >= min_matches
        )
        exempt = F.col("channels") != F.array(F.lit("minhash"))
        cands = tracked_persist(candidates)
        screened = cands.filter(floor_ok | exempt).withColumn(
            "mh_overlap",
            F.when(
                F.col("band_hits").isNotNull(),
                F.col("band_hits") * band_rows,
            ).cast("int"),
        )
        need_exact = cands.filter(~(floor_ok | exempt))
        exact = tracked_persist(
            _true_signature_overlap(need_exact, reps)
        )
        kept = screened.unionByName(
            exact.filter(F.col("mh_overlap") >= min_matches)
        ).drop("band_hits")
        dropped = (
            exact.filter(F.col("mh_overlap") < min_matches)
            .select(F.explode(F.array("id_a", "id_b")).alias("doc_id"))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_dropped"))
        )
        return kept, dropped
    scored = tracked_persist(_true_signature_overlap(candidates, reps))
    keep = (
        (F.coalesce(F.col("mh_overlap"), F.lit(0)) >= min_matches)
        | (F.col("channels") != F.array(F.lit("minhash")))
    )
    dropped = (
        scored.filter(~keep)
        .select(F.explode(F.array("id_a", "id_b")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )
    return scored.filter(keep), dropped


def _true_signature_overlap(pairs: DataFrame, reps: DataFrame) -> DataFrame:
    """Replace `mh_overlap` with the exact K-value signature overlap
    (array_intersect on the minhash arrays). The sig table is semi-joined
    down to just the docs appearing in `pairs` first, so the join moves
    O(|pairs|) signatures, not O(corpus) — scale-safe even when `pairs`
    is a small re-score subset of a 100-TB run."""
    docs_in = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    sig = reps.select("doc_id", "minhash").join(docs_in, "doc_id", "left_semi")
    a = sig.select(F.col("doc_id").alias("id_a"), F.col("minhash").alias("mh_a"))
    b = sig.select(F.col("doc_id").alias("id_b"), F.col("minhash").alias("mh_b"))
    return (
        pairs.drop("mh_overlap")
        .join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "mh_overlap",
            F.size(F.array_intersect("mh_a", "mh_b")).cast("int"),
        )
        .drop("mh_a", "mh_b")
    )


def cap_candidate_degree(
    candidates: DataFrame, cap: int, null_rank: int = 3
) -> tuple[DataFrame, DataFrame]:
    """Keep a pair when EITHER endpoint ranks it among its own top-`cap`
    candidates (by minhash overlap desc, then partner id) — the per-node
    analog of the bucket cap. A boilerplate clique of m docs drops from
    m²/2 verified pairs to <= 2·cap·m while every doc retains its
    min(cap, degree) strongest links, so uniform cliques stay one
    connected component for CC. Returns (kept, drop_log(doc_id,
    n_dropped)); drops are logged, never silent.

    Pairs with null mh_overlap were proposed ONLY by the simhash/winnow
    channels, whose own gates (hamming ball / verbatim anchor match) are
    stronger evidence than a weak band count — ranking them at 0 would let
    junk minhash candidates evict a true simhash-proposed near-dup in
    dense neighborhoods. They rank at `null_rank` (default == the
    prefilter's min_matches floor): above every pair weak enough that the
    prefilter would have cut it, below well-supported minhash pairs.
    """
    from pyspark.sql import Window

    ov = (
        F.coalesce(F.col("mh_overlap"), F.lit(null_rank))
        if "mh_overlap" in candidates.columns
        else F.lit(0)
    )
    wa = Window.partitionBy("id_a").orderBy(ov.desc(), F.col("id_b").asc())
    wb = Window.partitionBy("id_b").orderBy(ov.desc(), F.col("id_a").asc())
    # persisted: both the kept set and the drop log read the ranked frame
    ranked = tracked_persist(
        candidates.withColumn("_ra", F.row_number().over(wa)).withColumn(
            "_rb", F.row_number().over(wb)
        )
    )
    kept = ranked.filter((F.col("_ra") <= cap) | (F.col("_rb") <= cap)).drop(
        "_ra", "_rb"
    )
    dropped = (
        ranked.filter((F.col("_ra") > cap) & (F.col("_rb") > cap))
        .select(F.explode(F.array("id_a", "id_b")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )
    return kept, dropped


def merge_candidates(*channel_dfs: DataFrame) -> DataFrame:
    """Union candidates from all channels, one row per pair with the set of
    channels that proposed it (SO1 union + A6 distinct), the signature
    overlap where a channel measured one (minhash band co-occurrence),
    and the star-downgrade flag (any channel)."""

    def _norm(df: DataFrame) -> DataFrame:
        if "mh_overlap" not in df.columns:
            df = df.withColumn("mh_overlap", F.lit(None).cast("int"))
        if "is_star" not in df.columns:
            df = df.withColumn("is_star", F.lit(False))
        return df.select("id_a", "id_b", "channel", "mh_overlap", "is_star")

    frames = [_norm(df) for df in channel_dfs]
    unioned = frames[0]
    for df in frames[1:]:
        unioned = unioned.unionByName(df)
    return unioned.groupBy("id_a", "id_b").agg(
        F.collect_set("channel").alias("channels"),
        F.max("mh_overlap").alias("mh_overlap"),
        F.max("is_star").alias("is_star"),
    )


def pair_jaccard(
    candidates: DataFrame, reps_with_text: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """(id_a, id_b, jaccard) — exact shingle-set Jaccard per candidate pair.

    TEXT (not shingle arrays) is joined to both sides of each pair, then
    one Arrow-batched pandas UDF shingles both sides and intersects
    (`shingles_for` — the exact function the golden oracle uses, so the
    sets are identical by construction). A doc's utf-8 text is ~8x
    smaller than its int64 shingle-hash array; the earlier array-join
    formulation was shuffle-bound (memory-bandwidth contention capped the
    verify stage at 0.54 scaling efficiency from 2->8 cores), while
    re-shingling per pair is ~0.2 ms vectorized. Cost stays
    O(|candidates| * shingles_per_doc), independent of corpus size.
    Every candidate pair appears in the output, including zero-overlap
    pairs (jaccard = 0.0) — downstream thresholds do the filtering.
    """
    from pcompress_spark.functions.shingling import make_jaccard_lang_udf

    lang_col = (
        F.col("lang") if "lang" in reps_with_text.columns else F.lit("")
    )
    texts = reps_with_text.select(
        "doc_id", "text", lang_col.alias("_lang")
    )
    # shuffle_hash hints: a mis-estimated broadcast of a 100s-of-MB text
    # table stalls the driver; hash-partitioning by doc id is the
    # scale-correct strategy.
    a = texts.select(
        F.col("doc_id").alias("id_a"),
        F.col("text").alias("text_a"),
        F.col("_lang").alias("lang_a"),
    ).hint("shuffle_hash")
    b = texts.select(
        F.col("doc_id").alias("id_b"),
        F.col("text").alias("text_b"),
        F.col("_lang").alias("lang_b"),
    ).hint("shuffle_hash")
    jac_udf = make_jaccard_lang_udf(cfg)
    return (
        candidates.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            jac_udf("text_a", "lang_a", "text_b", "lang_b").alias("jaccard"),
        )
    )


def verify_edges(
    candidates: DataFrame,
    reps_with_text: DataFrame,
    cfg: PipelineConfig,
    eager_jaccard: bool = False,
) -> DataFrame:
    """candidates(id_a, id_b, channels) -> edges(src, dst, jaccard, kind).

    near      — exact Jaccard >= tau_extra (JVM shingle join, no Python)
    substring — winnow-proposed pairs below the bar sharing a verified
                >= substring_min_len verbatim span. Screening is JVM-side:
                per-doc window-hash arrays are computed ONCE (pandas UDF),
                pairs are screened with `array_intersect`, and the
                byte-confirming lcs UDF runs only on hash hits (true spans
                + 2^-64 collisions) — never once-per-candidate-pair.
    """
    # persist: jac feeds both the near branch and the substring pre-filter.
    # eager_jaccard forces it NOW so a multi-branch downstream action reads
    # a warm cache rather than computing the verify join once per branch.
    jac = tracked_persist(pair_jaccard(candidates, reps_with_text, cfg))
    if eager_jaccard:
        jac.count()
    near = jac.filter(F.col("jaccard") >= cfg.tau_extra).select(
        F.col("id_a").alias("src"),
        F.col("id_b").alias("dst"),
        "jaccard",
        F.lit("near").alias("kind"),
    )
    sub_cand = (
        candidates.filter(F.array_contains("channels", "winnow"))
        .join(jac, ["id_a", "id_b"], "left")
        .withColumn("jaccard", F.coalesce("jaccard", F.lit(0.0)))
        .filter(F.col("jaccard") < cfg.tau_extra)
        .select("id_a", "id_b", "jaccard")
    )
    sub = confirm_substring_pairs(sub_cand, reps_with_text, cfg).select(
        F.col("id_a").alias("src"),
        F.col("id_b").alias("dst"),
        "jaccard",
        F.lit("substring").alias("kind"),
    )
    return near.unionByName(sub)


def confirm_substring_pairs(
    sub_cand: DataFrame, reps_with_text: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """Byte-confirm a >= substring_min_len shared span on candidate pairs;
    keeps sub_cand's columns, drops unconfirmed pairs.

    Screen economics: the window-hash screen precomputes one long per char
    offset per doc (~8 bytes/char, ~8x the utf-8 text) and ships the
    arrays through two shuffle joins, to SAVE a byte-confirming pandas UDF
    per pair — the same probe-the-cheap-key-before-memcmp idea as the
    reference (rabin_dedup.c:1132-1180), and like there, the screen must
    stay cheaper than what it screens. At the production min_len (2048,
    long docs) it does; at short-doc configs it costs more than the
    confirm (measured: dedup_substring 22.6 -> 37.9 s at sf0.1 when the
    screen ran unconditionally — r2 verdict), so `auto` mode screens only
    for min_len >= the break-even (cfg.use_substring_screen)."""
    if cfg.use_substring_screen():
        sub_cand = substring_screen(sub_cand, reps_with_text, cfg)
    lcs_udf = make_lcs_udf(cfg)
    return (
        attach_texts(sub_cand, reps_with_text)
        .filter(lcs_udf("text_a", "text_b"))
        .drop("text_a", "text_b")
    )


def substring_screen(
    sub_cand: DataFrame, reps_with_text: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """Keep only pairs whose >= min_len window-hash sets intersect.

    Hashing cost is O(total chars of candidate docs), paid once per doc;
    the per-pair work is a codegen array_intersect of sorted long arrays.
    A surviving pair shares a window hash — i.e. shares a verbatim
    >= min_len span, or is one of the ~2^-64 hash collisions the caller's
    byte-confirmation then rejects.
    """
    from pcompress_spark.functions.shingling import make_window_hashes_udf

    docs_in = (
        sub_cand.select(F.col("id_a").alias("doc_id"))
        .unionByName(sub_cand.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    win_udf = make_window_hashes_udf(cfg)
    win = tracked_persist(
        reps_with_text.join(docs_in, "doc_id", "left_semi")
        .filter(F.length("text") >= cfg.substring_min_len)
        .select("doc_id", win_udf("text").alias("win"))
    )
    a = win.select(
        F.col("doc_id").alias("id_a"), F.col("win").alias("win_a")
    ).hint("shuffle_hash")
    b = win.select(
        F.col("doc_id").alias("id_b"), F.col("win").alias("win_b")
    ).hint("shuffle_hash")
    return (
        sub_cand.join(a, "id_a")
        .join(b, "id_b")
        .filter(F.size(F.array_intersect("win_a", "win_b")) > 0)
        .drop("win_a", "win_b")
    )
