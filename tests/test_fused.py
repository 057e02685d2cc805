"""Fused candidate channel: equivalence with the legacy per-channel path,
star-pair prefilter exemption, r>1 overlap guard, concurrency config."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcompress_spark import datagen  # noqa: E402
from pcompress_spark.config import PipelineConfig  # noqa: E402
from pcompress_spark.operators import (  # noqa: E402
    exact,
    fused,
    lsh,
    simhash,
    substring,
    verify,
)


def _reps(spark, n=400, cfg=PipelineConfig()):
    pages = spark.createDataFrame(datagen.gen_pages_pandas(n))
    sigs = exact.build_sigs(pages, cfg)
    return exact.representatives(sigs, exact.text_groups(sigs)).persist()


def _as_dict(df):
    out = {}
    for r in df.collect():
        out[(r.id_a, r.id_b)] = (
            tuple(sorted(r.channels)),
            r.mh_overlap,
            bool(r.is_star),
        )
    return out


def test_fused_equals_legacy_merge(spark):
    """The fused one-shuffle path must produce exactly the candidate set,
    channel tags, and band-co-occurrence counts of the three separate
    channel jobs merged."""
    cfg = PipelineConfig()
    reps = _reps(spark, 400, cfg)
    got_fused, _ = fused.fused_candidates(reps, cfg)
    legacy = verify.merge_candidates(
        lsh.lsh_candidates(reps, cfg)[0],
        simhash.simhash_candidates(reps, cfg)[0],
        substring.substring_candidates(reps, cfg)[0],
    )
    f, l = _as_dict(got_fused), _as_dict(legacy)
    assert f == l
    assert len(f) > 0
    reps.unpersist()


def _crafted_reps(spark):
    """8 docs with hand-built minhash signatures (K=20, r=1):
    - docs 1..6 share bands 0..9 (a 6-doc bucket per band -> over the
      cap=4, star-downgraded onto rep doc 1);
    - docs 2,3 additionally share bands 10..13 (2-doc buckets, emitted
      by the small branch);
    - docs 7,8 share exactly band 19 (true overlap 1 — junk).
    Exact signature overlaps: (1,j)=10 for j in 2..6, (2,3)=14, (7,8)=1.
    Simhash values are block-distinct (no simhash pairs); texts are below
    substring_min_len (no winnow rows)."""
    rows = []
    for d in range(1, 9):
        mh = []
        for i in range(20):
            if d <= 6 and i < 10:
                mh.append(1000 + i)                  # hot shared bands
            elif d in (2, 3) and 10 <= i <= 13:
                mh.append(2000 + i)                  # small shared bands
            elif d in (7, 8) and i == 19:
                mh.append(3000)                      # one junk collision
            else:
                mh.append(d * 1_000_000 + i)         # unique
        # distinct 16-bit blocks everywhere -> no simhash buckets
        sim = d * 0x0001_0001_0001_0001
        rows.append((d, f"u{d}", "short text", mh, sim, 100))
    return spark.createDataFrame(
        rows,
        "doc_id long, url string, text string, minhash array<long>,"
        " simhash long, nshingles int",
    )


def test_star_downgrade_counts_are_exact_overlap(spark):
    """An over-cap bucket suppresses member-member emission; the hot-key
    correction (star rows excluded, shared over-cap buckets added back)
    must make mh_overlap the EXACT signature overlap for every emitted
    pair — the r2 ADVICE fix, without the blanket is_star exemption that
    flooded verify with 171k junk pairs at 100k docs."""
    cfg = PipelineConfig(max_bucket_docs=4)
    reps = _crafted_reps(spark).persist()
    expect = {(1, j): 10 for j in range(2, 7)}
    expect[(2, 3)] = 14
    expect[(7, 8)] = 1

    for cands in (
        fused.fused_candidates(reps, cfg)[0],
        lsh.lsh_candidates(reps, cfg)[0].withColumn(
            "channels", F.array(F.lit("minhash"))
        ),
    ):
        got = {
            (r.id_a, r.id_b): (r.mh_overlap, bool(r.is_star))
            for r in cands.collect()
        }
        assert {k: v[0] for k, v in got.items()} == expect
        # star flag marks pairs EMITTED by the star branch (rep-member);
        # member-member pairs get their hot-bucket counts via the
        # intersect without the flag
        assert got[(1, 2)][1]
        assert not got[(2, 3)][1] and not got[(7, 8)][1]

    # prefilter gates on the exact value: junk (7,8) drops, the rest keep
    kept, dropped = verify.prefilter_candidates(
        fused.fused_candidates(reps, cfg)[0], reps, min_matches=3
    )
    assert {(r.id_a, r.id_b) for r in kept.collect()} == set(expect) - {(7, 8)}
    assert dropped.count() > 0
    reps.unpersist()


def test_r_gt_1_emits_null_overlap(spark):
    """With r > 1 band co-occurrence is NOT signature overlap (ADVICE r2):
    the channel must emit null so the prefilter recomputes exactly."""
    cfg = PipelineConfig(lsh_bands=4, lsh_rows=5)
    # plant near-identical pairs (J ~ 0.97) so full 5-row band slices match
    rows = []
    for i in range(8):
        base = f"the quick brown fox number {i} jumps over the lazy dog " * 20
        rows.append((f"u{i}a", base + "ending one", "en"))
        rows.append((f"u{i}b", base + "ending two", "en"))
    pages = spark.createDataFrame(rows, "url string, text string, lang string")
    sigs = exact.build_sigs(pages, cfg)
    reps = exact.representatives(sigs, exact.text_groups(sigs)).persist()
    cands, _ = fused.fused_candidates(reps, cfg)
    mh_rows = cands.filter(F.array_contains("channels", "minhash"))
    assert mh_rows.count() > 0
    assert mh_rows.filter(F.col("mh_overlap").isNotNull()).count() == 0
    # the channel also emits the exact band-hit count for the optional
    # r>1 floor screen (cfg.r_gt1_band_screen, default off)
    assert "band_hits" in cands.columns
    # prefilter default path (screen off): band_hits stripped, overlap
    # recomputed exactly via intersect for every pair
    kept, _ = verify.prefilter_candidates(
        cands.drop("band_hits"), reps, min_matches=3,
        overlap_from_bands=False,
    )
    assert kept.filter(F.col("mh_overlap").isNull()).count() == 0
    # screen path (band_rows=r): identical kept PAIR SET — floor >= gate
    # implies exact >= gate, and undecided pairs fall through to exact
    kept_s, _ = verify.prefilter_candidates(
        cands, reps, min_matches=3, overlap_from_bands=False,
        band_rows=cfg.lsh_rows,
    )
    assert (
        {(r.id_a, r.id_b) for r in kept_s.collect()}
        == {(r.id_a, r.id_b) for r in kept.collect()}
    )
    reps.unpersist()


def _prefilter_parity(spark, reps, cfg, min_matches=3):
    """fused_prefiltered must equal prefilter_candidates over
    fused_candidates — same kept pairs/columns AND same drop log."""
    kept_f, _hot, drop_f = fused.fused_prefiltered(reps, cfg, min_matches)
    kept_l, drop_l = verify.prefilter_candidates(
        fused.fused_candidates(reps, cfg)[0], reps, min_matches=min_matches
    )
    assert _as_dict(kept_f) == _as_dict(kept_l)
    as_map = lambda df: {r.doc_id: r.n_dropped for r in df.collect()}  # noqa: E731
    assert as_map(drop_f) == as_map(drop_l)
    return kept_f


def test_fused_prefiltered_equals_separate_prefilter(spark):
    # 800 docs: the smallest datagen corpus where pairs actually survive
    # the min_matches gate (at 400 everything is band noise)
    cfg = PipelineConfig()
    reps = _reps(spark, 800, cfg)
    kept = _prefilter_parity(spark, reps, cfg)
    assert kept.count() > 0
    reps.unpersist()


def test_fused_prefiltered_hot_paths(spark, monkeypatch):
    """Parity must hold through BOTH hot-key correction join strategies:
    the broadcast fast path and the shuffle fallback (forced by a zero
    broadcast gate), on the crafted over-cap corpus."""
    cfg = PipelineConfig(max_bucket_docs=4)
    reps = _crafted_reps(spark).persist()
    expect = {(1, j) for j in range(2, 7)} | {(2, 3)}  # (7,8) is junk
    for gate in (fused.HOT_DOCS_BROADCAST_MAX, 0):
        monkeypatch.setattr(fused, "HOT_DOCS_BROADCAST_MAX", gate)
        kept = _prefilter_parity(spark, reps, cfg)
        assert {(r.id_a, r.id_b) for r in kept.collect()} == expect
    reps.unpersist()


def test_fused_prefiltered_rejects_r_gt_1(spark):
    import pytest

    cfg = PipelineConfig(lsh_bands=4, lsh_rows=5)
    with pytest.raises(ValueError):
        fused.fused_prefiltered(_crafted_reps(spark), cfg)


def test_null_overlap_ranks_at_floor(spark):
    """Simhash/winnow-only pairs (null overlap) must outrank weak minhash
    pairs in the degree cap (ADVICE r2), not sort at 0."""
    # doc 1 has cap=2 neighbors: two weak minhash pairs (overlap 1) and one
    # simhash-only pair (null). The null pair must be kept.
    cands = spark.createDataFrame(
        [
            (1, 2, ["minhash"], 1),
            (1, 3, ["minhash"], 1),
            (1, 4, ["simhash"], None),
        ],
        "id_a long, id_b long, channels array<string>, mh_overlap int",
    )
    kept, _ = verify.cap_candidate_degree(cands, cap=1, null_rank=3)
    got = {(r.id_a, r.id_b) for r in kept.collect()}
    assert (1, 4) in got


def test_legacy_concurrency_config(spark, tmp_path):
    """concurrent_channels True/False both produce a working legacy run."""
    import pandas as pd

    from pcompress_spark.pipeline import DedupPipeline

    pdf = datagen.gen_pages_pandas(200)
    pages = spark.createDataFrame(pdf)
    outs = []
    for i, conc in enumerate([True, False]):
        cfg = PipelineConfig(fused_channels=False, concurrent_channels=conc)
        pipe = DedupPipeline(
            spark, cfg, checkpoint_dir=str(tmp_path / f"ck{i}"), resume=False
        )
        outs.append(
            pipe.run(pages)
            .select("url", "cluster_id")
            .toPandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
