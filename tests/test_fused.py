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


def test_fused_star_pairs_survive_prefilter(spark):
    """Star-downgraded pairs carry undercounted band co-occurrence; the
    prefilter must not drop them on the min-matches gate (ADVICE r2)."""
    cands = spark.createDataFrame(
        [
            (1, 2, ["minhash"], 1, True),   # star, weak count -> keep
            (1, 3, ["minhash"], 1, False),  # non-star weak     -> drop
            (2, 3, ["minhash"], 5, False),  # strong            -> keep
        ],
        "id_a long, id_b long, channels array<string>, mh_overlap int,"
        " is_star boolean",
    )
    kept, dropped = verify.prefilter_candidates(cands, None, min_matches=3)
    got = {(r.id_a, r.id_b) for r in kept.collect()}
    assert got == {(1, 2), (2, 3)}
    assert dropped.count() > 0


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
    # prefilter with overlap_from_bands=False recomputes via intersect
    kept, _ = verify.prefilter_candidates(
        cands, reps, min_matches=3, overlap_from_bands=False
    )
    assert kept.filter(F.col("mh_overlap").isNull()).count() == 0
    reps.unpersist()


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
