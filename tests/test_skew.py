"""Hot-band skew: a boilerplate block shared by many docs must not explode
the candidate join; the cap downgrades hot buckets to star-connections
(logged), preserving cluster connectivity (SURVEY §7 hard parts)."""

import pandas as pd
from pyspark.sql import functions as F

from pcompress_spark import datagen
from pcompress_spark.config import PipelineConfig
from pcompress_spark.pipeline import DedupPipeline


def test_hot_band_completes_under_cap_with_connectivity(spark, tmp_path):
    # 1000-doc block has 30 boilerplate docs sharing a dominant shingle block.
    # Force the hot path by setting the bucket cap *below* the bucket size.
    pdf = datagen.gen_pages_pandas(1000)
    pages = spark.createDataFrame(pdf)
    cfg = PipelineConfig(max_bucket_docs=8)
    pipe = DedupPipeline(spark, cfg, checkpoint_dir=str(tmp_path / "ckpt_skew"))
    assignments = pipe.run(pages).toPandas()

    # hot buckets must be logged, not silently dropped
    hot = pd.read_parquet(f"{tmp_path}/ckpt_skew/_hot_buckets_lsh")
    assert len(hot) > 0
    assert (hot["n_docs"] > 8).all()

    # the boilerplate docs (index 970-999 of the block) still one cluster
    boiler_urls = pdf.iloc[970:1000]["url"]
    cl = assignments.set_index("url").loc[boiler_urls, "cluster_id"]
    assert cl.nunique() == 1


def test_bucket_pairs_three_branches_exactly_once(spark):
    """All three bucket_pairs regimes — small self-join, SALTED triangle
    (the default config clamps salting off at cap=64, so this branch gets
    no pipeline coverage), and over-cap star — must emit each pair
    EXACTLY once (the fused channels count band co-occurrence from these
    rows; a duplicate emission would corrupt signature overlap)."""
    from pcompress_spark.operators.pairs import bucket_pairs

    rows = (
        [("A", i) for i in range(4)]          # small: 4 <= salt_min
        + [("B", 100 + i) for i in range(20)]  # salted: 4 < 20 <= cap
        + [("C", 1000 + i) for i in range(70)]  # star: 70 > cap
    )
    buckets = spark.createDataFrame(rows, "k string, doc_id long")
    pairs, hot = bucket_pairs(
        buckets, ["k"], cap=64, salt_min=4, salt_groups=4
    )
    got = [(r.id_a, r.id_b, bool(r.is_star)) for r in pairs.collect()]
    assert len(got) == len(set(got)), "duplicate pair emission"
    small = {(a, b, s) for a, b, s in got if a < 100}
    med = {(a, b, s) for a, b, s in got if 100 <= a < 1000}
    star = {(a, b, s) for a, b, s in got if a >= 1000}
    assert small == {
        (i, j, False) for i in range(4) for j in range(i + 1, 4)
    }
    assert med == {
        (100 + i, 100 + j, False)
        for i in range(20)
        for j in range(i + 1, 20)
    }
    # star bucket: only rep-member edges, flagged
    assert star == {(1000, 1000 + j, True) for j in range(1, 70)}
    hot_rows = hot.collect()
    assert [(r.k, r.n_docs) for r in hot_rows] == [("C", 70)]
