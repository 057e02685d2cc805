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
