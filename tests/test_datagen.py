"""Datagen determinism + extraction invariant (FIXTURES.md §5, BASELINE.json)."""

import hashlib
import os

from pcompress_spark import datagen
from tests.conftest import FIXTURES


def test_pages_regeneration_byte_identical(pages_pdf):
    h = hashlib.sha256()
    for t in pages_pdf["text"]:
        h.update(t.encode())
    for u in pages_pdf["url"]:
        h.update(u.encode())
    for b in pages_pdf["html"]:
        h.update(b)
    expected = open(os.path.join(FIXTURES, "pages_n1000.sha256")).read().strip()
    assert h.hexdigest() == expected


def test_generation_is_pure_function_of_index():
    a = datagen.gen_pages_pandas(3, start=700)
    b = datagen.gen_pages_pandas(3, start=700)
    assert (a["text"] == b["text"]).all()
    assert (a["url"] == b["url"]).all()


def test_spark_generation_matches_pandas(spark, pages_pdf):
    sdf = datagen.gen_pages_spark(spark, 50, partitions=7).orderBy("url").toPandas()
    local = pages_pdf.iloc[:50].sort_values("url").reset_index(drop=True)
    assert (sdf["text"].values == local["text"].values).all()
    assert (sdf["html"].apply(bytes).values == local["html"].apply(bytes).values).all()


def test_extract_text_byte_identical(spark, pages_df):
    """extract_text(html) must reproduce the text column exactly, per url."""
    from pcompress_spark.functions.text import extract_text
    from pyspark.sql import functions as F

    bad = (
        pages_df.withColumn("ex", extract_text("html"))
        .filter(F.col("ex") != F.col("text"))
        .count()
    )
    assert bad == 0
