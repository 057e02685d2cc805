"""Storage-agnosticism of the checkpoint/index layers (VERDICT r3 task #4).

Three guarantees:
 1. source-level: the layers that persist state (checkpoint.py,
    operators/incremental.py) perform every probe/mutation through the
    Hadoop FileSystem API — no os.path/shutil/builtin-open anywhere;
 2. behavioral: the full checkpoint-resume AND incremental-index flows
    work unchanged through a NON-default Hadoop FileSystem
    (RawLocalFileSystem — no checksum wrapper, different class, same
    API), proving nothing secretly depends on the default LocalFileSystem;
 3. table-format: a real Iceberg round-trip (create / append / MERGE
    upsert) that runs whenever the iceberg-spark-runtime jar is on the
    classpath and SKIPS (with the reason) when it is not — the sandbox
    default. Reference bar: storage-real commits (pcompress.c:2909-2917).
"""

import inspect
import os
import re
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcompress_spark.config import PipelineConfig  # noqa: E402
from pcompress_spark.operators.incremental import (  # noqa: E402
    IncrementalDedupIndex,
)


def _code_only(mod) -> str:
    """Module source with comments and string literals (docstrings)
    stripped — prose may legitimately SAY 'os.path/shutil'."""
    import io
    import tokenize

    out = []
    toks = tokenize.generate_tokens(
        io.StringIO(inspect.getsource(mod)).readline
    )
    for tok in toks:
        if tok.type not in (tokenize.COMMENT, tokenize.STRING):
            out.append(tok.string)
    return " ".join(out)


def test_storage_layers_use_hadoop_fs_only():
    """Grep-test: no local-FS shortcut can hide in the storage layers."""
    import pcompress_spark.checkpoint as cp
    import pcompress_spark.operators.incremental as inc

    for mod in (cp, inc):
        src = _code_only(mod)
        assert "shutil" not in src, mod.__name__
        assert "os.path" not in src, mod.__name__
        assert not re.search(r"\bimport os\b", src), mod.__name__
        # builtin open() — the `.open(` method of the Hadoop FS is fine
        # (tokens are space-joined, so a method call reads `. open (`)
        assert not re.search(r"(?<!\. )open \(", src), mod.__name__
        assert "glob" not in src, mod.__name__


class _RawLocalFs:
    """Force fs.file.impl to RawLocalFileSystem for the duration (cache
    disabled so the setting actually takes), restoring afterwards."""

    def __init__(self, spark):
        self.spark = spark
        self.hconf = spark.sparkContext._jsc.hadoopConfiguration()

    def __enter__(self):
        self.old_impl = self.hconf.get("fs.file.impl")
        self.hconf.set(
            "fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem"
        )
        self.hconf.set("fs.file.impl.disable.cache", "true")
        jvm = self.spark._jvm
        fs = jvm.org.apache.hadoop.fs.Path("file:///").getFileSystem(
            self.hconf
        )
        assert "RawLocalFileSystem" in fs.getClass().getName()
        return self

    def __exit__(self, *exc):
        if self.old_impl:
            self.hconf.set("fs.file.impl", self.old_impl)
        else:
            self.hconf.unset("fs.file.impl")
        self.hconf.unset("fs.file.impl.disable.cache")
        return False


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, t, "en") for u, t in rows], "url string, text string, lang string"
    )


def test_checkpoint_resume_through_rawlocal_fs(spark, tmp_path):
    from pcompress_spark.checkpoint import CheckpointManager

    with _RawLocalFs(spark):
        base = str(tmp_path / "ck")
        ck = CheckpointManager(spark, base)
        calls = []

        def build():
            calls.append(1)
            return spark.range(100).withColumnRenamed("id", "doc_id")

        out = ck.materialize("stage1", build)
        assert out.count() == 100 and calls == [1]
        assert ck.lineage()[0]["stage"] == "stage1"
        assert ck.lineage()[0]["rows"] == 100
        # a second manager over the same dir resumes without rebuilding
        ck2 = CheckpointManager(spark, base)
        out2 = ck2.materialize("stage1", build)
        assert out2.count() == 100 and calls == [1]
        assert ck2.lineage()[0]["rows"] == 100  # lineage reloaded from FS


def test_incremental_index_through_rawlocal_fs(spark, tmp_path):
    base = (
        "a storage agnosticism paragraph with plenty of shingle material "
        "and a distinctive stable tail of tokens for clean signatures "
    )
    a = base + " ".join(f"alpha{i}" for i in range(14))
    b = base + " ".join(f"alpha{i}" for i in range(7)) + " " + " ".join(
        f"beta{i}" for i in range(7)
    )
    with _RawLocalFs(spark):
        idx = IncrementalDedupIndex(
            spark, PipelineConfig(), str(tmp_path / "idx")
        )
        idx.bootstrap(_pages(spark, [("u://a", a)]))
        idx.add_batch(_pages(spark, [("u://b", b)]))
        res = {
            r["doc_id"]: r["cluster_id"] for r in idx.assignments().collect()
        }
        assert len(res) == 2
        assert len(set(res.values())) == 1, f"near-dups must cluster: {res}"
        assert idx.compact() >= 0  # maintenance op also storage-clean


def _iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_iceberg_roundtrip(spark, tmp_path):
    """Real Iceberg table round-trip: create, append, snapshot-commit
    MERGE upsert — the operation the index's tombstone/version machinery
    emulates on plain parquet. Runs when iceberg-spark-runtime is on the
    classpath; skips (loudly) when not."""
    if not _iceberg_available(spark):
        pytest.skip(
            "iceberg-spark-runtime jar not on the classpath — the sandbox "
            "default; this test runs unmodified on a cluster that ships it"
        )
    spark.conf.set(
        "spark.sql.catalog.pcit", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.pcit.type", "hadoop")
    spark.conf.set("spark.sql.catalog.pcit.warehouse", str(tmp_path / "wh"))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pcit.db")
    spark.sql("DROP TABLE IF EXISTS pcit.db.assign")
    spark.createDataFrame(
        [(1, 10), (2, 10)], "doc_id long, cluster_id long"
    ).writeTo("pcit.db.assign").using("iceberg").create()
    spark.createDataFrame([(3, 3)], "doc_id long, cluster_id long").writeTo(
        "pcit.db.assign"
    ).append()
    spark.sql(
        "MERGE INTO pcit.db.assign t USING "
        "(SELECT 1 AS doc_id, 99 AS cluster_id) s ON t.doc_id = s.doc_id "
        "WHEN MATCHED THEN UPDATE SET t.cluster_id = s.cluster_id "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in spark.table("pcit.db.assign").collect()
    }
    assert got == {1: 99, 2: 10, 3: 3}
