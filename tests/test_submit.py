"""spark-submit --py-files deployment path (SURVEY M8, north-rule ship shape).

Proves the packaged zip alone supplies the engine: the job subprocess runs
from a scratch cwd with PYTHONPATH stripped, so any import that leaks past
the --py-files artifact fails loudly.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyspark
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not available"
)
def test_spark_submit_pyfiles_roundtrip(tmp_path) -> None:
    zip_path = tmp_path / "pcompress_spark.zip"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_pyfiles.py"),
         str(zip_path)],
        capture_output=True, text=True, timeout=60,
    )
    assert out.returncode == 0, out.stderr
    assert zip_path.exists()

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out_dir = tmp_path / "assignments"
    job = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--py-files", str(zip_path),
         os.path.join(REPO, "jobs", "run_dedup.py"),
         "--gen-docs", "600",
         "--output", str(out_dir),
         "--checkpoint-dir", str(tmp_path / "ckpt")],
        capture_output=True, text=True, timeout=300,
        cwd=str(tmp_path), env=env,
    )
    assert job.returncode == 0, job.stderr[-3000:]
    result_lines = [
        ln for ln in job.stdout.splitlines() if ln.startswith("DEDUPRESULT ")
    ]
    assert len(result_lines) == 1, job.stdout[-2000:]
    rec = json.loads(result_lines[0][len("DEDUPRESULT "):])
    assert rec["docs"] == 600
    assert 0 < rec["clusters"] < 600          # real dup structure found
    assert rec["parallelism"] == 4            # --master governed, not code
    assert os.path.exists(out_dir / "_SUCCESS")


def test_run_dedup_input_path_and_conf_override(spark, pages_df, tmp_path) -> None:
    """The --input (pre-written pages parquet) and --conf-override (k/m/g
    size parsing) branches of the entry job, driven in-process: same
    corpus through --input must reproduce the --gen-docs cluster structure
    byte-for-byte (doc_id = xxhash64(url) is ingest-order-free)."""
    import importlib

    run_dedup = importlib.import_module("jobs.run_dedup")

    corpus = str(tmp_path / "pages")
    pages_df.write.parquet(corpus)
    args = run_dedup.parse_cli(
        ["--input", corpus,
         "--output", str(tmp_path / "assign"),
         "--checkpoint-dir", str(tmp_path / "ckpt"),
         "--conf-override", "substring_min_len=2k",
         "--conf-override", "minhash_k=20"]
    )
    cfg = run_dedup.build_config(args.conf_override)
    assert cfg.substring_min_len == 2048 and cfg.minhash_k == 20
    pages = run_dedup.load_pages(spark, args)
    assert pages.columns == pages_df.columns
    assert pages.count() == pages_df.count()


def test_run_dedup_bootstrap_then_increment_cli(spark, tmp_path) -> None:
    """--mode bootstrap persists the index; a re-delivered --mode increment
    over the same generated corpus is a no-op (idempotency through the CLI
    path), and both outputs carry the same merge-resolved assignments."""
    import importlib

    run_dedup = importlib.import_module("jobs.run_dedup")
    idx_dir = str(tmp_path / "idx")
    out1 = str(tmp_path / "out1")
    out2 = str(tmp_path / "out2")

    rc = run_dedup.main([
        "--gen-docs", "60", "--mode", "bootstrap",
        "--index-dir", idx_dir, "--output", out1,
    ])
    assert rc == 0
    a1 = {r["doc_id"]: r["cluster_id"]
          for r in spark.read.parquet(out1).collect()}
    assert len(a1) == 60

    rc = run_dedup.main([
        "--gen-docs", "60", "--mode", "increment",
        "--index-dir", idx_dir, "--output", out2,
    ])
    assert rc == 0
    a2 = {r["doc_id"]: r["cluster_id"]
          for r in spark.read.parquet(out2).collect()}
    assert a2 == a1


def test_run_dedup_update_and_queue_cli(spark, tmp_path) -> None:
    """--mode update re-versions a changed url through the CLI, and
    repeated --input paths drain as ONE coalesced increment action."""
    import importlib

    from pyspark.sql import functions as F

    run_dedup = importlib.import_module("jobs.run_dedup")
    idx_dir = str(tmp_path / "idx")

    def write(rows, name):
        p = str(tmp_path / name)
        spark.createDataFrame(
            rows, "url string, text string, lang string"
        ).coalesce(1).write.mode("overwrite").parquet(p)
        return p

    base = write(
        [("u://a", "stable document alpha " * 10, "en"),
         ("u://b", "changeable document beta " * 10, "en")],
        "base",
    )
    rc = run_dedup.main([
        "--input", base, "--mode", "bootstrap",
        "--index-dir", idx_dir, "--output", str(tmp_path / "o1"),
    ])
    assert rc == 0

    # queue: two pending batches drained in one action
    q1 = write([("u://c", "fresh document gamma " * 10, "en")], "q1")
    q2 = write([("u://d", "fresh document delta " * 10, "en")], "q2")
    rc = run_dedup.main([
        "--input", q1, "--input", q2, "--mode", "increment",
        "--index-dir", idx_dir, "--output", str(tmp_path / "o2"),
    ])
    assert rc == 0
    assert spark.read.parquet(str(tmp_path / "o2")).count() == 4

    # upsert: u://b re-crawled with changed content
    upd = write(
        [("u://b", "completely rewritten beta content " * 10, "en")],
        "upd",
    )
    rc = run_dedup.main([
        "--input", upd, "--mode", "update",
        "--index-dir", idx_dir, "--output", str(tmp_path / "o3"),
    ])
    assert rc == 0
    out = spark.read.parquet(str(tmp_path / "o3"))
    assert out.count() == 4  # still 4 docs, b re-versioned not duplicated
    b_id = out.filter(
        F.col("doc_id") == F.xxhash64(F.lit("u://b"))
    )
    assert b_id.count() == 1

    # multi-input is an increment-only feature
    rc = None
    try:
        run_dedup.main([
            "--input", q1, "--input", q2, "--mode", "full",
            "--output", str(tmp_path / "o4"),
        ])
    except SystemExit as e:
        rc = str(e)
    assert rc and "increment-mode" in rc


def test_run_dedup_curate_mode(spark, tmp_path, capsys) -> None:
    """--mode curate writes curated pages + a drop report: normalized
    text, quality drops logged by reason, cross-doc line dedup applied
    (duplicate boilerplate lines removed corpus-wide)."""
    import importlib
    import json as _json

    run_dedup = importlib.import_module("jobs.run_dedup")
    out = str(tmp_path / "curated")

    # >= 1000 docs: the generator plants its dup structure per 1000-doc
    # block, so smaller corpora have no shared lines to remove
    rc = run_dedup.main([
        "--gen-docs", "1000", "--mode", "curate",
        "--line-mode", "token_block", "--output", out,
    ])
    assert rc == 0
    line = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("CURATERESULT ")
    ][-1]
    res = _json.loads(line.split(" ", 1)[1])
    curated = spark.read.parquet(out)
    assert curated.count() == res["docs_out"] > 0
    assert "text" in curated.columns and "n_lines_removed" in curated.columns
    # the generated corpus plants exact/near dups -> shared token blocks
    # exist, so the corpus-wide line dedup must remove some lines
    assert res["lines_removed"] > 0
    report = {r["reason"] for r in spark.read.parquet(out + "_report").collect()}
    assert "ok" in report
