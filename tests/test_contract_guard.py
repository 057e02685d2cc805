"""Cheap full-contract guards: every oracle must BIND in DuckDB and every
query must pass Spark analysis — catches SQL typos / schema drift across
all 51 entries in seconds, without waiting for the sf0.01 value sweep."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.conftest import TESTDATA  # noqa: E402

SF = os.path.join(TESTDATA, "sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF, "documents.parquet")),
    reason="driver testdata not present",
)


def test_registry_partition_is_exact():
    """Every registered query has EITHER an oracle OR an explicit
    NO_ORACLE allowlist membership — and nothing else exists. A query
    landing without an oracle, an oracle outliving its query, or an
    allowlisted name that is not a query all fail here, so intentional
    vs accidental correctness gaps are machine-distinguished (the r4
    `corpus_profile` sweep gap could not recur silently)."""
    from pcompress_spark.driver_queries import NO_ORACLE

    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert not (o & NO_ORACLE), sorted(o & NO_ORACLE)
    assert q == o | NO_ORACLE, {
        "query_without_oracle": sorted(q - o - NO_ORACLE),
        "oracle_without_query": sorted(o - q),
        "allowlisted_non_query": sorted(NO_ORACLE - q),
    }


def test_every_oracle_binds_in_duckdb():
    """EXPLAIN runs DuckDB's binder over zero-row views of the real
    schemas — any unknown column/function/CTE fails here, cheaply."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM '{SF}/{t}.parquet' WHERE false"
        )
    failures = []
    for name, sql in sorted(entrymod.oracle_sql().items()):
        try:
            con.execute("EXPLAIN " + sql)
        except Exception as exc:  # noqa: BLE001
            failures.append((name, str(exc)[:200]))
    assert not failures, failures


def test_every_query_passes_spark_analysis(spark):
    """Building each query's DataFrame triggers Catalyst analysis (and
    any constructive driver steps) — unknown columns or broken plans
    surface per-query without collecting results."""
    failures = []
    for name, fn in sorted(entrymod.queries().items()):
        try:
            df = fn(spark, SF)
            _ = df.schema
        except Exception as exc:  # noqa: BLE001
            failures.append((name, str(exc)[:200]))
    assert not failures, failures
