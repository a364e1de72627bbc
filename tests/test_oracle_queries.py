"""Every registered query cross-checked against its DuckDB oracle at
sf0.01 — the exact check the correctness driver runs (row count +
schema + order-insensitive value hash).
"""

from __future__ import annotations

import pytest

from finanalyzer_spark.plans import REGISTRY

from .conftest import SF_DIR_ORACLE
from .oracle import compare, duck_connection

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, SF_DIR_ORACLE).toPandas()
    duck_pdf = duck.sql(spec.oracle).df()
    assert len(spark_pdf) > 0, f"{name}: empty result (vacuous check)"
    ok, msg = compare(spark_pdf, duck_pdf)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_driver_protocol_shape():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) == len(REGISTRY)
