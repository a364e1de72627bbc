"""Data-contract gate (pipeline/gate.py): one-pass violation counting,
all-or-nothing enforcement in front of the merge seams, and row-level
quarantine splitting.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finanalyzer_spark.pipeline.gate import (
    DataContractViolation,
    enforce,
    in_domain,
    in_range,
    not_null,
    split_violations,
    unique_key,
    violation_counts,
)
from finanalyzer_spark.pipeline.versioned import VersionedTable

def _checks():
    # built lazily: Column construction needs an active SparkContext
    return [
        not_null("price"),
        in_range("price", 0.0, 1e6),
        in_domain("status", ["A", "B"]),
        unique_key("pk"),
    ]


def _df(spark, rows):
    return spark.createDataFrame(rows, "pk long, price double, status string")


def test_counts_per_check(spark):
    df = _df(
        spark,
        [
            (1, 10.0, "A"),
            (2, None, "B"),     # null price
            (3, -5.0, "A"),     # out of range
            (4, 10.0, "Z"),     # bad domain
            (4, 11.0, "A"),     # dup key
        ],
    )
    counts = violation_counts(df, _checks())
    assert counts == {
        "price_not_null": 1,
        "price_in_range": 1,
        "status_in_domain": 1,
        "unique_key:pk": 1,
    }


def test_enforce_blocks_merge_leaving_store_untouched(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.merge(_df(spark, [(1, 10.0, "A")]), keys=["pk"])
    v = t.current_version()

    bad = _df(spark, [(2, -1.0, "A")])
    with pytest.raises(DataContractViolation, match="price_in_range=1"):
        t.merge(enforce(bad, _checks()), keys=["pk"])
    assert t.current_version() == v
    assert {r["pk"] for r in t.read().collect()} == {1}

    good = _df(spark, [(2, 5.0, "B")])
    t.merge(enforce(good, _checks()), keys=["pk"])
    assert {r["pk"] for r in t.read().collect()} == {1, 2}


def test_split_violations_partitions_batch(spark):
    df = _df(
        spark,
        [(1, 10.0, "A"), (2, None, "B"), (3, 99.0, "Z"), (4, 1.0, "B")],
    )
    clean, quarantined = split_violations(df, _checks())
    assert {r["pk"] for r in clean.collect()} == {1, 4}
    assert {r["pk"] for r in quarantined.collect()} == {2, 3}
    # split is a partition: nothing lost, nothing duplicated
    assert clean.count() + quarantined.count() == df.count()


def test_null_predicate_rows_are_clean(spark):
    """A rule whose predicate evaluates to NULL (e.g. range check on a
    null value) must not quarantine the row — null-handling parity
    with SQL WHERE semantics."""
    df = _df(spark, [(1, None, "A")])
    clean, quarantined = split_violations(df, [in_range("price", 0, 10)])
    assert clean.count() == 1 and quarantined.count() == 0
