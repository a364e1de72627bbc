"""Incremental join-view maintenance (pipeline/ivm.py): the maintained
view must equal the full-recompute join after every class of source
change — fact insert/update/delete and dim update/delete — while
consuming only the CDFs.
"""

from __future__ import annotations

import pytest

from finanalyzer_spark.pipeline.ivm import (
    bootstrap_join_view,
    refresh_join_view,
    view_equals_full,
)
from finanalyzer_spark.pipeline.versioned import VersionedTable


@pytest.fixture()
def tables(spark, tmp_path):
    fact = VersionedTable(spark, str(tmp_path / "fact"))
    dim = VersionedTable(spark, str(tmp_path / "dim"))
    view = VersionedTable(spark, str(tmp_path / "view"))
    fact.commit(
        spark.createDataFrame(
            [(1, 10, 5.0), (2, 10, 7.0), (3, 20, 1.0)],
            "pk long, k long, amt double",
        )
    )
    dim.commit(
        spark.createDataFrame([(10, "a"), (20, "b")], "k long, name string")
    )
    bootstrap_join_view(fact, dim, view, "k")
    return fact, dim, view


def test_bootstrap_matches_full(spark, tables):
    fact, dim, view = tables
    assert view_equals_full(view, fact, dim, "k")


def test_fact_insert_update_delete(spark, tables):
    fact, dim, view = tables
    vf, vd = fact.current_version(), dim.current_version()
    # insert pk=4, update pk=1's amount AND fk, delete pk=3
    fact.merge(
        spark.createDataFrame(
            [(1, 20, 9.0), (4, 20, 2.0)], "pk long, k long, amt double"
        ),
        keys=["pk"],
    )
    fact.delete_where("pk = 3")
    refresh_join_view(fact, dim, view, "pk", "k", since_fact=vf, since_dim=vd)
    assert view_equals_full(view, fact, dim, "k")
    rows = {(r["pk"], r["name"]) for r in view.read().collect()}
    assert rows == {(1, "b"), (2, "a"), (4, "b")}


def test_dim_update_and_delete(spark, tables):
    fact, dim, view = tables
    vf, vd = fact.current_version(), dim.current_version()
    # rename dim 10, delete dim 20 (inner-join semantics: fact 3 leaves)
    dim.merge(
        spark.createDataFrame([(10, "A2")], "k long, name string"), keys=["k"]
    )
    dim.delete_where("k = 20")
    refresh_join_view(fact, dim, view, "pk", "k", since_fact=vf, since_dim=vd)
    assert view_equals_full(view, fact, dim, "k")
    rows = {(r["pk"], r["name"]) for r in view.read().collect()}
    assert rows == {(1, "A2"), (2, "A2")}


def test_mixed_changes_over_two_refreshes(spark, tables):
    fact, dim, view = tables
    vf, vd = fact.current_version(), dim.current_version()
    dim.merge(
        spark.createDataFrame([(30, "c")], "k long, name string"), keys=["k"]
    )
    fact.merge(
        spark.createDataFrame([(5, 30, 4.0)], "pk long, k long, amt double"),
        keys=["pk"],
    )
    refresh_join_view(fact, dim, view, "pk", "k", since_fact=vf, since_dim=vd)
    assert view_equals_full(view, fact, dim, "k")

    vf, vd = fact.current_version(), dim.current_version()
    fact.delete_where("k = 10")
    dim.merge(
        spark.createDataFrame([(30, "c3")], "k long, name string"), keys=["k"]
    )
    refresh_join_view(fact, dim, view, "pk", "k", since_fact=vf, since_dim=vd)
    assert view_equals_full(view, fact, dim, "k")
    rows = {(r["pk"], r["name"]) for r in view.read().collect()}
    assert rows == {(3, "b"), (5, "c3")}


def test_noop_refresh_is_stable(spark, tables):
    fact, dim, view = tables
    vf, vd = fact.current_version(), dim.current_version()
    before = {tuple(r) for r in view.read().collect()}
    refresh_join_view(fact, dim, view, "pk", "k", since_fact=vf, since_dim=vd)
    assert {tuple(r) for r in view.read().collect()} == before
