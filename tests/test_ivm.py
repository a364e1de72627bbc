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


# --------------------------------------------------------------------------
# aggregate-view maintenance by CDF delta application
# --------------------------------------------------------------------------


@pytest.fixture()
def agg_tables(spark, tmp_path):
    from finanalyzer_spark.pipeline.ivm import bootstrap_agg_view

    src = VersionedTable(spark, str(tmp_path / "agg_src"))
    view = VersionedTable(spark, str(tmp_path / "agg_view"))
    # integer cents so incremental == recompute bit-for-bit
    src.commit(
        spark.createDataFrame(
            [(1, "x", 500), (2, "x", 700), (3, "y", 100), (4, "y", 250)],
            "pk long, grp string, cents long",
        )
    )
    bootstrap_agg_view(src, view, "grp", "cents")
    return src, view


def test_agg_bootstrap_matches_full(spark, agg_tables):
    from finanalyzer_spark.pipeline.ivm import agg_view_equals_full

    src, view = agg_tables
    assert agg_view_equals_full(view, src, "grp", "cents")


def test_agg_insert_update_delete_and_group_move(spark, agg_tables):
    from finanalyzer_spark.pipeline.ivm import (
        agg_view_equals_full,
        refresh_agg_view,
    )

    src, view = agg_tables
    since = src.current_version()
    # insert pk=5 into y; update pk=2's amount; MOVE pk=3 from y to z;
    # delete pk=4
    src.merge(
        spark.createDataFrame(
            [(5, "y", 40), (2, "x", 900), (3, "z", 100)],
            "pk long, grp string, cents long",
        ),
        keys=["pk"],
    )
    src.delete_where("pk = 4")
    refresh_agg_view(src, view, ["pk"], "grp", "cents", since=since)
    assert agg_view_equals_full(view, src, "grp", "cents")
    rows = {
        (r["grp"], r["n_rows"], r["total"]) for r in view.read().collect()
    }
    assert rows == {("x", 2, 1400), ("y", 1, 40), ("z", 1, 100)}


def test_agg_group_vanishes_at_zero_count(spark, agg_tables):
    from finanalyzer_spark.pipeline.ivm import (
        agg_view_equals_full,
        refresh_agg_view,
    )

    src, view = agg_tables
    since = src.current_version()
    src.delete_where("grp = 'y'")
    refresh_agg_view(src, view, ["pk"], "grp", "cents", since=since)
    assert agg_view_equals_full(view, src, "grp", "cents")
    assert {r["grp"] for r in view.read().collect()} == {"x"}


def test_agg_refresh_is_cumulative_across_rounds(spark, agg_tables):
    from finanalyzer_spark.pipeline.ivm import (
        agg_view_equals_full,
        refresh_agg_view,
    )

    src, view = agg_tables
    for batch in (
        [(6, "x", 11)],
        [(7, "z", 22), (6, "x", 33)],  # second round also updates pk=6
    ):
        since = src.current_version()
        src.merge(
            spark.createDataFrame(batch, "pk long, grp string, cents long"),
            keys=["pk"],
        )
        refresh_agg_view(src, view, ["pk"], "grp", "cents", since=since)
        assert agg_view_equals_full(view, src, "grp", "cents")
