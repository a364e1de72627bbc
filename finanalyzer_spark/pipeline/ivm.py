"""Incremental maintenance of a JOIN view from change data feeds.

`pipeline/rollup.refresh_rollup` maintains an *aggregate* incrementally;
this module maintains a *join*: a materialized ``fact ⋈ dim`` view kept
current from the two source tables' CDFs (pipeline/versioned.changes)
without ever re-running the full join — the delta-join rule

    Δ(A ⋈ B) = ΔA ⋈ B' ∪ (A' ⋉ key(ΔB)) ⋈ B'

restricted to the touched keys. Assumes the fact has a primary key
(`fact_pk`) and joins each fact row to at most one dim row on
`join_key` (the FK-lookup shape — J1): the view is then keyed by
`fact_pk`, and maintenance is a keyed upsert/delete.

Cost model at 100 TB: the two CDF diffs are O(changed rows); the
touched-key recompute joins ONLY the affected fact rows (a semi-join
prune before the dim join); untouched view rows are carried over with
an anti-join. Nothing scales with the size of the full join output
except the final carried write — which a partitioned/Delta backend
turns into touched-partition rewrites (same seam as rollup.refresh's
dynamic partition overwrite; the local snapshot store rewrites the
view file, a storage-backend property, not an algorithm one).

Dim-side deletes use INNER-join semantics: fact rows whose dim row
disappeared leave the view (they reappear if the dim key returns).
"""

from __future__ import annotations

from .versioned import VersionedTable


def full_join_view(fact: VersionedTable, dim: VersionedTable, join_key: str):
    """The from-scratch view definition (used to bootstrap and, in
    tests, as the ground truth the incremental path must equal)."""
    return fact.read().join(dim.read(), join_key)


def refresh_join_view(
    fact: VersionedTable,
    dim: VersionedTable,
    view: VersionedTable,
    fact_pk: str,
    join_key: str,
    since_fact: int,
    since_dim: int,
) -> int:
    """Advance `view` to reflect `fact`/`dim` as of their current
    versions, consuming only changes after (`since_fact`, `since_dim`).
    Returns the committed view version.

    Caller tracks the consumed (fact, dim) versions — e.g. alongside
    the view's own txn pointer — and passes them back next refresh.
    """
    d_fact = fact.changes([fact_pk], from_version=since_fact)
    d_dim = dim.changes([join_key], from_version=since_dim)
    fact_new, dim_new = fact.read(), dim.read()

    touched_a = d_fact.select(fact_pk).distinct()
    touched_b = (
        fact_new.join(
            d_dim.select(join_key).distinct(), join_key, "left_semi"
        )
        .select(fact_pk)
        .distinct()
    )
    touched = touched_a.unionByName(touched_b).distinct()

    recomputed = fact_new.join(touched, fact_pk, "left_semi").join(
        dim_new, join_key
    )
    current = view.read()
    cols = current.columns  # pin schema order: joins reorder key columns
    carried = current.join(touched, fact_pk, "left_anti")
    return view.commit(
        carried.select(*cols).unionByName(recomputed.select(*cols))
    )


def bootstrap_join_view(
    fact: VersionedTable, dim: VersionedTable, view: VersionedTable, join_key: str
) -> int:
    """Initial materialization (version 1 of the view)."""
    df = full_join_view(fact, dim, join_key)
    # deterministic column order: join key first, then sorted payload
    cols = [join_key] + sorted(c for c in df.columns if c != join_key)
    return view.commit(df.select(*cols))


def view_equals_full(view: VersionedTable, fact, dim, join_key: str) -> bool:
    """Test helper: does the maintained view equal the full recompute?"""
    full = full_join_view(fact, dim, join_key)
    got = view.read().select(*full.columns)
    return (
        got.exceptAll(full).isEmpty()
        and full.exceptAll(got).isEmpty()
    )


# --------------------------------------------------------------------------
# Aggregate-view maintenance by CDF delta application — the OTHER
# classic IVM algorithm next to rollup.refresh_rollup's partition-pruned
# recompute: instead of recomputing touched partitions, apply signed
# deltas (+row for insert/update_postimage, -row for
# delete/update_preimage) directly to the materialized per-key
# (count, sum) stats. Handles updates ANYWHERE in history at O(changed
# rows) — the partition-pruned variant only wins when changes cluster
# in recent partitions. Restricted to self-maintainable aggregates
# (count/sum — min/max need the partition recompute on deletes).
# --------------------------------------------------------------------------


def full_agg_view(source: VersionedTable, group_key: str, value_col: str):
    """From-scratch view definition (bootstrap + test ground truth)."""
    from pyspark.sql import functions as F

    return (
        source.read()
        .groupBy(group_key)
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(value_col).alias("total"),
        )
    )


def bootstrap_agg_view(
    source: VersionedTable, view: VersionedTable, group_key: str, value_col: str
) -> int:
    return view.commit(full_agg_view(source, group_key, value_col))


def refresh_agg_view(
    source: VersionedTable,
    view: VersionedTable,
    pk: list[str],
    group_key: str,
    value_col: str,
    since: int,
) -> int:
    """Advance the materialized per-`group_key` (count, sum) aggregate
    to the source's current version by applying the CDF delta after
    version `since`. Keys whose count reaches zero leave the view.

    Scale shape: the delta aggregate is O(changed rows), map-side
    combined; the merge is ONE keyed outer join of the (small) delta
    stats against the view — at 100 TB on a Delta backend this is a
    keyed MERGE touching only changed-key files; nothing rescans the
    source. Exactness: with integer measures the incremental result
    equals the full recompute bit-for-bit (floats would drift by
    summation order — the test fixes integer cents).
    """
    from pyspark.sql import functions as F

    delta = source.changes(pk, from_version=since)
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    dagg = (
        delta.select(
            group_key,
            sign.alias("sign"),
            (sign * F.col(value_col)).alias("dv"),
        )
        .groupBy(group_key)
        .agg(F.sum("sign").alias("dn"), F.sum("dv").alias("ds"))
    )
    cur = view.read()
    merged = cur.join(dagg, group_key, "full").select(
        group_key,
        (F.coalesce("n_rows", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias(
            "n_rows"
        ),
        (F.coalesce("total", F.lit(0)) + F.coalesce("ds", F.lit(0))).alias(
            "total"
        ),
    )
    return view.commit(merged.where(F.col("n_rows") > 0))


def agg_view_equals_full(
    view: VersionedTable, source: VersionedTable, group_key: str, value_col: str
) -> bool:
    """Test helper: does the maintained aggregate equal the recompute?"""
    full = full_agg_view(source, group_key, value_col)
    got = view.read().select(*full.columns)
    return got.exceptAll(full).isEmpty() and full.exceptAll(got).isEmpty()


__all__ = [
    "agg_view_equals_full",
    "bootstrap_agg_view",
    "bootstrap_join_view",
    "full_agg_view",
    "full_join_view",
    "refresh_agg_view",
    "refresh_join_view",
    "view_equals_full",
]
