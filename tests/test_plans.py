"""Physical-plan regression guard — the scale-critical plan properties
(scripts/plan_audit.py EXPECTATIONS) must hold: pushdown reaches the
parquet scan, dimension joins broadcast, the ANN scale path never
degrades to a nested-loop join, scan-only queries stay shuffle-free.
"""

from __future__ import annotations

import pytest

from finanalyzer_spark.plans import REGISTRY

from .conftest import SF_DIR_ORACLE

import sys

sys.path.insert(0, ".")
from scripts.plan_audit import EXPECTATIONS, formatted_plan  # noqa: E402


@pytest.mark.parametrize("name", sorted(EXPECTATIONS))
def test_plan_properties(spark, name):
    from finanalyzer_spark.plans.lint import global_sort_ids, global_window_ids

    plan = formatted_plan(REGISTRY[name].fn(spark, SF_DIR_ORACLE))
    exp = EXPECTATIONS[name]
    for frag in exp["must"]:
        assert frag in plan, f"{name}: expected {frag!r} in physical plan"
    for frag in exp["must_not"]:
        assert frag not in plan, f"{name}: {frag!r} must not appear in plan"
    if exp.get("no_global_window"):
        bad = global_window_ids(plan)
        assert not bad, f"{name}: SinglePartition-fed Window nodes {bad}"
    if exp.get("no_global_sort"):
        bad = global_sort_ids(plan)
        assert not bad, f"{name}: global Sort nodes {bad}"
