"""Physical-plan linter: scan registry queries for the operators that
kill plans at 100 TB. The per-query EXPECTATIONS audit
(scripts/plan_audit.py / tests/test_plans.py) pins KNOWN queries;
this is the generic sweep for anything new — the check a reviewer
runs before a query ships.

Severity model:
* ERROR — never acceptable in this repo: CartesianProduct, and
  row-at-a-time Python evaluation (BatchEvalPython; Arrow-batched
  plans are fine — the UDF surface is Arrow-only by design).
* WARN — acceptable only deliberately, so it must be visible:
  BroadcastNestedLoopJoin (fine for 1-row scalars / bounded literal
  frames, fatal for real tables) and a single-partition Exchange
  feeding a Window (fine over pre-aggregated frames, fatal over raw
  facts).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Finding:
    query: str
    severity: str  # "ERROR" | "WARN"
    rule: str
    detail: str


#: (substring, severity, rule, detail)
_RULES = [
    (
        "CartesianProduct",
        "ERROR",
        "cartesian-product",
        "unbounded all-pairs join — rewrite with an equi/bucketed key",
    ),
    (
        "BatchEvalPython",
        "ERROR",
        "row-python-udf",
        "row-at-a-time Python UDF — use built-ins or an Arrow kernel",
    ),
    (
        "BroadcastNestedLoopJoin",
        "WARN",
        "nested-loop-join",
        "acceptable only for 1-row scalars / bounded literal frames",
    ),
]


def _plan_string(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def lint_plan(name: str, df: DataFrame) -> list[Finding]:
    plan = _plan_string(df)
    out = [
        Finding(name, sev, rule, detail)
        for frag, sev, rule, detail in _RULES
        if frag in plan
    ]
    if "Exchange SinglePartition" in plan and "Window" in plan:
        out.append(
            Finding(
                name,
                "WARN",
                "global-window",
                "single-partition exchange feeding a Window — fine over a"
                " pre-aggregated frame, fatal over raw facts",
            )
        )
    return out


def lint_registry(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[Finding]:
    """Lint every (or the given) registry queries; returns findings
    sorted ERROR-first. Building the plan never executes the query."""
    from . import REGISTRY

    findings: list[Finding] = []
    for name in names or sorted(REGISTRY):
        try:
            findings.extend(lint_plan(name, REGISTRY[name].fn(spark, sf_dir)))
        except Exception as exc:  # surface broken plans as findings
            findings.append(
                Finding(name, "ERROR", "plan-build-failed", str(exc)[:200])
            )
    sev_rank = {"ERROR": 0, "WARN": 1}
    return sorted(findings, key=lambda f: (sev_rank[f.severity], f.query))
