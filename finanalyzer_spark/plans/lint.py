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
  feeding a Window (entity-scale frames must use
  operators/rank.ordered_scan instead — the round-6 rewrite).
* INFO — acknowledged-bounded: queries tagged ``bounded-window`` in
  the registry declare their remaining global window runs over a
  frame bounded BY CONSTRUCTION (KS_BINS bins, 25 nations, 10
  deciles, 100 bootstrap replicas, a k-row fusion) — the finding
  stays visible but is not a scale defect.
"""

from __future__ import annotations

import io
import re
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


#: tree-section line: indentation + optional codegen star + "Name (id)".
#: The name may be multi-word ("Scan ExistingRDD") — captured whole so
#: every tree line parses and the chain walks below never silently
#: skip a node (a skipped node would corrupt adjacency).
_TREE_NODE = re.compile(r"^[\s:+|-]*\*?\s*([A-Za-z][\w .$#]*?)\s*\((\d+)\)\s*$")


def _tree_nodes(plan: str) -> list[tuple[str, int]]:
    """(operator, node_id) in tree order from `explain('formatted')`.

    The tree section ends at the first blank line; unary chains (the
    only kind Window/Sort/Project form) appear as consecutive lines,
    so 'next tree line' IS the child for the walks below.  Any node
    whose name is not in the passthrough set BREAKS a walk — unknown
    operators are conservative chain enders, never skipped.
    """
    nodes = []
    for line in plan.splitlines():
        if nodes and not line.strip():
            break
        m = _TREE_NODE.match(line)
        if m:
            nodes.append((m.group(1), int(m.group(2))))
    return nodes


def _node_details(plan: str) -> dict[int, str]:
    """node_id → its details block (the '(id) Name\\n...' paragraphs)."""
    out: dict[int, str] = {}
    for block in plan.split("\n\n"):
        m = re.match(r"\((\d+)\) [A-Za-z]", block.strip())
        if m:
            out[int(m.group(1))] = block
    return out


#: unary operators a Window's input may pass through before the
#: exchange that determines its partitioning
_WINDOW_PASSTHROUGH = frozenset(
    {"Sort", "Project", "Window", "WindowGroupLimit", "Filter",
     "AQEShuffleRead", "ShuffleQueryStage"}
)


def global_window_ids(plan: str) -> list[int]:
    """Window node ids fed (through sorts/projects) by a
    SinglePartition exchange — the 'whole frame in one task' shape.
    Formatted mode renders exchange arguments on their own line, so a
    flat `'Exchange SinglePartition' in plan` check can never fire
    (ADVICE r5 found the same vacuity in the audit's 'Sort [' guard);
    this walks the tree structurally instead."""
    nodes = _tree_nodes(plan)
    details = _node_details(plan)
    flagged = []
    for i, (op, nid) in enumerate(nodes):
        if op != "Window":
            continue
        j = i + 1
        while j < len(nodes) and nodes[j][0] in _WINDOW_PASSTHROUGH:
            j += 1
        if j < len(nodes) and nodes[j][0] == "Exchange":
            if "SinglePartition" in details.get(nodes[j][1], ""):
                flagged.append(nid)
    return flagged


def global_sort_ids(plan: str) -> list[int]:
    """Sort node ids with global=true (an all-data range sort —
    `df.orderBy` without a bounding limit). Detected from the details
    block: `(n) Sort ... Arguments: [...], true, 0`; window-local
    sorts carry `false`."""
    out = []
    for nid, block in _node_details(plan).items():
        if re.match(r"\(\d+\) Sort\b", block.strip()) and re.search(
            r"Arguments: .*\], true, \d+", block
        ):
            out.append(nid)
    return out


def lint_plan(
    name: str, df: DataFrame, bounded_window_ok: bool = False
) -> list[Finding]:
    plan = _plan_string(df)
    out = [
        Finding(name, sev, rule, detail)
        for frag, sev, rule, detail in _RULES
        if frag in plan
    ]
    gw = global_window_ids(plan)
    if gw and bounded_window_ok:
        out.append(
            Finding(
                name,
                "INFO",
                "bounded-global-window",
                f"global Window node(s) {gw} over a frame bounded by"
                " construction (registry tag 'bounded-window')",
            )
        )
    elif gw:
        out.append(
            Finding(
                name,
                "WARN",
                "global-window",
                f"single-partition exchange feeding Window node(s) {gw}"
                " — entity-scale rank/cumsum must use"
                " operators/rank.ordered_scan; if the frame is bounded"
                " by construction, tag the query 'bounded-window'",
            )
        )
    return out


def lint_registry(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[Finding]:
    """Lint every (or the given) registry queries; returns findings
    sorted ERROR-first. Building a plan is lazy for most queries;
    the ordered_scan-backed ones (operators/rank.py) run their
    bounded checkpoint+offsets job eagerly at build time."""
    from . import REGISTRY

    findings: list[Finding] = []
    for name in names or sorted(REGISTRY):
        try:
            findings.extend(
                lint_plan(
                    name,
                    REGISTRY[name].fn(spark, sf_dir),
                    bounded_window_ok="bounded-window"
                    in REGISTRY[name].tags,
                )
            )
        except Exception as exc:  # surface broken plans as findings
            findings.append(
                Finding(name, "ERROR", "plan-build-failed", str(exc)[:200])
            )
    sev_rank = {"ERROR": 0, "WARN": 1, "INFO": 2}
    return sorted(findings, key=lambda f: (sev_rank[f.severity], f.query))
