"""Graph-analytics queries — PageRank over the customer–supplier
bipartite trade graph (edges = distinct (customer, supplier) pairs
observed in orders⋈lineitem).

Companion to the connected-components dedup clustering
(operators/components.py): together they cover the two iterative-graph
shapes an analytics engine needs (label propagation to a fixpoint;
fixed-round power iteration). The DuckDB oracle unrolls the identical
iterations as chained CTEs with the same per-round rounding, so the
check is exact — not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.graph import DAMPING, ITER_ROUND, TELEPORT, pagerank_fixed
from .registry import query

_ITERS = 3
_OUT_ROUND = 9


def _pagerank_oracle(iters: int = _ITERS) -> str:
    prev = "pr0"
    steps = []
    for k in range(1, iters + 1):
        steps.append(
            f"""pr{k} AS (
        SELECT node, round({TELEPORT!r} / n + {DAMPING!r} * c, {ITER_ROUND}) AS pr
        FROM (
            SELECT s.dst AS node, sum(p.pr / d.deg) AS c
            FROM sym s
            JOIN deg d ON s.src = d.src
            JOIN {prev} p ON s.src = p.node
            GROUP BY s.dst
        ), nn
    )"""
        )
        prev = f"pr{k}"
    chained = ",\n    ".join(steps)
    return f"""
    WITH edges AS (
        SELECT DISTINCT 'c' || o.o_custkey AS src, 's' || l.l_suppkey AS dst
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    sym AS (
        SELECT src, dst FROM edges
        UNION ALL
        SELECT dst AS src, src AS dst FROM edges
    ),
    deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM sym),
    nn AS (SELECT count(*) AS n FROM nodes),
    pr0 AS (SELECT node, 1.0 / n AS pr FROM nodes, nn),
    {chained}
    SELECT node, round(pr, {_OUT_ROUND}) + 0.0 AS pr
    FROM {prev}
    """


@query(
    "pagerank_trade_graph",
    oracle=_pagerank_oracle(),
    tags=("graph", "iterative", "pagerank"),
)
def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 power iterations, damping 0.85) on the symmetrized
    customer–supplier graph — 'which counterparties sit at the center
    of the trade network'. Per-iteration shape: one (node, double) rank
    join onto the degree-annotated edge frame + one map-side-combined
    groupBy(dst); edges build once. Ranks round per iteration so the
    result is reproducible across engines and partitionings
    (operators/graph.py). Node ids are 'c<custkey>'/'s<suppkey>' —
    disjoint prefixes keep the bipartite id spaces from colliding."""
    t = load(spark, sf_dir)
    edges = (
        t.orders.join(
            t.lineitem, t.orders.o_orderkey == t.lineitem.l_orderkey
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    pr = pagerank_fixed(sym, iters=_ITERS)
    return pr.select("node", (F.round(F.col("pr"), _OUT_ROUND) + 0.0).alias("pr"))
