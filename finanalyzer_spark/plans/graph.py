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

from .artifacts import materialized, source_fingerprint
from ..catalog import load
from ..operators.graph import (
    DAMPING,
    bfs_hops,
    ITER_ROUND,
    TELEPORT,
    count_triangles,
    hits_fixed,
    pagerank_fixed,
)
from .registry import query

_ITERS = 3
_OUT_ROUND = 9

#: Cap on distinct suppliers per customer in the co-supply pair build.
#: The cs ⋈ cs self-join emits C(k,2) pair rows for a customer with k
#: suppliers — quadratic in k, so one power-law mega-customer could
#: dominate the whole stage at 100 TB. Customers above the cap are
#: dropped outright (they contribute near-clique noise, the same
#: degenerate-bucket economics as the dedup family's BUCKET_CAP); the
#: cap is shared verbatim by every DuckDB oracle so the twins stay
#: exact. Never binds on the TPC-H fixtures (max distinct suppliers
#: per customer is in the tens at every test SF).
_COSUPPLY_CAP = 500

#: Shared oracle CTE fragment: capped co-supply pair counts. Twins
#: _cosupply_pairs below — keep the two in lockstep.
_COSUPPLY_CTE = f"""cs0 AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    hot AS (SELECT c FROM cs0 GROUP BY c HAVING count(*) > {_COSUPPLY_CAP}),
    cs AS MATERIALIZED (
        SELECT c, s FROM cs0 WHERE c NOT IN (SELECT c FROM hot)),
    p AS MATERIALIZED (
        SELECT a.s AS u, b.s AS v, count(*) AS shared
        FROM cs a JOIN cs b ON a.c = b.c AND a.s < b.s GROUP BY 1, 2)"""


def _cosupply_pairs(t) -> DataFrame:
    """Capped co-supply pair frame: (u, v, shared) with u < v, shared =
    number of distinct customers supplier u and v both serve.

    Scale shape: one distinct on (customer, supplier), one keyed count
    to find over-cap customers (a tiny frame by construction —
    broadcast), a broadcast LEFT ANTI to drop them, then the customer-
    keyed self-join with a map-side-combined pair count. The anti-join
    bounds the self-join's per-key expansion at C(cap, 2) regardless of
    degree skew. (A collect_set + combination-explode variant was
    measured SLOWER here — same C(k,2) rows, heavier per-row work.)

    The distinct (c, s) frame is persisted: it feeds the hot-key
    count, the anti-join, and BOTH sides of the self-join, and Spark's
    ReuseExchange does not fire across those subtrees — without the
    persist the orders⋈lineitem join + distinct executes four times
    (measured: the whole build drops ~2x at sf0.1 with it)."""
    cs = (
        t.orders.join(
            t.lineitem.select("l_orderkey", "l_suppkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .persist()
    )
    hot = (
        cs.groupBy("c")
        .agg(F.count("*").alias("k"))
        .where(F.col("k") > _COSUPPLY_CAP)
        .select("c")
    )
    cs = cs.join(F.broadcast(hot), "c", "left_anti")
    a = cs.select("c", F.col("s").alias("u"))
    b = cs.select("c", F.col("s").alias("v"))
    return (
        a.join(b, "c")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("shared"))
    )


def _cosupply_threshold_edges(pairs: DataFrame, factor: float) -> DataFrame:
    """Edges of the co-supply graph: pairs whose shared-customer count
    beats factor x the mean pair overlap (scalar broadcast filter)."""
    thr = pairs.agg((F.lit(factor) * F.avg("shared")).alias("t"))
    return (
        pairs.crossJoin(F.broadcast(thr))
        .where(F.col("shared") > F.col("t"))
        .select("u", "v")
    )


#: Bump when the _cosupply_pairs build logic changes — invalidates the
#: on-disk artifact (the path carries the version).
_PAIRS_ART_VERSION = 1


def _cosupply_pairs_shared(spark: SparkSession, t, sf_dir: str) -> DataFrame:
    """Written-once co-supply pair artifact (VERDICT r11 #4): the five
    heaviest graph queries each re-derived the orders⋈lineitem pair
    build per invocation (~3-4 s apiece at sf0.1 — the whole family
    paid it five times per suite). A session-scoped persist does not
    survive the bench harness's clearCache-between-queries discipline,
    so the build is materialized ONCE per (source-data fingerprint,
    cap) through the plans.artifacts seam and every graph query scans
    it thereafter. The DuckDB oracles keep recomputing pairs from the
    raw tables (``_COSUPPLY_CTE``), so the parity gate would catch any
    artifact/build divergence — the twins stay exact.

    Measured at sf0.1: the ten-query co-supply family drops 68.8 s →
    44.9 s warm (cold adds one ~4 s build)."""
    key = (
        f"cosupply_pairs_v{_PAIRS_ART_VERSION}_cap{_COSUPPLY_CAP}"
        f"_{source_fingerprint(sf_dir, ('orders', 'lineitem'))}"
    )
    return materialized(spark, key, lambda: _cosupply_pairs(t))


def _trade_edges_shared(spark: SparkSession, t, sf_dir: str) -> DataFrame:
    """Written-once bipartite trade edge artifact: the distinct
    ('c<custkey>', 's<suppkey>') frame pagerank/HITS/BFS each derived
    per invocation via the same orders⋈lineitem + distinct. Same seam
    and same oracle-recomputes-from-raw safety as the co-supply pair
    artifact above."""
    def build() -> DataFrame:
        return (
            t.orders.join(
                t.lineitem.select("l_orderkey", "l_suppkey"),
                t.orders.o_orderkey == F.col("l_orderkey"),
            )
            .select(
                F.concat(F.lit("c"),
                         F.col("o_custkey").cast("string")).alias("src"),
                F.concat(F.lit("s"),
                         F.col("l_suppkey").cast("string")).alias("dst"),
            )
            .distinct()
        )

    key = (
        "trade_edges_v1_"
        f"{source_fingerprint(sf_dir, ('orders', 'lineitem'))}"
    )
    return materialized(spark, key, build)


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
    edges = _trade_edges_shared(spark, t, sf_dir)
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    pr = pagerank_fixed(sym, iters=_ITERS)
    return pr.select("node", (F.round(F.col("pr"), _OUT_ROUND) + 0.0).alias("pr"))


_TRI_FACTOR = 1.2  # edge threshold: shared customers > factor * mean


@query(
    "triangle_count_cosupply",
    # Ground-truth oracle: canonical a<b<c three-way self-join — no
    # orientation trick, so a green hash proves the oriented wedge
    # join counts every triangle exactly once. The edge threshold is a
    # scalar (mean shared-customer count) both engines derive from the
    # same exact integer pair counts.
    oracle=f"""
    WITH {_COSUPPLY_CTE},
    thr AS (SELECT {_TRI_FACTOR} * avg(shared) AS t FROM p),
    e AS (SELECT u, v FROM p, thr WHERE shared > t),
    nodes AS (
        SELECT count(DISTINCT x) AS n FROM
            (SELECT u AS x FROM e UNION SELECT v FROM e)
    )
    SELECT (SELECT n FROM nodes) AS n_nodes,
           (SELECT count(*) FROM e) AS n_edges,
           (SELECT count(*) FROM e e1
            JOIN e e2 ON e2.u = e1.v
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles
    """,
    tags=("graph", "triangles"),
)
def triangle_count_cosupply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the supplier co-supply graph (suppliers
    linked when they share more customers than {factor}x the mean pair
    overlap). Spark counts via degree-ordered orientation
    (operators/graph.count_triangles): wedge generation is bounded by
    O(m^1.5) regardless of degree skew — the formulation that survives
    a power-law graph at 100 TB, where a naive neighborhood join
    explodes on hub nodes. The oracle counts the same triangles with
    the canonical a<b<c three-way join."""
    t = load(spark, sf_dir)
    # both the threshold scalar and the edge filter read the expensive
    # pair projection — persist it
    pairs = _cosupply_pairs_shared(spark, t, sf_dir)
    edges = _cosupply_threshold_edges(pairs, _TRI_FACTOR).persist()
    n_nodes = (
        edges.select(F.col("u").alias("x"))
        .union(edges.select(F.col("v").alias("x")))
        .distinct()
        .agg(F.count("*").alias("n_nodes"))
    )
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    tri = count_triangles(edges)
    return n_nodes.crossJoin(F.broadcast(n_edges)).crossJoin(F.broadcast(tri))


# --------------------------------------------------------------------------
# k-core of the co-supply graph (iterated peel vs recursive-CTE oracle)
# --------------------------------------------------------------------------
#: edge threshold / core order for kcore_cosupply — 1.1x mean keeps a
#: graph sparse enough that the k=3 peel actually cascades several
#: rounds on the fixtures (1.2x, the triangle threshold, peels to
#: empty at every fixture SF — a degenerate check)
_CORE_FACTOR = 1.1
_CORE_K = 3


@query(
    "kcore_cosupply",
    # Ground-truth oracle: the peel as a RECURSIVE CTE. Iteration-
    # tagged rows (UNION ALL keeps the working table = the previous
    # round's survivors), a fixpoint guard that stops recursion when
    # nothing was dropped, and a final re-filter of the max-iteration
    # set (handles the peel-to-empty case, where the last emitted
    # round still contains sub-k nodes). The edge pipeline is
    # MATERIALIZED and every per-round degree count is a hash
    # join+GROUP BY, never a correlated subquery — the correlated form
    # re-evaluated the whole pair-join pipeline per node per round and
    # ran DuckDB out of memory one SF up from the gate (sf0.1 sweep).
    oracle=f"""
    WITH RECURSIVE
    {_COSUPPLY_CTE},
    thr AS (SELECT {_CORE_FACTOR} * avg(shared) AS t FROM p),
    und AS MATERIALIZED (SELECT u, v FROM p, thr WHERE shared > t),
    e AS MATERIALIZED (
        SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
    nodes AS (SELECT DISTINCT u AS node FROM e),
    peel(iter, node) AS (
        SELECT 0, node FROM nodes
        UNION ALL
        SELECT s.iter + 1, s.node
        FROM (
            SELECT a.iter AS iter, e.u AS node
            FROM e
            JOIN peel a ON a.node = e.u
            JOIN peel b ON b.node = e.v
            GROUP BY a.iter, e.u
            HAVING count(*) >= {_CORE_K}
        ) s
        WHERE (SELECT count(*) FROM peel) > (
            SELECT count(*)
            FROM (
                SELECT e.u
                FROM e
                JOIN peel a ON a.node = e.u
                JOIN peel b ON b.node = e.v
                GROUP BY e.u
                HAVING count(*) >= {_CORE_K}
            )
        )
    ),
    last AS MATERIALIZED (
        SELECT node FROM peel
        WHERE iter = (SELECT max(iter) FROM peel)),
    core_deg AS (
        SELECT e.u AS node, count(*) AS core_deg
        FROM e
        JOIN last a ON a.node = e.u
        JOIN last b ON b.node = e.v
        GROUP BY e.u
        HAVING count(*) >= {_CORE_K}
    )
    SELECT node, core_deg FROM core_deg
    """,
    tags=("graph", "iterative", "kcore"),
)
def kcore_cosupply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the supplier co-supply graph (suppliers linked when
    they share more customers than 1.1x the mean pair overlap):
    the maximal subgraph where every supplier co-supplies with >= k
    core peers — the dense trading cluster a risk analyst watches.
    Returns (node, core_deg), core_deg = degree within the core.

    Spark side is operators/graph.kcore: iterated peeling with one
    degree aggregate + two semi-joins per round, localCheckpoint
    lineage truncation, and a single scalar count per round as the
    convergence probe (dedup=False — the u<v distinct pair frame plus
    its reversal cannot contain duplicates, so the guard shuffle is
    skipped). The oracle reproduces the peel as a DuckDB recursive CTE
    — genuinely SQL-expressible, so this iterative operator gets a
    full value-hash check, not rows-only."""
    from ..operators.graph import kcore

    t = load(spark, sf_dir)
    pairs = _cosupply_pairs_shared(spark, t, sf_dir)
    edges = _cosupply_threshold_edges(pairs, _CORE_FACTOR)
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    core = kcore(sym, _CORE_K, src="u", dst="v", dedup=False)
    in_core = sym.join(
        F.broadcast(core.withColumnRenamed("node", "u")), "u", "left_semi"
    ).join(F.broadcast(core.withColumnRenamed("node", "v")), "v", "left_semi")
    return in_core.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("core_deg")
    )


def _hits_oracle(iters: int = 2) -> str:
    """Chained-CTE unroll of operators/graph.hits_fixed — identical
    per-step L1 normalization and rounding, so the check is exact."""
    steps = []
    prev_h = "h0"
    for k in range(1, iters + 1):
        steps.append(
            f"""a{k}r AS (
        SELECT e.dst AS node, sum(h.score) AS s
        FROM edges e JOIN {prev_h} h ON e.src = h.node GROUP BY e.dst
    ),
    a{k}n AS (SELECT sum(s) AS tot FROM a{k}r),
    a{k} AS (SELECT node, round(s / tot, {ITER_ROUND}) AS score
             FROM a{k}r, a{k}n),
    h{k}r AS (
        SELECT e.src AS node, sum(a.score) AS s
        FROM edges e JOIN a{k} a ON e.dst = a.node GROUP BY e.src
    ),
    h{k}n AS (SELECT sum(s) AS tot FROM h{k}r),
    h{k} AS (SELECT node, round(s / tot, {ITER_ROUND}) AS score
             FROM h{k}r, h{k}n)"""
        )
        prev_h = f"h{k}"
    chained = ",\n    ".join(steps)
    return f"""
    WITH edges AS (
        SELECT DISTINCT 'c' || o.o_custkey AS src, 's' || l.l_suppkey AS dst
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    h0 AS (SELECT DISTINCT src AS node, 1.0 AS score FROM edges),
    {chained}
    SELECT node, 'hub' AS kind, round(score, {_OUT_ROUND}) + 0.0 AS score
    FROM h{iters}
    UNION ALL
    SELECT node, 'authority' AS kind,
           round(score, {_OUT_ROUND}) + 0.0 AS score
    FROM a{iters}
    """


@query(
    "hits_trade_graph",
    oracle=_hits_oracle(),
    tags=("graph", "iterative", "hits"),
)
def hits_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities (2 rounds, L1-normalized) on the DIRECTED
    customer→supplier purchase graph — 'which buyers concentrate
    purchasing power (hubs) and which suppliers attract it
    (authorities)'.  The complement to PageRank's undirected
    centrality: HITS keeps the bipartite direction, so the two score
    families answer different questions and the oracle's chained-CTE
    unroll pins both.

    Scale shape: per round two equi-joins + two map-side-combined
    groupBys over the persisted edge frame; L1 norms are 1-row
    broadcasts (operators/graph.hits_fixed). Same skeleton that holds
    pagerank at fact-table edge counts — no windows, no sorts."""
    t = load(spark, sf_dir)
    edges = _trade_edges_shared(spark, t, sf_dir)
    hubs, auth = hits_fixed(edges, iters=2)
    out = hubs.select(
        "node",
        F.lit("hub").alias("kind"),
        (F.round(F.col("score"), _OUT_ROUND) + 0.0).alias("score"),
    ).unionByName(
        auth.select(
            "node",
            F.lit("authority").alias("kind"),
            (F.round(F.col("score"), _OUT_ROUND) + 0.0).alias("score"),
        )
    )
    return out


_BFS_SOURCE = "s1"
_BFS_MAX_HOPS = 6


@query(
    "bfs_hops_trade_graph",
    oracle=f"""
    WITH RECURSIVE edges AS (
        SELECT DISTINCT 'c' || o.o_custkey AS src, 's' || l.l_suppkey AS dst
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    sym AS (
        SELECT src, dst FROM edges
        UNION ALL
        SELECT dst AS src, src AS dst FROM edges
    ),
    walk(node, hop) AS (
        SELECT '{_BFS_SOURCE}', 0
        UNION
        SELECT s.dst, w.hop + 1
        FROM walk w JOIN sym s ON s.src = w.node
        WHERE w.hop < {_BFS_MAX_HOPS}
    ),
    dist AS (SELECT node, min(hop) AS hop FROM walk GROUP BY node)
    SELECT CAST(hop AS INT) AS hop, CAST(count(*) AS BIGINT) AS n_nodes
    FROM dist GROUP BY hop
    """,
    tags=("graph", "iterative", "bfs"),
)
def bfs_hops_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS hop histogram over the symmetrized
    customer–supplier trade graph: how many counterparties are 1, 2,
    3... hops from supplier s1 — the reachability profile that prices
    blast radius (a recalled part, a sanctioned entity) on a business
    graph. Completes the iterative-graph family next to PageRank
    (fixed-round power iteration), label propagation (components),
    peeling (k-core) and HITS: frontier expansion with min-hop
    semantics.

    Scale shape: operators/graph.bfs_hops — per hop, one hash join of
    the (localCheckpoint-ed) frontier against the edge frame and one
    anti-join against the visited set; the frontier drains by a
    1-scalar count per round. The DuckDB twin is a recursive CTE whose
    UNION dedups (node, hop) pairs, with min(hop) collapsing to the
    identical BFS distances — full value-hash parity for an iterative
    operator."""
    t = load(spark, sf_dir)
    edges = _trade_edges_shared(spark, t, sf_dir)
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    dist = bfs_hops(sym, _BFS_SOURCE, _BFS_MAX_HOPS)
    return dist.groupBy("hop").agg(F.count("*").alias("n_nodes")).select(
        F.col("hop").cast("int").alias("hop"),
        F.col("n_nodes").cast("long").alias("n_nodes"),
    )


_LPA_ITERS = 3


def _lpa_oracle(iters: int = _LPA_ITERS) -> str:
    """Chained-CTE unroll of operators/graph.label_propagation_fixed —
    identical per-round argmax-with-min-tie selection on exact integer
    counts, so the check is exact.  The edge pipeline is MATERIALIZED
    (the kcore_cosupply oracle lesson: correlated re-evaluation of the
    pair join runs DuckDB out of memory one SF up from the gate)."""
    steps = [
        "l0 AS (SELECT DISTINCT u AS node, u AS lab FROM e)",
    ]
    for k in range(1, iters + 1):
        steps.append(
            f"c{k} AS (SELECT e.u AS node, l.lab, count(*) AS c "
            f"FROM e JOIN l{k - 1} l ON l.node = e.v GROUP BY 1, 2)"
        )
        steps.append(
            f"m{k} AS (SELECT node, max(c) AS mc FROM c{k} GROUP BY node)"
        )
        steps.append(
            f"l{k} AS (SELECT c{k}.node, min(c{k}.lab) AS lab "
            f"FROM c{k} JOIN m{k} ON c{k}.node = m{k}.node "
            f"AND c{k}.c = m{k}.mc GROUP BY c{k}.node)"
        )
    chain = ",\n    ".join(steps)
    return f"""
    WITH {_COSUPPLY_CTE},
    thr AS (SELECT {_CORE_FACTOR} * avg(shared) AS t FROM p),
    und AS MATERIALIZED (SELECT u, v FROM p, thr WHERE shared > t),
    e AS MATERIALIZED (
        SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
    {chain}
    SELECT lab AS community, count(*) AS n_members
    FROM l{iters}
    GROUP BY lab
    """


@query(
    "label_propagation_communities",
    oracle=_lpa_oracle(),
    tags=("graph", "iterative", "community"),
)
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the supplier co-supply graph (the
    kcore/triangle edge set: suppliers linked when their shared-
    customer count beats 1.1x the mean pair overlap) by synchronous
    label propagation — 3 fixed rounds, ties to the smallest label, so
    the partition is a pure function of the edge set and the DuckDB
    twin can replay it exactly (chained-CTE unroll).  Returns
    (community, n_members): the trading blocs a risk analyst monitors,
    parameter-free (no k to choose, unlike k-means).

    Scale shape: operators/graph.label_propagation_fixed — per round
    two map-side-combined groupBys + one node-keyed hash join, edge
    frame persisted once, loop frames localCheckpointed; no windows,
    no driver-side state.  At 1000 executors each round is a pair of
    node-id shuffles, the same cost profile as one pagerank step."""
    from ..operators.graph import label_propagation_fixed

    t = load(spark, sf_dir)
    pairs = _cosupply_pairs_shared(spark, t, sf_dir)
    edges = _cosupply_threshold_edges(pairs, _CORE_FACTOR)
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    labels = label_propagation_fixed(sym, _LPA_ITERS, src="u", dst="v")
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count("*").alias("n_members")
    )


@query(
    "degree_assortativity",
    # Pearson over edge-endpoint degree pairs on the symmetrized edge
    # list (Newman 2002 eq. 4 in its correlation form) — degrees and
    # all moments are exact integers (DECIMAL(38,0) products), one
    # rounded float at the end.
    oracle=f"""
    WITH {_COSUPPLY_CTE},
    thr AS (SELECT {_CORE_FACTOR} * avg(shared) AS t FROM p),
    und AS MATERIALIZED (SELECT u, v FROM p, thr WHERE shared > t),
    e AS MATERIALIZED (
        SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
    deg AS (SELECT u AS node, count(*) AS d FROM e GROUP BY u),
    pairs AS (
        SELECT du.d AS x, dv.d AS y
        FROM e
        JOIN deg du ON du.node = e.u
        JOIN deg dv ON dv.node = e.v
    ),
    mo AS (
        SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
               sum(CAST(x AS DECIMAL(38,0))) AS sx,
               sum(CAST(y AS DECIMAL(38,0))) AS sy,
               sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS sxx,
               sum(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS syy,
               sum(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS sxy
        FROM pairs
    )
    SELECT CAST(coalesce(n, 0) AS BIGINT) AS n_edge_ends,
           CASE WHEN coalesce(n, 0) = 0
                     OR CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0.0
                     OR CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) = 0.0
                THEN 0.0  -- empty or degree-regular graph
                ELSE round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 6) + 0.0
           END AS assortativity
    FROM mo
    """,
    tags=("graph", "stats"),
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of the supplier
    co-supply graph: the Pearson correlation of the degrees at the two
    ends of every edge — positive means hubs trade with hubs (the
    resilience/contagion question a risk analyst asks of a trading
    network), negative means hub-and-spoke.

    Scale shape: one degree groupBy, two node-keyed joins to attach
    endpoint degrees (broadcast — the degree frame is node-sized),
    exact DECIMAL(38,0) Pearson moments, one rounded float.  No
    windows, no iteration."""
    t = load(spark, sf_dir)
    pairs = _cosupply_pairs_shared(spark, t, sf_dir)
    edges = _cosupply_threshold_edges(pairs, _CORE_FACTOR)
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("d")
    )
    ep = (
        sym.join(F.broadcast(deg.withColumnRenamed("node", "u")
                             .withColumnRenamed("d", "x")), "u")
        .join(F.broadcast(deg.withColumnRenamed("node", "v")
                          .withColumnRenamed("d", "y")), "v")
        .select("x", "y")
    )
    dec = "decimal(38,0)"
    mo = ep.agg(
        F.expr("CAST(count(*) AS DECIMAL(38,0))").alias("n"),
        F.expr("sum(CAST(x AS DECIMAL(38,0)))").alias("sx"),
        F.expr("sum(CAST(y AS DECIMAL(38,0)))").alias("sy"),
        F.expr("sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))").alias("sxx"),
        F.expr("sum(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))").alias("syy"),
        F.expr("sum(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))").alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    varx = d("n") * d("sxx") - d("sx") * d("sx")
    vary = d("n") * d("syy") - d("sy") * d("sy")
    return mo.select(
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_edge_ends"),
        F.when(
            F.coalesce(F.col("n"), F.lit(0)) == 0, F.lit(0.0)
        )
        .when((varx == 0.0) | (vary == 0.0), F.lit(0.0))
        .otherwise(
            F.round(
                (d("n") * d("sxy") - d("sx") * d("sy"))
                / F.sqrt(varx * vary),
                6,
            )
            + 0.0
        )
        .alias("assortativity"),
    )


@query(
    "local_clustering_coefficient",
    # ground truth: canonical a<b<c three-way edge join enumerates
    # every triangle once; unnesting the corner list credits all three
    # nodes, and the coefficient is one division over exact integers
    # (2*t / d*(d-1)), rounded once.
    oracle=f"""
    WITH {_COSUPPLY_CTE},
    thr AS (SELECT {_CORE_FACTOR} * avg(shared) AS t FROM p),
    und AS MATERIALIZED (SELECT u, v FROM p, thr WHERE shared > t),
    e AS MATERIALIZED (
        SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
    deg AS (SELECT u AS node, count(*) AS d FROM e GROUP BY u),
    tri AS (
        SELECT unnest([e1.u, e1.v, e2.v]) AS node
        FROM und e1
        JOIN und e2 ON e2.u = e1.v
        JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    tcnt AS (SELECT node, count(*) AS n_tri FROM tri GROUP BY node)
    SELECT d.node,
           d.d AS degree,
           coalesce(t.n_tri, 0)::BIGINT AS n_triangles,
           round(2.0 * coalesce(t.n_tri, 0) / (d.d * (d.d - 1)), 6)
               + 0.0 AS clustering_coeff
    FROM deg d LEFT JOIN tcnt t ON d.node = t.node
    WHERE d.d >= 2
    """,
    tags=("graph", "triangles", "stats"),
)
def local_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient of the co-supply graph
    (Watts-Strogatz): the share of a supplier's co-supplier pairs that
    also co-supply with each other — 2*triangles/(d*(d-1)) — the
    standard 'how clique-ish is this node's neighborhood' measure a
    risk analyst reads next to k-core membership.

    Scale shape: operators/graph.triangles_per_node (degree-ordered
    orientation, O(m^1.5) wedge bound, per-corner explode + node-keyed
    count) joined onto the degree frame; one division over exact
    integers, rounded once."""
    from ..operators.graph import triangles_per_node

    t = load(spark, sf_dir)
    pairs = _cosupply_pairs_shared(spark, t, sf_dir)
    edges = _cosupply_threshold_edges(pairs, _CORE_FACTOR).persist()
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("d")
    )
    tcnt = triangles_per_node(edges)
    return (
        deg.where(F.col("d") >= 2)
        .join(tcnt, "node", "left")
        .select(
            "node",
            F.col("d").alias("degree"),
            F.coalesce(F.col("n_tri"), F.lit(0))
            .cast("long").alias("n_triangles"),
            (
                F.round(
                    2.0 * F.coalesce(F.col("n_tri"), F.lit(0))
                    / (F.col("d") * (F.col("d") - 1)),
                    6,
                ) + 0.0
            ).alias("clustering_coeff"),
        )
    )


_LP_TOP = 20  #: link-prediction candidates reported


@query(
    "common_neighbor_link_prediction",
    # wedges through each node give candidate (v, w) pairs with their
    # common-neighbor count; existing edges anti-join away; Jaccard =
    # cn / (dv + dw - cn) is one division over exact integers. Top-20
    # under a total order (cn desc, jaccard desc implied by cn/deg,
    # then v, w) so the cut is deterministic in both engines.
    oracle=f"""
    WITH {_COSUPPLY_CTE},
    thr AS (SELECT {_CORE_FACTOR} * avg(shared) AS t FROM p),
    und AS MATERIALIZED (SELECT u, v FROM p, thr WHERE shared > t),
    e AS MATERIALIZED (
        SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
    deg AS (SELECT u AS node, count(*) AS d FROM e GROUP BY u),
    wedge AS (
        SELECT a.v AS x, b.v AS y
        FROM e a JOIN e b ON a.u = b.u AND a.v < b.v
    ),
    cn AS (SELECT x, y, count(*) AS n_common FROM wedge GROUP BY x, y),
    cand AS (
        SELECT c.x, c.y, c.n_common
        FROM cn c
        WHERE NOT EXISTS (
            SELECT 1 FROM und WHERE und.u = c.x AND und.v = c.y)
    )
    SELECT c.x AS u, c.y AS v, c.n_common,
           round(c.n_common * 1.0
                 / (dx.d + dy.d - c.n_common), 6) + 0.0 AS jaccard
    FROM cand c
    JOIN deg dx ON dx.node = c.x
    JOIN deg dy ON dy.node = c.y
    ORDER BY c.n_common DESC, jaccard DESC, c.x, c.y
    LIMIT {_LP_TOP}
    """,
    tags=("graph", "link-prediction"),
)
def common_neighbor_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the co-supply graph: the top {_LP_TOP}
    NON-adjacent supplier pairs by common-neighbor count (with the
    neighborhood-Jaccard tiebreak) — 'which two suppliers that don't
    yet co-supply are most likely to' (Liben-Nowell & Kleinberg's
    common-neighbors baseline, the score every production link
    predictor is benchmarked against).

    Scale shape: one wedge self-join on the shared-neighbor key (the
    same C(d,2)-per-node expansion as triangle counting — bounded
    upstream by the threshold + _COSUPPLY_CAP), a map-side-combined
    pair count, a broadcast anti-join against existing edges, two
    broadcast degree joins, and a TakeOrdered top-k (never a global
    sort). The score is exact integers; Jaccard is one rounded
    division."""
    t = load(spark, sf_dir)
    pairs = _cosupply_pairs_shared(spark, t, sf_dir)
    edges = _cosupply_threshold_edges(pairs, _CORE_FACTOR).persist()
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("d")
    )
    a = sym.select(F.col("u").alias("c"), F.col("v").alias("x"))
    b = sym.select(F.col("u").alias("c"), F.col("v").alias("y"))
    cn = (
        a.join(b, "c")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count("*").alias("n_common"))
    )
    cand = cn.join(
        edges,
        (cn.x == edges.u) & (cn.y == edges.v),
        "left_anti",
    )
    dx = F.broadcast(deg.withColumnRenamed("node", "x")
                     .withColumnRenamed("d", "dx"))
    dy = F.broadcast(deg.withColumnRenamed("node", "y")
                     .withColumnRenamed("d", "dy"))
    scored = (
        cand.join(dx, "x")
        .join(dy, "y")
        .select(
            F.col("x").alias("u"),
            F.col("y").alias("v"),
            "n_common",
            (
                F.round(
                    F.col("n_common")
                    / (F.col("dx") + F.col("dy") - F.col("n_common")),
                    6,
                ) + 0.0
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.col("n_common").desc(), F.col("jaccard").desc(), "u", "v"
    ).limit(_LP_TOP)


# --------------------------------------------------------------------------
# Adamic-Adar link prediction (round 9)
# --------------------------------------------------------------------------
@query(
    "adamic_adar_link_prediction",
    # same wedge expansion as common_neighbor_link_prediction, but each
    # wedge carries its hub's 1/ln(degree) weight QUANTIZED to integer
    # 1e-9 units before the per-pair sum (hub degree >= 2 whenever a
    # wedge exists, so ln(d) > 0), making the score — and therefore the
    # top-k cut — exact integer arithmetic on both engines.
    oracle=f"""
    WITH {_COSUPPLY_CTE},
    thr AS (SELECT {_CORE_FACTOR} * avg(shared) AS t FROM p),
    und AS MATERIALIZED (SELECT u, v FROM p, thr WHERE shared > t),
    e AS MATERIALIZED (
        SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
    deg AS (SELECT u AS node, count(*) AS d FROM e GROUP BY u),
    wedge AS (
        SELECT a.v AS x, b.v AS y,
               CAST(round(1e9 / ln(CAST(dh.d AS DOUBLE)), 0) AS BIGINT)
                   AS w_u
        FROM e a
        JOIN e b ON a.u = b.u AND a.v < b.v
        JOIN deg dh ON dh.node = a.u
    ),
    aa AS (
        SELECT x, y, count(*) AS n_common, sum(w_u) AS w_sum
        FROM wedge GROUP BY x, y
    ),
    cand AS (
        SELECT c.x, c.y, c.n_common, c.w_sum
        FROM aa c
        WHERE NOT EXISTS (
            SELECT 1 FROM und WHERE und.u = c.x AND und.v = c.y)
    )
    SELECT x AS u, y AS v, n_common,
           CAST(w_sum AS DOUBLE) / 1e9 + 0.0 AS aa_score
    FROM cand
    ORDER BY w_sum DESC, x, y
    LIMIT {_LP_TOP}
    """,
    tags=("graph", "link-prediction"),
)
def adamic_adar_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the co-supply graph: the top
    {_LP_TOP} non-adjacent supplier pairs by sum of 1/ln(degree) over
    their common neighbors — the frequency-weighted refinement of
    common_neighbor_link_prediction (a shared rare hub says more than
    a shared mega-hub; Adamic & Adar 2003, the second baseline of
    Liben-Nowell & Kleinberg's benchmark).

    Scale shape: the same threshold-and-cap-bounded wedge self-join as
    triangle counting, with the hub degree attached by a broadcast
    join BEFORE the pair aggregation so the weight rides the wedge
    stream; per-pair sums are exact integers (1e-9-quantized weights),
    the anti-join drops existing edges, and the top-k cut is a
    TakeOrdered under a total integer order — never a global sort."""
    t = load(spark, sf_dir)
    pairs = _cosupply_pairs_shared(spark, t, sf_dir)
    edges = _cosupply_threshold_edges(pairs, _CORE_FACTOR).persist()
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("d")
    )
    dh = F.broadcast(
        deg.select(
            F.col("node").alias("hub"),
            F.round(1e9 / F.log(F.col("d").cast("double")), 0)
            .cast("long").alias("w_u"),
        )
    )
    a = sym.select(F.col("u").alias("hub"), F.col("v").alias("x"))
    # weight attaches to the UN-expanded edge list (the round-9 growth
    # bench measured 18.9x at 10x when the broadcast join ran on the
    # C(d,2)-expanded wedge stream instead; pre-joining restores the
    # common_neighbor curve)
    b = (
        sym.select(F.col("u").alias("hub"), F.col("v").alias("y"))
        .join(dh, "hub")
    )
    aa = (
        a.join(b, "hub")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(
            F.count("*").alias("n_common"),
            F.sum("w_u").alias("w_sum"),
        )
    )
    cand = aa.join(
        edges,
        (aa.x == edges.u) & (aa.y == edges.v),
        "left_anti",
    )
    return (
        cand.orderBy(F.col("w_sum").desc(), "x", "y")
        .limit(_LP_TOP)
        .select(
            F.col("x").alias("u"),
            F.col("y").alias("v"),
            "n_common",
            (F.col("w_sum").cast("double") / 1e9 + 0.0).alias("aa_score"),
        )
    )


# --------------------------------------------------------------------------
# Hill power-law tail estimator on the degree distribution (round 9)
# --------------------------------------------------------------------------
_HILL_DMIN = 5


@query(
    "degree_powerlaw_hill",
    # per-node ln(d/dmin) is quantized to integer 1e-9 units (identical
    # doubles both engines — degrees are exact integers), so the tail
    # sum is exact and alpha is one identical final double expression.
    oracle=f"""
    WITH {_COSUPPLY_CTE},
    thr AS (SELECT {_CORE_FACTOR} * avg(shared) AS t FROM p),
    und AS (SELECT u, v FROM p, thr WHERE shared > t),
    e AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
    deg AS (SELECT u AS node, count(*) AS d FROM e GROUP BY u),
    tail AS (
        SELECT d,
               CAST(round(1e9 * ln(CAST(d AS DOUBLE) / {_HILL_DMIN}), 0)
                    AS BIGINT) AS lnr_u
        FROM deg WHERE d >= {_HILL_DMIN}
    )
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST(count(*) AS BIGINT) AS n_tail,
           CAST({_HILL_DMIN} AS BIGINT) AS d_min,
           CAST(max(d) AS BIGINT) AS d_max,
           round(1.0 + count(*)
                 / (CAST(sum(lnr_u) AS DOUBLE) / 1e9), 6) + 0.0
               AS alpha_hill
    FROM tail
    """,
    tags=("graph", "stats"),
)
def degree_powerlaw_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill maximum-likelihood estimate of the power-law tail exponent
    of the co-supply degree distribution: alpha = 1 + n / Σ ln(d/dmin)
    over nodes with degree >= dmin (Hill 1975; the discrete-tail form
    popularized by Clauset-Shalizi-Newman 2009) — the scale-planning
    number behind _COSUPPLY_CAP and the skew-salting thresholds: alpha
    near 2 means hub degrees grow linearly with graph size and every
    uncapped quadratic pair build eventually melts.

    Scale shape: degrees come from one keyed count over the bounded
    edge list; the tail is a filter + one aggregate with exact
    integer-quantized log terms — nothing beyond the shared capped
    pair build shuffles."""
    t = load(spark, sf_dir)
    pairs = _cosupply_pairs_shared(spark, t, sf_dir)
    edges = _cosupply_threshold_edges(pairs, _CORE_FACTOR)
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("d")
    ).persist()
    n_nodes = deg.agg(F.count("*").alias("n_nodes"))
    tail = deg.where(F.col("d") >= _HILL_DMIN).select(
        "d",
        F.round(
            1e9 * F.log(F.col("d").cast("double") / _HILL_DMIN), 0
        ).cast("long").alias("lnr_u"),
    )
    agg = tail.agg(
        F.count("*").alias("n_tail"),
        F.max("d").alias("d_max"),
        F.sum("lnr_u").alias("s_u"),
    )
    return agg.crossJoin(F.broadcast(n_nodes)).select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("n_tail").cast("long").alias("n_tail"),
        F.lit(_HILL_DMIN).cast("long").alias("d_min"),
        F.col("d_max").cast("long").alias("d_max"),
        (
            F.round(
                1.0 + F.col("n_tail")
                / (F.col("s_u").cast("double") / 1e9),
                6,
            ) + 0.0
        ).alias("alpha_hill"),
    )


# --------------------------------------------------------------------------
# Rich-club coefficient (round 9)
# --------------------------------------------------------------------------
_RICH_KS = (2, 4, 8)


@query(
    "rich_club_coefficient",
    # node degrees, the >k subsets and the edges-within counts are all
    # exact integers over the shared capped co-supply graph; phi is
    # one division per k.
    oracle=f"""
    WITH {_COSUPPLY_CTE},
    thr AS (SELECT {_CORE_FACTOR} * avg(shared) AS t FROM p),
    und AS MATERIALIZED (SELECT u, v FROM p, thr WHERE shared > t),
    e AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
    deg AS (SELECT u AS node, count(*) AS d FROM e GROUP BY u),
    ks AS (SELECT unnest([{', '.join(str(k) for k in _RICH_KS)}]) AS k),
    nk AS (
        SELECT ks.k, count(*) AS n_k
        FROM ks JOIN deg ON deg.d > ks.k
        GROUP BY ks.k
    ),
    ek AS (
        SELECT ks.k, count(*) AS e_k
        FROM ks
        JOIN und ON TRUE
        JOIN deg da ON da.node = und.u AND da.d > ks.k
        JOIN deg db ON db.node = und.v AND db.d > ks.k
        GROUP BY ks.k
    )
    SELECT nk.k,
           CAST(nk.n_k AS BIGINT) AS n_nodes,
           CAST(coalesce(ek.e_k, 0) AS BIGINT) AS n_edges,
           round(CASE WHEN nk.n_k >= 2
                 THEN 2.0 * coalesce(ek.e_k, 0)
                      / (nk.n_k * (nk.n_k - 1.0))
                 ELSE 0.0 END, 6) + 0.0 AS phi
    FROM nk LEFT JOIN ek ON ek.k = nk.k
    """,
    tags=("graph", "stats"),
)
def rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient of the co-supply graph at degree cuts
    {_RICH_KS}: phi(k) = 2*E_k / (N_k*(N_k-1)) — how densely the
    hubs interconnect relative to a clique (Colizza et al. 2006), the
    hubs-talk-to-hubs diagnostic beside degree_assortativity's global
    correlation (a network can be disassortative overall yet carry a
    tight rich club).

    Scale shape: degrees from one keyed count; for each k (a 3-row
    literal frame) the >k node subset filters via broadcast degree
    joins onto the bounded edge list — no pair expansion beyond the
    existing capped edges."""
    t = load(spark, sf_dir)
    pairs = _cosupply_pairs_shared(spark, t, sf_dir)
    edges = _cosupply_threshold_edges(pairs, _CORE_FACTOR).persist()
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("d")
    ).persist()
    ks = spark.createDataFrame([(k,) for k in _RICH_KS], "k int")
    nk = ks.join(
        F.broadcast(deg), F.col("d") > F.col("k")
    ).groupBy("k").agg(F.count("*").alias("n_k"))
    da = F.broadcast(
        deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    )
    db = F.broadcast(
        deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    )
    ek = (
        edges.join(da, "u").join(db, "v")
        .crossJoin(F.broadcast(ks))
        .where((F.col("du") > F.col("k")) & (F.col("dv") > F.col("k")))
        .groupBy("k")
        .agg(F.count("*").alias("e_k"))
    )
    j = nk.join(F.broadcast(ek), "k", "left").select(
        "k",
        F.col("n_k").cast("long").alias("n_nodes"),
        F.coalesce(F.col("e_k"), F.lit(0)).cast("long").alias(
            "n_edges"
        ),
        (
            F.round(
                F.when(
                    F.col("n_k") >= 2,
                    2.0 * F.coalesce(F.col("e_k"), F.lit(0))
                    / (F.col("n_k") * (F.col("n_k") - 1.0)),
                ).otherwise(0.0),
                6,
            ) + 0.0
        ).alias("phi"),
    )
    return j


# --------------------------------------------------------------------------
# Edge triangle support (k-truss layer zero) (round 9)
# --------------------------------------------------------------------------
@query(
    "edge_triangle_support",
    # support counts come from the same canonical a<b<c closure as
    # triangle_count_cosupply (exact integers); the histogram is one
    # keyed rollup over the bounded edge list.
    oracle=f"""
    WITH {_COSUPPLY_CTE},
    thr AS (SELECT {_TRI_FACTOR} * avg(shared) AS t FROM p),
    e AS MATERIALIZED (SELECT u, v FROM p, thr WHERE shared > t),
    tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e2.u = e1.v
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    sup AS (
        SELECT u, v, count(*) AS s FROM (
            SELECT a AS u, b AS v FROM tri
            UNION ALL SELECT b AS u, c AS v FROM tri
            UNION ALL SELECT a AS u, c AS v FROM tri
        ) GROUP BY u, v
    ),
    alle AS (
        SELECT e.u, e.v, coalesce(sup.s, 0) AS support
        FROM e LEFT JOIN sup ON sup.u = e.u AND sup.v = e.v
    )
    SELECT support,
           CAST(count(*) AS BIGINT) AS n_edges,
           CAST(support + 2 AS BIGINT) AS max_truss
    FROM alle
    GROUP BY support
    """,
    tags=("graph", "triangles"),
)
def edge_triangle_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-edge triangle support histogram: how many triangles each
    co-supply edge participates in (support s means the edge could
    survive up to a (s+2)-truss — the community-strength layer under
    triangle_count_cosupply's global census and the direct input to
    truss peeling; Cohen 2008).

    Scale shape: the same canonical closure as the triangle census
    (bounded by the threshold + _COSUPPLY_CAP), each triangle charged
    to its three edges map-side, one keyed count, one LEFT join back
    to the edge list so zero-support edges are counted too."""
    t = load(spark, sf_dir)
    pairs = _cosupply_pairs_shared(spark, t, sf_dir)
    edges = _cosupply_threshold_edges(pairs, _TRI_FACTOR).persist()
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = edges.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    sup = (
        tri.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(tri.select(F.col("b").alias("u"), F.col("c").alias("v")))
        .unionAll(tri.select(F.col("a").alias("u"), F.col("c").alias("v")))
        .groupBy("u", "v")
        .agg(F.count("*").alias("s"))
    )
    alle = edges.join(F.broadcast(sup), ["u", "v"], "left").select(
        F.coalesce(F.col("s"), F.lit(0)).alias("support")
    )
    return alle.groupBy("support").agg(
        F.count("*").alias("n_edges"),
        (F.col("support") + 2).cast("long").alias("max_truss"),
    ).select(
        "support",
        F.col("n_edges").cast("long").alias("n_edges"),
        "max_truss",
    )
