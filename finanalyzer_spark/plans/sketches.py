"""Count-min sketch over a portable hash — the frequency sketch that
completes the approximate-counting family (HLL = distinct, KLL =
quantiles, Misra-Gries = heavy-hitter candidates, CMS = point
frequency estimates).

Unlike engine-native sketches (`approx_count_distinct`,
`approx_percentile`) the CMS here is built from first principles on a
PORTABLE hash (md5 prefix, the repo's cross-engine determinism
convention — operators/sampling.py) so the DuckDB oracle replicates
the sketch bit-for-bit: the check is exact equality of estimates, not
just an error contract.

Reference parity: the reference has no sketches at all (SQLite exact
aggregates only); this is part of the 100 TB extension surface, where
exact per-key counting of a hot stream is the thing you CAN'T do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .registry import query

#: sketch geometry: d independent hash rows x w buckets. w = 256 on a
#: 2000-key fixture FORCES collisions (~8 keys/bucket) so the
#: overcount path is actually exercised; at production scale w ~ 2^16+
#: and the sketch is a few hundred KB per executor — mergeable by
#: simple addition, groupBy-reducible.
_CMS_D = 4
_CMS_W = 256
_TOP = 10


def cms_bucket(key_col, i: int, w: int = _CMS_W):
    """Row i's counter bucket for `key_col` under the portable md5
    hash — shared by the batch query, the DuckDB oracle generator and
    the streaming incremental-maintenance twin
    (streaming.events.streaming_cms_counters)."""
    key = F.concat(F.lit(f"cms{i}|"), key_col.cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % w


def _bucket_spark(i: int):
    return cms_bucket(F.col("l_partkey"), i)


def _bucket_sql(i: int) -> str:
    return (
        f"('0x' || substr(md5('cms{i}|' || l_partkey::VARCHAR), 1, 8))"
        f"::BIGINT % {_CMS_W}"
    )


_SEEDS = ", ".join(f"({i})" for i in range(_CMS_D))
_B_CASE = (
    "CASE s.i "
    + " ".join(f"WHEN {i} THEN {_bucket_sql(i)}" for i in range(_CMS_D))
    + " END"
)


@query(
    "cms_frequency_estimates",
    oracle=f"""
    WITH incr AS (
        SELECT l_partkey, s.i, {_B_CASE} AS b
        FROM lineitem CROSS JOIN (VALUES {_SEEDS}) AS s(i)
    ),
    counters AS (
        SELECT i, b, count(*) AS cnt FROM incr GROUP BY i, b
    ),
    exact AS (
        SELECT l_partkey, count(*) AS exact_cnt
        FROM lineitem GROUP BY l_partkey
        ORDER BY exact_cnt DESC, l_partkey ASC LIMIT {_TOP}
    ),
    probes AS (
        SELECT e.l_partkey, e.exact_cnt, s.i, {_B_CASE} AS b
        FROM exact e CROSS JOIN (VALUES {_SEEDS}) AS s(i)
    )
    SELECT p.l_partkey, p.exact_cnt,
           CAST(min(c.cnt) AS BIGINT) AS est_cnt,
           CAST(min(c.cnt) - p.exact_cnt AS BIGINT) AS overcount
    FROM probes p JOIN counters c ON c.i = p.i AND c.b = p.b
    GROUP BY p.l_partkey, p.exact_cnt
    """,
    tags=("sketch", "frequency"),
)
def cms_frequency_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (d=4 rows, w=256 buckets) frequency estimates
    for the exact top-10 keys. Build: one pass over the fact table
    explodes each row into d (row, bucket) increments (posexplode of a
    literal array — stays in codegen), then ONE groupBy builds every
    counter. Probe: the d candidate buckets per key join the counter
    table; the estimate is the min across rows — always >= exact (CMS
    never undercounts), the `overcount` column shows collision
    inflation.

    Scale shape: counters are at most d*w rows regardless of input
    size (mergeable by addition — the same shape as the HLL rollup);
    the probe side is 10 keys broadcast against a d*w-row table. The
    md5-prefix hash is the repo's portable-hash convention, so the
    oracle rebuilds the identical sketch and the comparison is exact,
    not probabilistic."""
    t = load(spark, sf_dir)
    li = t.lineitem
    # ONE fact scan + per-key pre-aggregation (r13, guide §2.3
    # "aggregate before you shuffle"): the counter for (i, b) is the
    # SUM over keys hashing to b of that key's row count, so the d
    # md5 buckets need computing once per DISTINCT key (~20k) instead
    # of once per fact row (~600k x d md5 calls), and the same per-key
    # frame yields the exact top-10 — the old shape's second scan.
    perkey = (
        li.groupBy("l_partkey")
        .agg(F.count("*").alias("exact_cnt"))
        .persist()
    )
    incr = perkey.select(
        "exact_cnt",
        F.posexplode(
            F.array(*[_bucket_spark(i) for i in range(_CMS_D)])
        ).alias("i", "b"),
    )
    counters = incr.groupBy("i", "b").agg(F.sum("exact_cnt").alias("cnt"))
    exact = perkey.orderBy(
        F.col("exact_cnt").desc(), F.col("l_partkey").asc()
    ).limit(_TOP)
    probes = exact.select(
        "l_partkey",
        "exact_cnt",
        F.posexplode(
            F.array(*[_bucket_spark(i) for i in range(_CMS_D)])
        ).alias("i", "b"),
    )
    return (
        F.broadcast(probes)
        .join(counters, ["i", "b"])
        .groupBy("l_partkey", "exact_cnt")
        .agg(
            F.min("cnt").alias("est_cnt"),
            (F.min("cnt") - F.col("exact_cnt")).alias("overcount"),
        )
    )


@query(
    "approx_topk_contract",
    oracle=f"""
    -- error-contract verdict oracle (engine-specific sketch; cf. the
    -- HLL/KLL precedent): with maxItemsTracked >= the fixture's key
    -- cardinality the space-saving sketch is provably exact, so every
    -- contract bit must come back true
    SELECT CAST({_TOP} AS BIGINT) AS n_items,
           true AS counts_exact,
           true AS covers_exact_topk
    """,
    tags=("sketch", "frequency", "contract"),
)
def approx_topk_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`approx_top_k` (space-saving sketch, the engine-native sibling
    of the hand-built CMS above) checked against the exact top-k under
    its accuracy contract: when maxItemsTracked exceeds the number of
    distinct keys the sketch degenerates to exact counting, so (a)
    every returned count must equal the exact count and (b) the
    returned item set must cover the exact top-k (up to count ties at
    the boundary, which the >=-threshold test admits).

    Scale shape: the sketch is ONE aggregation buffer (mergeable,
    map-side combined); the exact side is the same groupBy+TakeOrdered
    as cms_frequency_estimates; both reduce to k rows before the
    verdict join."""
    t = load(spark, sf_dir)
    li = t.lineitem
    approx = (
        li.agg(
            F.expr(
                f"approx_top_k(l_partkey, {_TOP}, 16384)"
            ).alias("tk")
        )
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("l_partkey"),
            F.col("e.count").alias("approx_cnt"),
        )
    )
    exact = li.groupBy("l_partkey").agg(F.count("*").alias("exact_cnt"))
    joined = approx.join(exact, "l_partkey")
    kth = (
        exact.orderBy(F.col("exact_cnt").desc(), F.col("l_partkey"))
        .limit(_TOP)
        .agg(F.min("exact_cnt").alias("kth_cnt"))
    )
    return (
        joined.crossJoin(F.broadcast(kth))
        .agg(
            F.count("*").alias("n_items"),
            (
                F.sum(
                    (F.col("approx_cnt") != F.col("exact_cnt")).cast("int")
                )
                == 0
            ).alias("counts_exact"),
            (
                F.sum(
                    (F.col("exact_cnt") >= F.col("kth_cnt")).cast("int")
                )
                == F.lit(_TOP)
            ).alias("covers_exact_topk"),
        )
    )


_KMV_K = 64


@query(
    "kmv_distinct_estimate",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT
               ('0x' || substr(md5('kmv|' || l_partkey::VARCHAR), 1, 8))
                   ::BIGINT AS hv
        FROM lineitem
    ),
    k AS (
        SELECT hv FROM h ORDER BY hv ASC LIMIT {_KMV_K}
    ),
    stat AS (
        SELECT count(*) AS k_seen, max(hv) AS kth
        FROM k
    ),
    exact AS (SELECT count(DISTINCT l_partkey) AS exact_distinct FROM lineitem)
    SELECT CAST(stat.k_seen AS BIGINT) AS k_seen,
           CAST(stat.kth AS BIGINT) AS kth_hash,
           CAST(({_KMV_K} - 1) * 4294967296 // stat.kth AS BIGINT)
               AS est_distinct,
           CAST(exact.exact_distinct AS BIGINT) AS exact_distinct,
           abs(({_KMV_K} - 1) * 4294967296 // stat.kth
               - exact.exact_distinct) * 100 <= exact.exact_distinct * 40
               AS within_40pct
    FROM stat CROSS JOIN exact
    """,
    tags=("sketch", "distinct"),
)
def kmv_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch on the portable md5
    hash: keep the k=64 smallest 32-bit hash values; the estimator
    (k-1) * 2^32 / kth_min inverts the uniform-order-statistic
    spacing (Bar-Yossef et al., the theta-sketch ancestor). The
    DuckDB oracle rebuilds the IDENTICAL sketch — exact comparison —
    and the exact-distinct column carries the error contract
    (within 40%: ~1/sqrt(64) ≈ 12.5% relative standard error, so
    40% is a ≈3σ deterministic bound for this fixture).

    Scale shape: the hash dedup is one map-side-combined distinct of
    integers; the k smallest collapse via TakeOrdered (bounded k per
    partition, then k at the driver stage — never a global sort);
    KMV sketches merge by union+truncate, same mergeability story as
    HLL/CMS but with a portable hash."""
    t = load(spark, sf_dir)
    hv = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("kmv|"), F.col("l_partkey").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("hv")
    )
    h = t.lineitem.select(hv).distinct()
    k = h.orderBy(F.col("hv").asc()).limit(_KMV_K)
    stat = k.agg(
        F.count("*").alias("k_seen"), F.max("hv").alias("kth")
    )
    exact = t.lineitem.agg(
        F.countDistinct("l_partkey").alias("exact_distinct")
    )
    est = F.expr(f"({_KMV_K} - 1) * 4294967296 div kth")
    return (
        stat.crossJoin(F.broadcast(exact))
        .select(
            "k_seen",
            F.col("kth").alias("kth_hash"),
            est.alias("est_distinct"),
            "exact_distinct",
            (
                F.abs(est - F.col("exact_distinct")) * 100
                <= F.col("exact_distinct") * 40
            ).alias("within_40pct"),
        )
    )


# --------------------------------------------------------------------------
# Bloom filter membership + measured false-positive rate
# --------------------------------------------------------------------------
#: filter geometry: m bits, k hash functions. m = 2048 on a ~1000-member
#: fixture drives a measurable (but small) FPR so the false-positive
#: path is exercised; at production scale m grows with the member set
#: (bits ~ 1.44 * k * n for target FPR 2^-k) and the bit set stays a
#: groupBy-distinct frame mergeable by union.
_BF_M = 2048
_BF_K = 3


def _bf_pos_spark(key_col, i: int):
    key = F.concat(F.lit(f"bf{i}|"), key_col.cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % _BF_M


def _bf_pos_sql(key_sql: str, i: int) -> str:
    return (
        f"('0x' || substr(md5('bf{i}|' || {key_sql}), 1, 8))"
        f"::BIGINT % {_BF_M}"
    )


_BF_SEEDS = ", ".join(f"({i})" for i in range(_BF_K))
_BF_BUILD_CASE = (
    "CASE s.i "
    + " ".join(
        f"WHEN {i} THEN {_bf_pos_sql('o_custkey::VARCHAR', i)}"
        for i in range(_BF_K)
    )
    + " END"
)
_BF_PROBE_CASE = (
    "CASE s.i "
    + " ".join(
        f"WHEN {i} THEN {_bf_pos_sql('c_custkey::VARCHAR', i)}"
        for i in range(_BF_K)
    )
    + " END"
)


@query(
    "bloom_filter_membership",
    oracle=f"""
    WITH members AS (SELECT DISTINCT o_custkey FROM orders),
    bits AS (
        SELECT DISTINCT {_BF_BUILD_CASE} AS b
        FROM members CROSS JOIN (VALUES {_BF_SEEDS}) AS s(i)
    ),
    probes AS (
        SELECT c.c_custkey, {_BF_PROBE_CASE} AS b,
               CASE WHEN m.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS is_member
        FROM customer c
        LEFT JOIN members m ON m.o_custkey = c.c_custkey
        CROSS JOIN (VALUES {_BF_SEEDS}) AS s(i)
    ),
    verdicts AS (
        SELECT c_custkey, max(is_member) AS is_member,
               CASE WHEN count(*) FILTER (WHERE bits.b IS NOT NULL) = {_BF_K}
                    THEN 1 ELSE 0 END AS bloom_positive
        FROM probes LEFT JOIN bits ON bits.b = probes.b
        GROUP BY c_custkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(is_member) AS BIGINT) AS n_members,
           CAST(sum(bloom_positive) AS BIGINT) AS n_positive,
           CAST(sum(CASE WHEN bloom_positive = 1 AND is_member = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
           CAST(sum(CASE WHEN bloom_positive = 1 AND is_member = 0
                         THEN 1 ELSE 0 END) * 1000000
                // sum(CASE WHEN is_member = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS fpr_ppm
    FROM verdicts
    """,
    tags=("sketch", "membership", "bloom"),
)
def bloom_filter_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter built over the customers that actually placed
    orders (m=2048 bits, k=3 md5-derived positions), probed
    with EVERY customer — the pre-join existence filter a 100 TB
    pipeline ships to the fact-table side to skip rows whose key
    cannot match (the DataFrame twin of Spark's own runtime bloom
    pushdown, but portable: DuckDB rebuilds the identical bit set so
    the check is exact equality of every verdict, zero undercounts by
    construction — a Bloom filter never yields false negatives).

    Scale shape: the bit set is a distinct-groupBy of at most m rows
    regardless of member count — mergeable by union, broadcastable to
    every probe task; probes explode each key into k positions
    (posexplode of a literal array, stays in codegen) and one groupBy
    per key demands all k bits present. The measured FPR closes the
    loop: the truth flag rides a left-semi-style join computed in the
    same pass."""
    t = load(spark, sf_dir)
    members = t.orders.select(F.col("o_custkey").alias("ck")).distinct()
    bits = members.select(
        F.explode(
            F.array(*[_bf_pos_spark(F.col("ck"), i) for i in range(_BF_K)])
        ).alias("b")
    ).distinct()
    probes = (
        t.customer.select("c_custkey")
        .join(
            members.withColumnRenamed("ck", "c_custkey").withColumn(
                "is_member", F.lit(1)
            ),
            "c_custkey",
            "left",
        )
        .na.fill({"is_member": 0})
        .select(
            "c_custkey",
            "is_member",
            F.explode(
                F.array(
                    *[_bf_pos_spark(F.col("c_custkey"), i) for i in range(_BF_K)]
                )
            ).alias("b"),
        )
    )
    verdicts = (
        probes.join(
            F.broadcast(bits.withColumn("hit", F.lit(1))), "b", "left"
        )
        .groupBy("c_custkey")
        .agg(
            F.max("is_member").alias("is_member"),
            (F.count(F.col("hit")) == _BF_K).cast("int").alias("bloom_positive"),
        )
    )
    fp = F.when(
        (F.col("bloom_positive") == 1) & (F.col("is_member") == 0), 1
    ).otherwise(0)
    return verdicts.agg(
        F.count("*").cast("long").alias("n_probes"),
        F.sum("is_member").cast("long").alias("n_members"),
        F.sum("bloom_positive").cast("long").alias("n_positive"),
        F.sum(fp).cast("long").alias("n_false_pos"),
        F.expr(
            "CAST(sum(CASE WHEN bloom_positive = 1 AND is_member = 0 THEN 1 "
            "ELSE 0 END) * 1000000 div sum(CASE WHEN is_member = 0 THEN 1 "
            "ELSE 0 END) AS BIGINT)"
        ).alias("fpr_ppm"),
    )
