"""Partition-invariance: tie-sensitive queries must return IDENTICAL
rows under different `spark.sql.shuffle.partitions` — the property
that makes results reproducible when the same job runs on 32 local
threads or 1000 executors. Any hidden dependence on partition layout
(arbitrary survivor picks, monotonically_increasing_id, first/last
without full ordering) shows up as a diff here.
"""

from __future__ import annotations

import pytest

from finanalyzer_spark.plans import REGISTRY

from .conftest import SF_DIR_ORACLE

#: queries whose semantics involve dedup survivors, positional ids,
#: hash samples, window tie-breaks, or argmax picks — the places a
#: partition-layout dependence would hide
TIE_SENSITIVE = [
    "latest_price_per_key",
    "window_rownum_dedup",
    "dedup_by_key_latest",
    "registry_bootstrap_ids",
    "time_split_folds",
    "deterministic_sample_stats",
    "per_group_hash_sample",
    "minhash_lsh_candidates",
    "cusum_changepoint",
    "revenue_decile_profile",
    # round-5 additions: window tie-breaks over non-unique fixture
    # keys, A-ES hash-keyed sampling, bounded-frame drift stats, and
    # the iterative peel (scalar-count convergence per round)
    "rolling_corr_price_qty",
    "atr_14",
    "weighted_sample_topk",
    "binned_ks_drift",
    "kcore_cosupply",
    "salted_token_vocabulary",
    # round-6 additions: every ordered_scan/global_ntile rewrite reads
    # spark.sql.shuffle.partitions for its range-partition fan-out, so
    # a different partition count exercises different offset tables —
    # the global ranks/cumsums/buckets must come out identical
    "gini_revenue_concentration",
    "abc_customer_classes",
    "rfm_segments",
    "curriculum_quartile_bins",
    "vocab_coverage_curve",
    "pareto_front_parts",
    "funnel_conversion_lag",
    "repeat_purchase_interval",
    "ks_statistic_returned_vs_kept",
    "mann_whitney_u_returned_vs_kept",
]


def _canonical(df) -> list[tuple]:
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    return sorted(map(tuple, pdf.astype(str).values.tolist()))


@pytest.mark.parametrize("name", TIE_SENSITIVE)
def test_partition_count_invariant(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = _canonical(REGISTRY[name].fn(spark, SF_DIR_ORACLE))
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        b = _canonical(REGISTRY[name].fn(spark, SF_DIR_ORACLE))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert len(a) > 0
    assert a == b, f"{name}: result depends on shuffle partition count"
