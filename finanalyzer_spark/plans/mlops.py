"""Spark ML pipeline queries (SURVEY.md §2.11) — oracle-checked where
the fitted transform reduces to closed-form SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from ..ml.features import scaled_price_by_priority
from .registry import query


@query(
    "ml_feature_pipeline",
    oracle="""
    WITH stats AS (
        SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
    ),
    ranked AS (
        SELECT o_orderpriority,
               dense_rank() OVER (ORDER BY o_orderpriority) - 1 AS cat_index
        FROM (SELECT DISTINCT o_orderpriority FROM orders)
    )
    SELECT o.o_orderpriority,
           round(avg((o.o_totalprice - s.lo) / (s.hi - s.lo)), 6)
               AS avg_scaled_price,
           count(*) AS n_orders,
           max(r.cat_index) AS cat_index
    FROM orders o, stats s
    JOIN ranked r ON r.o_orderpriority = o.o_orderpriority
    GROUP BY o.o_orderpriority
    """,
    tags=("ml", "pipeline", "scaling", "encoding"),
)
def ml_feature_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fitted pyspark.ml Pipeline (StringIndexer → OneHotEncoder →
    VectorAssembler → MinMaxScaler) whose transform is verified in
    closed form: alphabetic label index + (x-min)/(max-min) scaling."""
    t = load(spark, sf_dir)
    return scaled_price_by_priority(t.orders)


@query(
    "ols_price_on_qty",
    oracle="""
    SELECT round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           count(*) AS n
    FROM lineitem
    """,
    tags=("ml", "regression", "training"),
)
def ols_price_on_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real pyspark.ml training run (LinearRegression, normal-
    equation solver = exact OLS) verified against SQL's closed-form
    regr_slope/regr_intercept — distributed training whose result is
    still oracle-checkable. The normal-equation solve aggregates
    X'X / X'y moments in one pass (mergeable, like any algebraic agg);
    no gradient iterations, no driver-side data."""
    from pyspark.sql import functions as F

    from ..ml.features import fit_ols

    t = load(spark, sf_dir)
    fitted = fit_ols(t.lineitem, "l_quantity", "l_extendedprice")
    return fitted.select(
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 4).alias("intercept"),
        "n",
    )
