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


#: large because Spark scales the L2 penalty by 1/σy_pop (≈1/30000 for
#: l_extendedprice) — this value yields a visibly-shrunk slope vs OLS
RIDGE_LAMBDA = 1000000.0


@query(
    "ridge_price_on_qty",
    # Spark's WeightedLeastSquares scales the L2 penalty by the label's
    # POPULATION stddev (verified empirically: λ_eff = λ/σy_pop exactly,
    # ratio 1.000000 across λ), so the closed form is
    # slope = covar_pop / (var_pop + λ/σy_pop).
    oracle=f"""
    WITH m AS (
        SELECT covar_pop(l_extendedprice, l_quantity) AS cxy,
               var_pop(l_quantity) AS vx,
               stddev_pop(l_extendedprice) AS sy,
               avg(l_extendedprice) AS my,
               avg(l_quantity) AS mx,
               count(*) AS n
        FROM lineitem
    ),
    p AS (
        SELECT cxy / (vx + {RIDGE_LAMBDA} / sy) AS w,
               my - cxy / (vx + {RIDGE_LAMBDA} / sy) * mx AS b,
               n
        FROM m
    )
    SELECT round(p.w, 6) AS slope,
           round(p.b, 4) AS intercept,
           round(avg(abs(l.l_extendedprice - (p.w * l.l_quantity + p.b))), 4)
               AS mae,
           round(sqrt(avg(power(l.l_extendedprice - (p.w * l.l_quantity + p.b), 2))), 4)
               AS rmse,
           p.n
    FROM lineitem l, p
    GROUP BY p.w, p.b, p.n
    """,
    tags=("ml", "regression", "ridge", "eval"),
)
def ridge_price_on_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge (L2, λ=100, unstandardized penalty) via pyspark.ml with
    RegressionEvaluator MAE/RMSE over the training frame — the
    reference's regularized-regressor ambition with a provable fit:
    single-feature ridge has the closed form slope = cov/(var+λ), so
    the oracle checks the TRAINED coefficients and both error metrics."""
    from pyspark.sql import functions as F

    from ..ml.features import fit_ridge_with_eval

    t = load(spark, sf_dir)
    fitted = fit_ridge_with_eval(
        t.lineitem, "l_quantity", "l_extendedprice", reg_param=RIDGE_LAMBDA
    )
    return fitted.select(
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 4).alias("intercept"),
        F.round("mae", 4).alias("mae"),
        F.round("rmse", 4).alias("rmse"),
        "n",
    )
