"""Spark ML pipeline queries (SURVEY.md §2.11) — oracle-checked where
the fitted transform reduces to closed-form SQL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    """Ridge (L2, λ=RIDGE_LAMBDA, unstandardized penalty) via pyspark.ml with
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


@query(
    "polynomial_features",
    oracle="""
    SELECT l_returnflag,
           round(avg(l_quantity), 6) AS p_x,
           round(avg(l_quantity * l_quantity), 6) AS p_x2,
           round(avg(l_discount), 6) AS p_y,
           round(avg(l_quantity * l_discount), 6) AS p_xy,
           round(avg(l_discount * l_discount), 6) AS p_y2
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("ml", "features", "polynomial"),
)
def polynomial_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pyspark.ml PolynomialExpansion (degree 2) over (quantity,
    discount) — the reference's polynomial-interaction features
    (plot_cyclical_feature_engineering.py:615-627). The expansion is a
    narrow map (no shuffle); the per-flag averages of each expanded
    component have exact closed forms, so the operator's output order
    and values are both oracle-pinned."""
    from pyspark.ml.feature import PolynomialExpansion, VectorAssembler
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as F

    t = load(spark, sf_dir)
    base = t.lineitem.select(
        "l_returnflag",
        F.col("l_quantity").cast("double").alias("x"),
        F.col("l_discount").cast("double").alias("y"),
    )
    assembled = VectorAssembler(inputCols=["x", "y"], outputCol="_v").transform(base)
    expanded = PolynomialExpansion(degree=2, inputCol="_v", outputCol="_p").transform(
        assembled
    ).withColumn("_pa", vector_to_array("_p"))
    # Spark's expansion order for (x, y) @ degree 2: x, x², y, xy, y²
    return expanded.groupBy("l_returnflag").agg(
        F.round(F.avg(F.col("_pa")[0]), 6).alias("p_x"),
        F.round(F.avg(F.col("_pa")[1]), 6).alias("p_x2"),
        F.round(F.avg(F.col("_pa")[2]), 6).alias("p_y"),
        F.round(F.avg(F.col("_pa")[3]), 6).alias("p_xy"),
        F.round(F.avg(F.col("_pa")[4]), 6).alias("p_y2"),
    )


def _spline_oracle(n_splines: int = 6, period: float = 12.0) -> str:
    from ..ml.features import periodic_spline_sql

    basis = periodic_spline_sql("CAST(month(o_orderdate) AS DOUBLE)",
                                period, n_splines)
    cols = ",\n           ".join(
        f"round(avg({b}), 6) AS spline_{j}" for j, b in enumerate(basis)
    )
    return f"""
    SELECT o_orderpriority,
           {cols}
    FROM orders
    GROUP BY o_orderpriority
    """


@query(
    "spline_seasonal_features",
    oracle=_spline_oracle(),
    tags=("ml", "features", "spline", "cyclical"),
)
def spline_seasonal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodic uniform cubic B-spline basis over order month — the
    reference's periodic_spline_transformer for cyclical time features
    (plot_cyclical_feature_engineering.py:431-441), as pure codegen
    piecewise polynomials (no UDF, no fitted state). Basis functions
    and the oracle SQL are generated from the same knot constants."""
    from pyspark.sql import functions as F

    from ..ml.features import periodic_spline_cols

    t = load(spark, sf_dir)
    x = F.month("o_orderdate").cast("double")
    basis = periodic_spline_cols(x, period=12.0, n_splines=6)
    return t.orders.groupBy("o_orderpriority").agg(
        *[
            F.round(F.avg(b), 6).alias(f"spline_{j}")
            for j, b in enumerate(basis)
        ]
    )


def _nystroem_oracle(n_landmarks: int = 4, dim: int = 64,
                     gamma: float = 0.5) -> str:
    from ..ml.features import (
        nystroem_constants,
        nystroem_kernel_sql,
        nystroem_landmark_ctes,
    )

    L, W = nystroem_constants(n_landmarks, dim, gamma)
    kx = nystroem_kernel_sql("v", n_landmarks, dim, gamma)
    k_cols = ",\n               ".join(f"{k} AS k{j}" for j, k in enumerate(kx))
    phi = []
    for i, row in enumerate(W):
        terms = " + ".join(f"{float(w)!r} * k{j}" for j, w in enumerate(row))
        phi.append(f"round(avg({terms}), 5) AS phi_{i}")
    phi_cols = ",\n           ".join(phi)
    return f"""
    WITH {nystroem_landmark_ctes(L)},
    e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
    k AS (
        SELECT label,
               {k_cols}
        FROM e, consts
    )
    SELECT label,
           {phi_cols}
    FROM k
    GROUP BY label
    """


@query(
    "nystroem_features",
    oracle=_nystroem_oracle(),
    tags=("ml", "features", "kernel", "nystroem"),
)
def nystroem_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nyström RBF kernel approximation over the embedding corpus —
    the reference's Nystroem stage (plot_cyclical_feature_engineering
    .py:662-669). The m×m landmark factorization W = K_mm^(-1/2) is
    computed once from seeded constants (driver-side, m=4) and
    interpolated into BOTH engines; the distributed part is a narrow
    map φ(x) = W·k(x,L) in whole-stage codegen — the correct 100 TB
    shape (constant broadcast, no shuffle, no UDF)."""
    from pyspark.sql import functions as F

    from ..ml.features import nystroem_constants, nystroem_feature_cols

    L, W = nystroem_constants()
    t = load(spark, sf_dir)
    feats = nystroem_feature_cols("embedding", L, W, gamma=0.5)
    return t.embeddings.groupBy("label").agg(
        *[F.round(F.avg(p), 5).alias(f"phi_{i}") for i, p in enumerate(feats)]
    )


@query(
    "gbt_price_improves",
    # Tree-ensemble fits aren't SQL-expressible; the checkable contract
    # is the eval harness: baseline MAE (mean-predictor) has an exact
    # closed form, and a depth-3 GBT on a strongly predictive feature
    # must beat it. The oracle pins n, the exact baseline, and the
    # improvement flag.
    oracle="""
    WITH m AS (SELECT avg(l_extendedprice) AS mu FROM lineitem)
    SELECT count(*) AS n,
           round(avg(abs(l_extendedprice - m.mu)), 4) AS baseline_mae,
           TRUE AS gbt_beats_baseline
    FROM lineitem, m
    GROUP BY m.mu
    """,
    tags=("ml", "regression", "gbt", "eval"),
)
def gbt_price_improves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GBTRegressor training run (the reference's
    HistGradientBoostingRegressor ambition, :201-238) with
    RegressionEvaluator MAE against the closed-form mean-predictor
    baseline. Distributed training: each iteration is a set of
    aggregation passes for split stats — no driver-side data."""
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor
    from pyspark.sql import functions as F

    t = load(spark, sf_dir)
    base = t.lineitem.select(
        F.col("l_quantity").cast("double").alias("x"),
        F.col("l_extendedprice").cast("double").alias("y"),
    )
    assembled = VectorAssembler(inputCols=["x"], outputCol="_f").transform(base)
    model = GBTRegressor(
        featuresCol="_f", labelCol="y", maxDepth=3, maxIter=5, seed=42
    ).fit(assembled)
    mae = RegressionEvaluator(
        labelCol="y", predictionCol="prediction", metricName="mae"
    ).evaluate(model.transform(assembled))
    stats = base.agg(
        F.count("*").alias("n"),
        F.avg("y").alias("_mu"),
    )
    baseline = base.crossJoin(F.broadcast(stats)).agg(
        F.round(F.avg(F.abs(F.col("y") - F.col("_mu"))), 4).alias("baseline_mae")
    )
    return (
        stats.select("n")
        .crossJoin(baseline)
        .select(
            "n",
            "baseline_mae",
            (F.lit(float(mae)) < F.col("baseline_mae")).alias("gbt_beats_baseline"),
        )
    )


# --------------------------------------------------------------------------
# grouped-map Arrow UDF: per-group OLS via applyInPandas
# --------------------------------------------------------------------------
@query(
    "per_supplier_ols_slopes",
    oracle="""
    SELECT l_suppkey,
           count(*) AS n,
           round(regr_slope(l_extendedprice, l_quantity), 4) + 0.0 AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) + 0.0
               AS intercept
    FROM lineitem
    GROUP BY l_suppkey
    """,
    tags=("ml", "regression", "udf", "grouped-map"),
)
def per_supplier_ols_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier price-on-quantity OLS fit via `applyInPandas` — the
    grouped-map Arrow UDF surface (one numpy lstsq per group, vectorized
    inside the worker; the reference's vendored-sklearn ambition done
    per key). Each group is one supplier's lineitems — bounded and
    hash-partitioned; the kernel sees a pandas frame per group and
    returns one row, so the Python boundary moves one Arrow batch in
    and k rows out. The oracle is the closed form (regr_slope/
    regr_intercept); matching it proves the kernel's math, not just
    its plumbing. When the per-group model is SQL-expressible (as
    here), the pure-SQL form is the faster path — this query is the
    exemplar for when it is not."""
    import pandas as pd

    from pyspark.sql import types as T

    t = load(spark, sf_dir)

    schema = T.StructType(
        [
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("slope", T.DoubleType()),
            T.StructField("intercept", T.DoubleType()),
        ]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        x = pdf["l_quantity"].to_numpy(dtype="float64")
        y = pdf["l_extendedprice"].to_numpy(dtype="float64")
        # closed form (matches regr_slope): cov/var with mean centering
        xm, ym = x.mean(), y.mean()
        vx = ((x - xm) ** 2).sum()
        slope = float(((x - xm) * (y - ym)).sum() / vx) if vx > 0 else None
        intercept = float(ym - slope * xm) if slope is not None else None
        return pd.DataFrame(
            {
                "l_suppkey": [int(pdf["l_suppkey"].iloc[0])],
                "n": [len(pdf)],
                "slope": [None if slope is None else round(slope, 4) + 0.0],
                "intercept": [
                    None if intercept is None else round(intercept, 4) + 0.0
                ],
            }
        )

    return (
        t.lineitem.select("l_suppkey", "l_quantity", "l_extendedprice")
        .groupBy("l_suppkey")
        .applyInPandas(fit, schema=schema)
    )


# --------------------------------------------------------------------------
# grouped-AGGREGATE Arrow UDF (pandas_udf inside .agg) — the remaining
# Arrow UDF variant: series in, scalar out, composable with built-in
# aggregates in one aggregation
# --------------------------------------------------------------------------
@query(
    "grouped_agg_median_discount",
    # median is sort-based (no accumulation-order float drift):
    # quantile_cont(0.5) interpolates the two middle values exactly
    # like numpy's median — safe cross-engine parity at round 6
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           round(quantile_cont(l_discount, 0.5), 6) + 0.0 AS median_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("udf", "grouped-agg", "aggregate"),
)
def grouped_agg_median_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-flag median discount via a grouped-aggregate `pandas_udf` —
    the Arrow UDF variant that slots INTO `.agg()`. Spark disallows
    mixing grouped-agg pandas UDFs with JVM aggregates in one `.agg()`
    (INVALID_PANDAS_UDF_PLACEMENT), so the row count rides a second
    pandas UDF over the same shuffle. The worker receives each group's
    column as one pandas Series and returns a scalar; numpy's
    sort-based median is deterministic across partitionings, which is
    what makes an exact oracle possible where a sum-based custom
    aggregate would drift. Spark's own percentile_approx is the
    no-Python path when approximation is acceptable; this exercises
    the exact-custom-statistic shape."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def median_udf(v: pd.Series) -> float:
        import numpy as np

        return round(float(np.median(v.to_numpy(dtype="float64"))), 6) + 0.0

    @pandas_udf("long")
    def count_udf(v: pd.Series) -> int:
        return len(v)

    t = load(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        count_udf(F.col("l_discount")).alias("n"),
        median_udf(F.col("l_discount")).alias("median_disc"),
    )


# --------------------------------------------------------------------------
# Closed-form 2-feature PCA: eigendecomposition as SQL, no driver math
# --------------------------------------------------------------------------
_PCA2_ORACLE = """
WITH s AS (
    SELECT avg(l_quantity)                     AS mx,
           avg(l_extendedprice)                AS my,
           var_pop(l_quantity)                 AS cxx,
           var_pop(l_extendedprice)            AS cyy,
           covar_pop(l_quantity, l_extendedprice) AS cxy
    FROM lineitem
),
e AS (
    SELECT *,
           (cxx + cyy + sqrt((cxx - cyy) * (cxx - cyy) + 4 * cxy * cxy)) / 2
               AS lam1,
           (cxx + cyy - sqrt((cxx - cyy) * (cxx - cyy) + 4 * cxy * cxy)) / 2
               AS lam2
    FROM s
),
v AS (
    SELECT *,
           cxy / sqrt(cxy * cxy + (lam1 - cxx) * (lam1 - cxx))          AS v1x,
           (lam1 - cxx) / sqrt(cxy * cxy + (lam1 - cxx) * (lam1 - cxx)) AS v1y
    FROM e
),
p AS (
    SELECT l.l_returnflag,
           (l.l_quantity - v.mx) * v.v1x + (l.l_extendedprice - v.my) * v.v1y
               AS pc1,
           v.lam1 / (v.lam1 + v.lam2) AS ratio
    FROM lineitem l CROSS JOIN v
)
SELECT l_returnflag,
       count(*) AS n,
       round(avg(pc1), 4) + 0.0 AS mean_pc1,
       round(stddev_samp(pc1), 2) + 0.0 AS std_pc1,
       round(any_value(ratio), 6) + 0.0 AS var_explained
FROM p
GROUP BY l_returnflag
"""


@query("pca2_price_qty", oracle=_PCA2_ORACLE, tags=("ml", "features", "scale-path"))
def pca2_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 2-feature PCA with the eigendecomposition in closed form
    (2x2 covariance: lambda = (tr +- sqrt(tr^2 - 4 det))/2), entirely
    inside the SQL engine — per-returnflag distribution of the first
    principal component plus the explained-variance ratio.

    Scale shape: pass 1 is one scalar aggregate (5 moments, map-side
    combined); the eigenvector algebra runs on that single row; pass 2
    re-scans lineitem and projects via a broadcast (1-row) cross join —
    no driver-side math, no collect, no iteration.  This is the
    degenerate-k case of the general pattern 'moment aggregate ->
    tiny-matrix factorization -> fold constants into the projection
    map' that nystroem_features uses with precomputed landmarks
    (ml/features.py)."""
    t = load(spark, sf_dir)
    li = t.lineitem
    s = li.agg(
        F.avg("l_quantity").alias("mx"),
        F.avg("l_extendedprice").alias("my"),
        F.var_pop("l_quantity").alias("cxx"),
        F.var_pop("l_extendedprice").alias("cyy"),
        F.covar_pop("l_quantity", "l_extendedprice").alias("cxy"),
    )
    disc = F.sqrt(
        (F.col("cxx") - F.col("cyy")) * (F.col("cxx") - F.col("cyy"))
        + 4 * F.col("cxy") * F.col("cxy")
    )
    e = s.select(
        "*",
        ((F.col("cxx") + F.col("cyy") + disc) / 2).alias("lam1"),
        ((F.col("cxx") + F.col("cyy") - disc) / 2).alias("lam2"),
    )
    nrm = F.sqrt(
        F.col("cxy") * F.col("cxy")
        + (F.col("lam1") - F.col("cxx")) * (F.col("lam1") - F.col("cxx"))
    )
    v = e.select(
        "*",
        (F.col("cxy") / nrm).alias("v1x"),
        ((F.col("lam1") - F.col("cxx")) / nrm).alias("v1y"),
    )
    pc1 = (F.col("l_quantity") - F.col("mx")) * F.col("v1x") + (
        F.col("l_extendedprice") - F.col("my")
    ) * F.col("v1y")
    p = li.crossJoin(F.broadcast(v)).select(
        "l_returnflag",
        pc1.alias("pc1"),
        (F.col("lam1") / (F.col("lam1") + F.col("lam2"))).alias("ratio"),
    )
    return p.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        (F.round(F.avg("pc1"), 4) + 0.0).alias("mean_pc1"),
        (F.round(F.stddev_samp("pc1"), 2) + 0.0).alias("std_pc1"),
        (F.round(F.any_value("ratio"), 6) + 0.0).alias("var_explained"),
    )


@query(
    "loo_target_encoding",
    oracle="""
    WITH c AS (
        SELECT l_returnflag, l_linestatus,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS x
        FROM lineitem
    ),
    g AS (
        SELECT l_returnflag, l_linestatus,
               count(*) AS n, sum(x) AS s
        FROM c GROUP BY l_returnflag, l_linestatus
    ),
    enc AS (
        SELECT c.l_returnflag, c.l_linestatus, g.n,
               CAST((g.s - c.x) * 10000
                    // NULLIF(g.n - 1, 0) AS BIGINT) AS enc_ucents
        FROM c JOIN g ON g.l_returnflag = c.l_returnflag
                     AND g.l_linestatus = c.l_linestatus
    )
    SELECT l_returnflag, l_linestatus,
           CAST(max(n) AS BIGINT) AS n,
           CAST(min(enc_ucents) AS BIGINT) AS min_enc_ucents,
           CAST(max(enc_ucents) AS BIGINT) AS max_enc_ucents,
           CAST(sum(enc_ucents) // count(*) AS BIGINT) AS avg_enc_ucents
    FROM enc GROUP BY l_returnflag, l_linestatus
    """,
    tags=("ml", "encoding"),
)
def loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of (returnflag, linestatus) on
    price: each row's encoding is the category target mean EXCLUDING
    itself, (S - x_i)/(n - 1) — the leakage-safe categorical encoder
    (plain target encoding leaks the row's own label; LOO is the
    standard fix). Integer cents end-to-end; the summary per category
    pins min/max/avg of the encodings.

    Scale shape: one keyed aggregate builds (n, S) per category (6
    rows), broadcast back onto the stream — the encoding itself never
    shuffles row data; the verification rollup reuses the category
    key. This is how target encoding actually deploys at 100 TB: a
    tiny statistics table joined into the feature pipeline."""
    t = load(spark, sf_dir)
    c = t.lineitem.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("x"),
    )
    g = c.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.sum("x").alias("s")
    )
    enc = c.join(F.broadcast(g), ["l_returnflag", "l_linestatus"]).select(
        "l_returnflag",
        "l_linestatus",
        "n",
        F.expr(
            "CAST((s - x) * 10000 div nullif(n - 1, 0) AS BIGINT)"
        ).alias("enc_ucents"),
    )
    return enc.groupBy("l_returnflag", "l_linestatus").agg(
        F.max("n").alias("n"),
        F.min("enc_ucents").alias("min_enc_ucents"),
        F.max("enc_ucents").alias("max_enc_ucents"),
        F.expr(
            "CAST(sum(enc_ucents) div count(*) AS BIGINT)"
        ).alias("avg_enc_ucents"),
    )


# --------------------------------------------------------------------------
# ext — split-conformal prediction intervals (Vovk et al.; Lei et al.
# 2018 "Distribution-Free Predictive Inference for Regression"): the
# finite-sample-valid uncertainty wrapper production ML systems put
# around point regressors.  Fold 0 fits, fold 1 calibrates the
# residual quantile, fold 2 measures empirical coverage.
# --------------------------------------------------------------------------
#: target coverage level (1 - alpha)
CONFORMAL_LEVEL = 0.9


@query(
    "conformal_interval_coverage",
    oracle=f"""
    WITH base AS (
        SELECT l_orderkey % 3 AS fold, l_quantity AS x,
               l_extendedprice AS y
        FROM lineitem
    ),
    m AS (
        SELECT covar_pop(y, x) / var_pop(x) AS w,
               avg(y) - covar_pop(y, x) / var_pop(x) * avg(x) AS b,
               count(*) AS n_train
        FROM base WHERE fold = 0
    ),
    cal AS (
        SELECT CAST(round(abs(y - (m.w * x + m.b)) * 100, 0) AS BIGINT)
                   AS rc
        FROM base, m WHERE fold = 1
    ),
    k AS (
        SELECT count(*) AS n_cal,
               CAST(ceil({CONFORMAL_LEVEL} * (count(*) + 1)) AS BIGINT)
                   AS rank_k
        FROM cal
    ),
    q AS (
        SELECT min(rc) AS q_cents FROM (
            SELECT rc,
                   sum(cnt) OVER (ORDER BY rc
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
            FROM (SELECT rc, count(*) AS cnt FROM cal GROUP BY rc)
        ), k WHERE cum >= k.rank_k
    )
    SELECT m.n_train,
           k.n_cal,
           CAST(count(*) AS BIGINT) AS n_test,
           q.q_cents,
           CAST(sum(CASE WHEN CAST(round(abs(y - (m.w * x + m.b)) * 100,
                    0) AS BIGINT) <= q.q_cents THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS coverage_ppm
    FROM base, m, k, q
    WHERE fold = 2
    GROUP BY m.n_train, k.n_cal, q.q_cents
    """,
    tags=("ml", "uncertainty", "conformal", "scale-path"),
)
def conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal interval around the OLS price-on-quantity
    regressor: fit on fold 0 (closed-form power sums), take the
    ceil((1-alpha)(n+1))-th smallest absolute calibration residual as
    the interval half-width (the finite-sample-valid split-conformal
    quantile), and report empirical coverage on the held-out fold —
    guaranteed >= 90% in expectation regardless of the price
    distribution.  Residuals quantize to integer cents before rank
    selection, so the order statistic and the coverage count are
    integer-exact across engines (the MWU/KS discipline).

    Scale shape: folds are modulo predicates fused into one scan; the
    fit is one aggregate broadcast back as literals; the calibration
    quantile collapses to distinct cents counts + an ordered_scan
    running sum (range repartition, never a single-task sort); the
    coverage pass is one more aggregate. No windows over raw facts."""
    from ..operators.rank import ordered_scan

    t = load(spark, sf_dir)
    base = t.lineitem.select(
        (F.col("l_orderkey") % 3).alias("fold"),
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    m = base.where(F.col("fold") == 0).agg(
        (F.covar_pop("y", "x") / F.var_pop("x")).alias("w"),
        (
            F.avg("y")
            - F.covar_pop("y", "x") / F.var_pop("x") * F.avg("x")
        ).alias("b"),
        F.count("*").alias("n_train"),
    )
    resid = F.round(
        F.abs(F.col("y") - (F.col("w") * F.col("x") + F.col("b"))) * 100, 0
    ).cast("long")
    cal = (
        base.where(F.col("fold") == 1)
        .crossJoin(F.broadcast(m))
        .select(resid.alias("rc"))
    )
    counts = cal.groupBy("rc").agg(F.count("*").alias("cnt"))
    scanned = ordered_scan(
        counts, ["rc"], running={"cum": "cnt"}, totals={"n_cal": "cnt"}
    )
    kq = scanned.withColumn(
        "rank_k",
        F.ceil(F.lit(CONFORMAL_LEVEL) * (F.col("n_cal") + 1)).cast("long"),
    )
    q = kq.where(F.col("cum") >= F.col("rank_k")).agg(
        F.min("rc").alias("q_cents"), F.max("n_cal").alias("n_cal")
    )
    test = (
        base.where(F.col("fold") == 2)
        .crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(q))
    )
    return test.groupBy("n_train", "n_cal", "q_cents").agg(
        F.count("*").alias("n_test"),
        F.expr(
            "CAST(sum(CASE WHEN CAST(round(abs(y - (w * x + b)) * 100, 0)"
            " AS BIGINT) <= q_cents THEN 1 ELSE 0 END)"
            " * 1000000 div count(*) AS BIGINT)"
        ).alias("coverage_ppm"),
    ).select(
        "n_train", "n_cal", "n_test", "q_cents", "coverage_ppm"
    )


# --------------------------------------------------------------------------
# Grouped K-fold assignment (leakage-safe cross-validation)
# --------------------------------------------------------------------------
#: fold count for the grouped split
_GKF_K = 4


@query(
    "group_kfold_counts",
    oracle=f"""
    WITH folds AS (
        SELECT doc_id, n_chars, source,
               ('0x' || substr(md5('gkf|' || source), 1, 8))::BIGINT
                   % {_GKF_K} AS fold
        FROM documents
    )
    SELECT CAST(fold AS INT) AS fold,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_groups,
           CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM folds GROUP BY fold
    """,
    tags=("ml", "split", "sampling"),
)
def group_kfold_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped K-fold assignment: every document lands in the fold of
    its SOURCE (content-hash of the group key), so all documents from
    one crawl/domain share a fold — the leakage-safe cross-validation
    split for corpus models, where a random per-document split lets
    near-duplicates from one source straddle train and validation.
    Complements `time_split_folds` (temporal leakage) with the
    group-leakage guard.

    Scale shape: the fold is a pure expression over the group key
    (md5 bucket, the repo's portable-hash convention — reproducible
    across engines, partitionings and reruns; no group table, no
    join); one map-side-combined groupBy rolls up per-fold counts."""
    t = load(spark, sf_dir)
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("gkf|"), F.col("source"))), 1, 8
            ),
            16, 10,
        ).cast("long")
        % _GKF_K
    )
    return (
        t.documents.select(
            fold.cast("int").alias("fold"), "source", "n_chars"
        )
        .groupBy("fold")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("source").cast("long").alias("n_groups"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )


# --------------------------------------------------------------------------
# isotonic regression calibration (round 9)
# --------------------------------------------------------------------------
_ISO_BINS = 100


@query(
    "isotonic_calibration_bins",
    # exact minimax characterization of weighted isotonic regression:
    # iso(i) = max_{j<=i} min_{k>=i} wavg(y[j..k]), computed over
    # integer prefix sums on the BINNED (100-row) frame — the grid is
    # bounded at 100x100 regardless of data size, every join is an
    # equi-join (the j fan-out is a sequence explode), and the interval
    # averages are fixed-shape doubles from exact integers.
    oracle=f"""
    WITH binned AS (
        SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r,
               ntile({_ISO_BINS}) OVER (
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ) AS bin
        FROM lineitem
    ),
    per AS (
        SELECT bin, count(*) AS n, sum(r)::BIGINT AS ret
        FROM binned GROUP BY bin
    ),
    pre AS (
        SELECT bin, n, ret,
               sum(n) OVER (ORDER BY bin) AS cn,
               sum(ret) OVER (ORDER BY bin) AS cr
        FROM per
    ),
    grid AS (
        SELECT k.bin AS k, k.cn AS nk, k.cr AS rk,
               unnest(range(1, k.bin + 1)) AS j
        FROM pre k
    ),
    a AS (
        SELECT g.j, g.k,
               (CAST(g.rk AS DOUBLE) - CAST(p.cr - p.ret AS DOUBLE))
               / (CAST(g.nk AS DOUBLE) - CAST(p.cn - p.n AS DOUBLE))
                   AS wavg
        FROM grid g JOIN pre p ON p.bin = g.j
    ),
    m AS (
        SELECT j, k AS i,
               min(wavg) OVER (
                   PARTITION BY j ORDER BY k DESC
                   ROWS UNBOUNDED PRECEDING) AS mn
        FROM a
    ),
    iso AS (SELECT i, max(mn) AS iso_rate FROM m GROUP BY i)
    SELECT p.bin, p.n, p.ret AS n_returned,
           round(CAST(p.ret AS DOUBLE) / p.n, 6) + 0.0 AS raw_rate,
           round(iso.iso_rate, 6) + 0.0 AS iso_rate
    FROM per p JOIN iso ON iso.i = p.bin
    """,
    tags=("ml", "calibration", "isotonic", "bounded-window"),
)
def isotonic_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic regression calibration (the PAVA fit every production
    probability calibrator offers next to Platt scaling), via the
    EXACT minimax characterization instead of the sequential
    pool-adjacent-violators loop: with per-bin integer (count, positive)
    prefix sums, iso(i) = max over j<=i of min over k>=i of the
    weighted average on [j..k] — a closed form a distributed engine
    evaluates with bounded joins, no iteration, no driver state.

    The curve: return rate as a function of the line's price percentile
    ({_ISO_BINS} global_ntile bins), monotone-increasing fit. Scale
    shape: one ordered_scan ntile over the fact table, then EVERYTHING
    runs on the {_ISO_BINS}-row binned frame (grid 100x100 via a
    sequence explode + equi-joins; windows partitioned by j or over
    the 100-row prefix — bounded by construction, registry-tagged)."""
    from pyspark.sql import Window as W

    from ..operators.rank import global_ntile

    t = load(spark, sf_dir)
    li = t.lineitem.select(
        "l_extendedprice", "l_orderkey", "l_linenumber",
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("r"),
    )
    binned = global_ntile(
        li, ["l_extendedprice", "l_orderkey", "l_linenumber"],
        _ISO_BINS, out="bin",
    )
    per = binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.sum("r").cast("long").alias("ret"),
    )
    wp = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    pre = per.select(
        "bin", "n", "ret",
        F.sum("n").over(wp).alias("cn"),
        F.sum("ret").over(wp).alias("cr"),
    ).persist()  # bounded 100-row frame, feeds the grid twice
    grid = pre.select(
        F.col("bin").alias("k"),
        F.col("cn").alias("nk"),
        F.col("cr").alias("rk"),
        F.explode(F.expr("sequence(1, bin)")).alias("j"),
    )
    a = grid.join(
        F.broadcast(
            pre.select(
                F.col("bin").alias("j"),
                (F.col("cn") - F.col("n")).alias("nj0"),
                (F.col("cr") - F.col("ret")).alias("rj0"),
            )
        ),
        "j",
    ).select(
        "j", "k",
        (
            (F.col("rk").cast("double") - F.col("rj0").cast("double"))
            / (F.col("nk").cast("double") - F.col("nj0").cast("double"))
        ).alias("wavg"),
    )
    wm = W.partitionBy("j").orderBy(F.col("k").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    m = a.select("j", F.col("k").alias("i"), F.min("wavg").over(wm).alias("mn"))
    iso = m.groupBy("i").agg(F.max("mn").alias("iso_rate"))
    return (
        per.join(iso, per.bin == iso.i)
        .select(
            "bin", "n",
            F.col("ret").alias("n_returned"),
            (F.round(F.col("ret").cast("double") / F.col("n"), 6) + 0.0)
            .alias("raw_rate"),
            (F.round(F.col("iso_rate"), 6) + 0.0).alias("iso_rate"),
        )
    )
