"""Spark ML pipeline wiring — the reference's scikit-learn
feature-engineering surface re-expressed as `pyspark.ml` stages.

Reference (vendored notebook, finanalyzer/regressors/to_review/
plot_cyclical_feature_engineering.py): ColumnTransformer/make_pipeline
composition (:204-214,634-642), OrdinalEncoder/OneHotEncoder (:201,264),
MinMaxScaler (:259,271). Spark mapping: `Pipeline` of StringIndexer →
OneHotEncoder → VectorAssembler → MinMaxScaler.

Scale notes: every stage is an estimator/transformer over DataFrames —
fit() runs one aggregation pass (distinct labels / min-max), transform()
is narrow (no shuffle). The fitted model broadcasts its tiny state.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import (
    MinMaxScaler,
    OneHotEncoder,
    StringIndexer,
    VectorAssembler,
)
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_feature_pipeline(
    categorical_col: str = "o_orderpriority",
    numeric_col: str = "o_totalprice",
) -> Pipeline:
    """StringIndexer → OneHotEncoder → assemble → MinMaxScaler.

    The indexer replaces the reference's OrdinalEncoder(categories=...),
    the encoder its OneHotEncoder, and the scaler its MinMaxScaler —
    composed exactly like its make_pipeline/ColumnTransformer."""
    return Pipeline(
        stages=[
            StringIndexer(
                inputCol=categorical_col,
                outputCol="cat_idx",
                stringOrderType="alphabetAsc",  # deterministic, data-independent
            ),
            OneHotEncoder(inputCol="cat_idx", outputCol="cat_onehot"),
            VectorAssembler(inputCols=[numeric_col], outputCol="num_vec"),
            MinMaxScaler(inputCol="num_vec", outputCol="num_scaled"),
        ]
    )


def scaled_price_by_priority(orders: DataFrame) -> DataFrame:
    """Fit + transform the pipeline on `orders`, then aggregate the
    min-max-scaled price per priority class — a scalar surface the
    DuckDB oracle reproduces as (x - min) / (max - min)."""
    model: PipelineModel = build_feature_pipeline().fit(orders)
    out = model.transform(orders).withColumn(
        "scaled_price", vector_to_array("num_scaled").getItem(0)
    )
    return (
        out.groupBy("o_orderpriority")
        .agg(
            F.round(F.avg("scaled_price"), 6).alias("avg_scaled_price"),
            F.count("*").alias("n_orders"),
            F.max("cat_idx").cast("long").alias("cat_index"),
        )
    )


def fit_ols(df: DataFrame, x: str, y: str) -> DataFrame:
    """Train pyspark.ml LinearRegression (unregularized, solver=normal
    → exact OLS) on one feature; return a 1-row DataFrame of
    (slope, intercept, n). Closed form slope = covar/var means the
    TRAINING RUN itself is oracle-checkable against SQL
    regr_slope/regr_intercept — the reference's Ridge ambition
    (plot_cyclical_feature_engineering.py:201-238) with a provable
    fit."""
    from pyspark.ml.regression import LinearRegression

    spark = df.sparkSession
    assembled = VectorAssembler(inputCols=[x], outputCol="_features").transform(
        df.select(F.col(x).cast("double"), F.col(y).cast("double"))
    )
    model = LinearRegression(
        featuresCol="_features", labelCol=y, regParam=0.0, solver="normal"
    ).fit(assembled)
    # numInstances comes from the training summary — no second pass
    return spark.createDataFrame(
        [
            (
                float(model.coefficients[0]),
                float(model.intercept),
                int(model.summary.numInstances),
            )
        ],
        "slope double, intercept double, n long",
    )


def fit_ridge_with_eval(df: DataFrame, x: str, y: str, reg_param: float) -> DataFrame:
    """Train L2-regularized LinearRegression (ridge; solver=normal,
    standardization=False so the penalty hits raw coefficients) and
    evaluate MAE/RMSE on the training frame with RegressionEvaluator —
    the reference's regularized-regressor + error-metric ambition
    (plot_cyclical_feature_engineering.py:201-238).

    With one feature the solution is closed-form —
    slope = covar_pop(y,x) / (var_pop(x) + λ/σy_pop), intercept =
    ȳ − slope·x̄ (intercept unregularized; Spark's WeightedLeastSquares
    divides the penalty by the label's population stddev) — so training
    AND evaluation are oracle-checkable in SQL.

    Scale: the normal-equation solver aggregates X'X / X'y moments in
    one mergeable pass; the evaluator is two aggregations over the
    prediction frame. Nothing driver-side."""
    from pyspark.ml.regression import LinearRegression

    spark = df.sparkSession
    assembled = VectorAssembler(inputCols=[x], outputCol="_features").transform(
        df.select(F.col(x).cast("double"), F.col(y).cast("double"))
    )
    model = LinearRegression(
        featuresCol="_features",
        labelCol=y,
        regParam=reg_param,
        elasticNetParam=0.0,
        solver="normal",
        standardization=False,
    ).fit(assembled)
    # MAE and RMSE in ONE pass over the prediction frame (mean absolute
    # / root-mean-square residual, the exact quantities
    # RegressionEvaluator computes) — evaluating two RegressionEvaluator
    # metrics re-executed the scan+transform pipeline per metric (r12:
    # two full passes -> one).
    resid = F.col(y) - F.col("prediction")
    ev = (
        model.transform(assembled)
        .agg(
            F.avg(F.abs(resid)).alias("_mae"),
            F.sqrt(F.avg(resid * resid)).alias("_rmse"),
        )
        .first()
    )
    return spark.createDataFrame(
        [
            (
                float(model.coefficients[0]),
                float(model.intercept),
                float(ev["_mae"]),
                float(ev["_rmse"]),
                int(model.summary.numInstances),
            )
        ],
        "slope double, intercept double, mae double, rmse double, n long",
    )


# --------------------------------------------------------------------------
# §2.11 — spline / polynomial / Nyström features (reference
# plot_cyclical_feature_engineering.py:431-441,615-627,662-669).
# Each generator emits BOTH the Spark Column and the DuckDB SQL
# expression from the same literals, so the constructed features are
# exactly oracle-checkable — the same shared-constants trick the LSH
# planes and minhash parameters use.
# --------------------------------------------------------------------------


def bspline3(t):
    """Uniform cubic B-spline kernel B3 as a Spark Column over |t|:
    (4 − 6t² + 3|t|³)/6 on [0,1), (2 − |t|)³/6 on [1,2), 0 beyond."""
    a = F.abs(t)
    return (
        F.when(a < 1, (F.lit(4.0) - 6.0 * a * a + 3.0 * a * a * a) / 6.0)
        .when(a < 2, F.pow(F.lit(2.0) - a, 3) / 6.0)
        .otherwise(F.lit(0.0))
    )


def periodic_spline_cols(
    x, period: float, n_splines: int
) -> list:
    """Periodic uniform cubic B-spline basis (the reference's
    periodic_spline_transformer, :431-441): center c_j = j·h with
    h = period/n_splines; basis_j(x) = B3(wrap(x − c_j)/h) where wrap
    maps into [−period/2, period/2). All whole-stage-codegen arithmetic."""
    h = period / n_splines
    out = []
    for j in range(n_splines):
        c = j * h
        d = F.pmod(x - F.lit(c) + F.lit(period / 2.0), F.lit(period)) - F.lit(
            period / 2.0
        )
        out.append(bspline3(d / F.lit(h)))
    return out


def periodic_spline_sql(x_expr: str, period: float, n_splines: int) -> list[str]:
    """DuckDB twin of `periodic_spline_cols` — identical literals,
    identical piecewise polynomial."""
    h = period / n_splines
    out = []
    for j in range(n_splines):
        c = j * h
        d = (
            f"(((({x_expr}) - {c!r} + {period / 2.0!r}) % {period!r} + {period!r})"
            f" % {period!r} - {period / 2.0!r})"
        )
        t = f"(abs({d}) / {h!r})"
        out.append(
            f"(CASE WHEN {t} < 1 THEN (4.0 - 6.0*{t}*{t} + 3.0*{t}*{t}*{t})/6.0 "
            f"WHEN {t} < 2 THEN pow(2.0 - {t}, 3)/6.0 ELSE 0.0 END)"
        )
    return out


def nystroem_constants(
    n_landmarks: int = 4, dim: int = 64, gamma: float = 0.5, seed: int = 7
) -> tuple[list[list[float]], list[list[float]]]:
    """Deterministic Nyström factorization (reference :662-669 uses
    sklearn Nystroem): landmark vectors L from a seeded RNG, and the
    transform matrix W = K_mm^(−1/2) computed once in double precision
    on the m×m landmark kernel — m is tiny (the whole point of
    Nyström), so this is driver-side constant-folding, never a
    distributed operation. Both W and L are interpolated as literals
    into the Spark plan AND the oracle SQL, making the feature map
    φ(x) = W · k(x, L) exactly twinned."""
    import random

    import numpy as np

    rng = random.Random(seed)
    # unit-normalized landmarks: the embedding corpus is unit-norm, so
    # raw gaussian landmarks (norm ≈ √dim) would push every kernel value
    # to exp(−γ·dim) ≈ 0 and collapse the feature map
    raw = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_landmarks)]
    L = []
    for row in raw:
        nrm = sum(v * v for v in row) ** 0.5
        L.append([v / nrm for v in row])
    Lm = np.array(L, dtype=np.float64)
    sq = ((Lm[:, None, :] - Lm[None, :, :]) ** 2).sum(axis=2)
    K = np.exp(-gamma * sq)
    vals, vecs = np.linalg.eigh(K)
    vals = np.maximum(vals, 1e-12)
    W = vecs @ np.diag(vals**-0.5) @ vecs.T
    # round the literals so both engines parse identical doubles
    return (
        [[float(round(v, 12)) for v in row] for row in L],
        [[float(round(v, 12)) for v in row] for row in W],
    )


def nystroem_feature_cols(vec_col, L, W, gamma: float) -> list:
    """φ(x) = W · [exp(−γ‖x−l_1‖²), …, exp(−γ‖x−l_m‖²)] as pure Spark
    expressions (zip_with + aggregate; no UDF). ``vec_col`` is a column
    NAME: each feature is one parsed SQL string (operators/sqlexpr
    discipline, r12 — the literal landmark arrays cost ~100 py4j round
    trips per kernel column when built element-by-element)."""
    from ..operators.sqlexpr import arr_dlit, dlit

    kx = []
    for l in L:
        sq = (
            f"aggregate(zip_with({vec_col}, {arr_dlit(l)}, "
            "(_lx, _ly) -> (CAST(_lx AS DOUBLE) - _ly)"
            " * (CAST(_lx AS DOUBLE) - _ly)), "
            "0.0D, (_lacc, _lv) -> _lacc + _lv)"
        )
        kx.append(f"exp(-{dlit(gamma)} * {sq})")
    feats = []
    for row in W:
        acc = "0.0D"
        for w, k in zip(row, kx):
            acc = f"{acc} + {dlit(w)} * {k}"
        feats.append(F.expr(acc))
    return feats


def nystroem_landmark_ctes(L) -> str:
    """`consts` CTE exposing each landmark as a DOUBLE[] literal column
    (l0, l1, …) — DuckDB lambdas capture these for the exact
    dimension-by-dimension squared-distance fold the Spark side runs."""
    cols = ", ".join(
        f"[{', '.join(repr(float(v)) for v in row)}]::DOUBLE[] AS l{i}"
        for i, row in enumerate(L)
    )
    return f"consts AS (SELECT {cols})"


def nystroem_kernel_sql(vec_expr: str, n_landmarks: int, dim: int, gamma: float
                        ) -> list[str]:
    """k(x, l_j) columns for the DuckDB twin; requires the consts CTE
    (nystroem_landmark_ctes) cross-joined in."""
    return [
        f"exp(-{gamma!r} * list_sum(list_transform(range({dim}), "
        f"i -> ({vec_expr}[i+1] - l{j}[i+1]) * ({vec_expr}[i+1] - l{j}[i+1]))))"
        for j in range(n_landmarks)
    ]
