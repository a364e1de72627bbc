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
    from pyspark.ml.evaluation import RegressionEvaluator
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
    preds = model.transform(assembled)
    mae = RegressionEvaluator(
        labelCol=y, predictionCol="prediction", metricName="mae"
    ).evaluate(preds)
    rmse = RegressionEvaluator(
        labelCol=y, predictionCol="prediction", metricName="rmse"
    ).evaluate(preds)
    return spark.createDataFrame(
        [
            (
                float(model.coefficients[0]),
                float(model.intercept),
                float(mae),
                float(rmse),
                int(model.summary.numInstances),
            )
        ],
        "slope double, intercept double, mae double, rmse double, n long",
    )
