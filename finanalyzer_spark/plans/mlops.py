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
