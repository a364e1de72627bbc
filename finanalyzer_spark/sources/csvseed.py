"""CSV registry seed — S1.

Reference: get_tickers reads tickers.csv into (Ticker, Name, Exchange)
tuples with pandas (finanalyzer/database/dataAcquisition.py:26-33,
constants.py:11). Spark-first: schema-declared csv read (never
inferSchema in production — it triggers an extra full scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TICKERS_SCHEMA = T.StructType(
    [
        T.StructField("Ticker", T.StringType(), False),
        T.StructField("Name", T.StringType(), True),
        T.StructField("Exchange", T.StringType(), True),
    ]
)


def read_tickers_csv(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.schema(TICKERS_SCHEMA)
        .option("header", True)
        .option("sep", ",")
        .csv(path)
        .select("Ticker", "Name", "Exchange")
    )
