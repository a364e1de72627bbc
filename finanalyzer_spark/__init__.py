"""finanalyzer_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query & data-processing surface of
the reference system (HelloIAmRomain/finanalyzer — a SQLite-backed
financial ETL app) as an idiomatic PySpark engine: DataFrame/SQL plans
optimized by Catalyst, Parquet columnar storage, Structured Streaming
for incremental feeds, plus large-scale LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Layout:
    session      SparkSession factory tuned for local[N] and cluster use
    catalog      table loaders / temp-view registration for the test data
    plans        the query registry — every operator from SURVEY.md §2 as a
                 (PySpark callable, DuckDB oracle SQL) pair
    operators    reusable relational operators (dedup, as-of join, merge, ...)
    functions    scalar helpers (dates, coercion, cyclical encodings)
    pipeline     the reference's ETL jobs re-expressed as Spark jobs
    streaming    Structured Streaming ops over the events table
"""

__version__ = "0.1.0"
