"""DuckDB oracle comparison harness — mirrors the driver's check:
row count + schema (column names) + order-insensitive value hash.

Canonicalization: columns sorted by name, every cell rendered to a
stable string (floats via %.9g after round-trip, timestamps via ISO),
rows sorted. Two results match iff the sorted row strings are equal.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import numpy as np
import pandas as pd

from finanalyzer_spark.catalog import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0.0"  # fold -0.0 and +0.0 together
        return repr(v)  # shortest round-trip — exact, no tolerance
    if isinstance(v, (np.floating,)):
        return _cell(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[str]:
    cols = sorted(df.columns)
    df = df[cols]
    out = []
    for row in df.itertuples(index=False, name=None):
        rendered = []
        for v in row:
            if v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
                rendered.append("∅" if v is pd.NaT else _cell(v))
            elif v is None or (not isinstance(v, (list, np.ndarray)) and pd.isna(v)):
                rendered.append("∅")
            else:
                rendered.append(_cell(v))
        out.append("|".join(rendered))
    return sorted(out)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> tuple[bool, str]:
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return False, (
            f"schema mismatch: spark={sorted(spark_pdf.columns)} "
            f"duck={sorted(duck_pdf.columns)}"
        )
    if len(spark_pdf) != len(duck_pdf):
        return False, f"row count mismatch: spark={len(spark_pdf)} duck={len(duck_pdf)}"
    s_rows = canonical_rows(spark_pdf)
    d_rows = canonical_rows(duck_pdf)
    if s_rows != d_rows:
        diffs = [
            f"  spark: {a}\n  duck : {b}"
            for a, b in zip(s_rows, d_rows)
            if a != b
        ][:5]
        n_bad = sum(1 for a, b in zip(s_rows, d_rows) if a != b)
        return False, f"{n_bad}/{len(s_rows)} rows differ; first diffs:\n" + "\n".join(diffs)
    return True, "ok"
