"""Column-function API — the engine's scalar/array function surface.

Everything here is a pure `Column -> Column` (or Column-producing)
helper built on `pyspark.sql.functions`, usable in any select/filter —
the Spark-first analog of the reference's scattered scalar helpers
(date math in findatabase.py:108-110, null→0 coercion in
dataAcquisition.py:59-66, trig encodings in the vendored notebook).

Grouped re-exports; implementations live with their operator family.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# text analysis (operators/text.py)
from ..operators.text import (  # noqa: F401
    avg_token_len_col,
    bpe_ish_token_count_col,
    fingerprint_col,
    language_id_col,
    punct_ratio_col,
    quality_features,
    stopword_ratio_col,
    token_count_col,
    tokens_col,
)

# vector math (operators/similarity.py)
from ..operators.similarity import cosine_col, dot_col, norm_col  # noqa: F401

# dedup fingerprints (operators/dedup.py)
from ..operators.dedup import (  # noqa: F401
    shingle_hashes_col,
    simhash_col,
    token_hashes_col,
)


def null_to_zero(c: Column) -> Column:
    """The reference's missing-fundamentals sentinel (F5):
    absent/None → 0.0, never NULL (dataAcquisition.py:59-66)."""
    return F.coalesce(c.cast("double"), F.lit(0.0))


def cyclical_encode(c: Column, period: float) -> tuple[Column, Column]:
    """(sin, cos) cyclical features (F6;
    plot_cyclical_feature_engineering.py:354-359)."""
    angle = c / F.lit(period) * 2 * math.pi
    return F.sin(angle), F.cos(angle)


def minmax_scale(c: Column, lo: Column, hi: Column) -> Column:
    """(x - min) / (max - min) given precomputed bounds (F7)."""
    return (c - lo) / F.when(hi != lo, hi - lo).otherwise(F.lit(1.0))


def date_ymd(c: Column) -> Column:
    """Timestamp/date → 'yyyy-MM-dd' string (F1/F3 — the reference
    stores dates as ISO strings, which order identically)."""
    return F.date_format(c, "yyyy-MM-dd")
