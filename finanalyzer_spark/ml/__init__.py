"""Spark ML feature-engineering layer (SURVEY.md §2.11)."""

from .features import build_feature_pipeline, scaled_price_by_priority  # noqa: F401
