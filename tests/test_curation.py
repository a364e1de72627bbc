"""Unit tests for the corpus-curation primitives (plans/curation.py)
on edge cases the sf0.01 oracle runs can't reach: short/empty docs in
the n-gram builder, boundary repetition gates, and benchmark-doc
exclusion in the decontamination sweep."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from finanalyzer_spark.operators.text import tokens_col
from finanalyzer_spark.plans.curation import (
    BENCHMARK_MOD,
    DECONTAM_K,
    PII_PATTERN,
    _ngrams,
)


def _grams_of(spark, text: str, k: int) -> list[str]:
    df = spark.createDataFrame([Row(text=text)])
    return df.select(
        _ngrams(tokens_col(F.col("text")), k).alias("g")
    ).collect()[0]["g"]


def test_ngrams_basic(spark):
    assert _grams_of(spark, "a b c d", 2) == ["a b", "b c", "c d"]
    assert _grams_of(spark, "a b c d", 3) == ["a b c", "b c d"]


def test_ngrams_short_and_empty_docs_yield_empty(spark):
    # the guard matters: sequence(0, negative) would count DOWN and
    # fabricate garbage grams for docs shorter than k
    assert _grams_of(spark, "solo", 2) == []
    assert _grams_of(spark, "two tokens", 3) == []
    assert _grams_of(spark, "", 2) == []
    assert _grams_of(spark, "   ", 2) == []


def test_ngrams_exact_length_doc(spark):
    assert _grams_of(spark, "x y", 2) == ["x y"]
    assert _grams_of(spark, "x y z", 3) == ["x y z"]


def test_pii_pattern_redaction_counts(spark):
    rows = [
        Row(s="Customer#000000042"),   # one 9-digit run
        Row(s="call 12 or 9 or 345"),  # two runs of >=2; lone 9 kept
        Row(s="no digits here"),
        Row(s=""),
    ]
    df = spark.createDataFrame(rows)
    out = df.select(
        F.regexp_count("s", F.lit(PII_PATTERN)).alias("n"),
        F.regexp_replace("s", PII_PATTERN, "<NUM>").alias("red"),
    ).collect()
    assert [r["n"] for r in out] == [1, 2, 0, 0]
    assert out[0]["red"] == "Customer#<NUM>"
    assert out[1]["red"] == "call <NUM> or 9 or <NUM>"
    assert out[2]["red"] == "no digits here"


def test_decontamination_excludes_benchmark_docs(spark, sf_dir):
    """Benchmark docs must appear on neither side of the report: not in
    n_docs (they aren't training data) and not as contamination hits
    (they'd trivially share every span with themselves)."""
    from finanalyzer_spark.catalog import load
    from finanalyzer_spark.plans.curation import benchmark_decontamination

    t = load(spark, sf_dir)
    total = t.documents.count()
    n_bench = t.documents.where(
        F.col("doc_id") % BENCHMARK_MOD == 0
    ).count()
    out = benchmark_decontamination(spark, sf_dir)
    agg = out.agg(
        F.sum("n_docs").alias("docs"), F.sum("n_contaminated").alias("hits")
    ).collect()[0]
    assert n_bench > 0, "fixture must contain benchmark docs"
    assert agg["docs"] == total - n_bench
    assert agg["hits"] <= agg["docs"]


def test_decontamination_flags_known_overlap(spark):
    """A doc sharing a K-gram with a benchmark doc is flagged; a
    disjoint doc is not."""
    import os
    import tempfile

    from finanalyzer_spark.plans.curation import benchmark_decontamination

    bench_text = "alpha beta gamma delta"
    dirty_text = "zzz alpha beta gamma qqq"  # shares 3-gram "alpha beta gamma"
    clean_text = "one two three four five"
    assert DECONTAM_K == 3
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text=bench_text, lang="en", source="bench",
                n_chars=len(bench_text)),
            Row(doc_id=1, text=dirty_text, lang="en", source="s",
                n_chars=len(dirty_text)),
            Row(doc_id=2, text=clean_text, lang="en", source="s",
                n_chars=len(clean_text)),
        ]
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        rows = {
            r["source"]: r
            for r in benchmark_decontamination(spark, d).collect()
        }
    assert rows["s"]["n_docs"] == 2
    assert rows["s"]["n_contaminated"] == 1


# --------------------------------------------------------------------------
# property: the zip-of-slices n-gram builder matches a plain-Python
# reference on arbitrary token streams (the builder was rewritten for
# performance — see plans/curation.py::_ngrams — so pin its semantics)
# --------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_texts = st.lists(
    st.text(alphabet="abcxyz", min_size=1, max_size=4),
    min_size=0,
    max_size=12,
).map(" ".join)


@given(text=_texts, k=st.integers(min_value=2, max_value=4))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ngrams_matches_python_reference(spark, text, k):
    toks = text.split()
    expect = [
        " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
    ]
    assert _grams_of(spark, text, k) == expect


def test_luhn_detector_against_known_numbers(spark):
    """The Luhn detector expression inside luhn_pii_audit verified
    against externally-known valid card test numbers (the standard
    ISO/IEC 7812 examples published for payment-gateway sandboxes) and
    single-digit corruptions of each — ground truth independent of the
    query's own generator."""
    import pandas as pd
    from pyspark.sql import functions as F

    valid = [
        "4532015112830366",  # Visa test number
        "4539578763621486",  # Visa
        "5425233430109903",  # Mastercard
        "2223000048410010",  # Mastercard 2-series
        "6011000991300009",  # Discover
    ]
    corrupt = [v[:-1] + str((int(v[-1]) + 5) % 10) for v in valid]
    df = spark.createDataFrame(
        pd.DataFrame({"pan": valid + corrupt})
    )
    expr = (
        "aggregate(sequence(1, 16), 0, (acc, i) -> acc + "
        "CASE WHEN (17 - i) % 2 = 0 "
        "THEN CASE WHEN cast(substring(pan, i, 1) AS INT) * 2 > 9 "
        "     THEN cast(substring(pan, i, 1) AS INT) * 2 - 9 "
        "     ELSE cast(substring(pan, i, 1) AS INT) * 2 END "
        "ELSE cast(substring(pan, i, 1) AS INT) END) % 10 = 0"
    )
    got = {r["pan"]: r["ok"] for r in
           df.select("pan", F.expr(expr).alias("ok")).collect()}
    for v in valid:
        assert got[v] is True, v
    for c in corrupt:
        assert got[c] is False, c
