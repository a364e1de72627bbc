"""Every exported column helper in the functions API must EVALUATE on
a real frame — not just import. (A latent arity bug in language_id_col
survived precisely because nothing executed it; this is the net.)
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

import finanalyzer_spark.functions as fn


def test_every_column_helper_evaluates(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox and the dog", 3.5, dt.datetime(2026, 8, 1)),
            (2, "", None, dt.datetime(2026, 8, 2)),
            (3, "el perro y el gato en la casa", -1.0, dt.datetime(2026, 8, 3)),
        ],
        "id long, text string, x double, ts timestamp",
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 2.0]), (2, [0.5, 0.5, 0.5])],
        "id long, v array<float>",
    )

    text_cols = {
        "tokens": fn.tokens_col(F.col("text")),
        "n_tok": fn.token_count_col(F.col("text")),
        "n_bpe": fn.bpe_ish_token_count_col(F.col("text")),
        "avg_len": fn.avg_token_len_col(F.col("text")),
        "punct": fn.punct_ratio_col(F.col("text")),
        "stop": fn.stopword_ratio_col(F.col("text")),
        "lang": fn.language_id_col(F.col("text")),
        "fp": fn.fingerprint_col(F.col("text")),
        "sh": fn.shingle_hashes_col(F.col("text"), 3),
        "th": fn.token_hashes_col(F.col("text")),
        "simhash": fn.simhash_col(F.col("text"), bits=16),
        "nz": fn.null_to_zero(F.col("x")),
        "ymd": fn.date_ymd(F.col("ts")),
        "mm": fn.minmax_scale(F.col("x"), F.lit(-1.0), F.lit(3.5)),
    }
    sin_c, cos_c = fn.cyclical_encode(F.col("x"), 24.0)
    text_cols["sin"], text_cols["cos"] = sin_c, cos_c
    for f in fn.quality_features(F.col("text")).values():
        pass  # constructed fine
    rows = df.select(*[c.alias(k) for k, c in text_cols.items()]).collect()
    assert len(rows) == 3
    assert rows[0]["lang"] == "en" and rows[2]["lang"] == "es"
    assert rows[1]["n_tok"] == 0 and rows[1]["nz"] == 0.0

    vec = emb.select(
        fn.dot_col(F.col("v"), F.col("v")).alias("dot"),
        fn.norm_col(F.col("v")).alias("norm"),
        fn.cosine_col(F.col("v"), F.col("v")).alias("cos"),
    ).collect()
    assert abs(vec[0]["dot"] - 5.0) < 1e-6
    assert abs(vec[0]["cos"] - 1.0) < 1e-6


def test_udtf_chunk_document_lateral(spark):
    """Arrow UDTF: LATERAL expansion matches a hand-computed split."""
    from finanalyzer_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "a b c d e"), (2, "x")], "doc_id long, text string"
    ).createOrReplaceTempView("udtf_test_src")
    rows = spark.sql(
        "SELECT doc_id, c.* FROM udtf_test_src, "
        "LATERAL chunk_document(text, 2) c ORDER BY doc_id, chunk_no"
    ).collect()
    got = [(r["doc_id"], r["chunk_no"], r["n_tokens"], r["chunk"]) for r in rows]
    assert got == [
        (1, 0, 2, "a b"),
        (1, 1, 2, "c d"),
        (1, 2, 1, "e"),
        (2, 0, 1, "x"),
    ]


def test_observe_metrics_without_rescan(spark):
    """df.observe collects row/sum metrics as a side effect of the ONE
    action — at 100 TB this replaces the count()-then-write double
    scan every naive pipeline pays."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from finanalyzer_spark.catalog import load

    from .conftest import SF_DIR

    obs = Observation("ingest_metrics")
    df = (
        load(spark, SF_DIR)
        .lineitem.observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("l_quantity").alias("total_qty"),
        )
        .where(F.col("l_quantity") >= 0)
    )
    df.write.format("noop").mode("overwrite").save()  # the one action
    got = obs.get
    want = load(spark, SF_DIR).lineitem.agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    ).collect()[0]
    assert got["n_rows"] == want["n"]
    assert got["total_qty"] == want["q"]


def test_registry_outputs_are_flat_scalar_columns(spark):
    """Driver-canonicalizer contract (VERDICT r4 'What's wrong #1'):
    the driver sorts result cells with pandas (sort_values ->
    Categorical -> hash), which CRASHES on ndarray/map/struct cells —
    so no registry query may emit a top-level array/map/struct/binary
    column. Flatten (array_join / explode) instead. This guard runs
    schema-only: no query executes."""
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        MapType,
        StructType,
    )

    from finanalyzer_spark.plans import REGISTRY

    offenders = []
    for name, ent in REGISTRY.items():
        df = ent.fn(spark, "/root/testdata/sf0.001")
        for f in df.schema.fields:
            if isinstance(
                f.dataType, (ArrayType, MapType, StructType, BinaryType)
            ):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, offenders
