"""Text-analysis queries over `documents` — the LLM-data-pipeline
surface (BASELINE.json north star; SURVEY.md §7 Phase 5).

All hot-path expressions are JVM-side built-ins (split/regexp/md5/
length) — no Python UDFs — so they stay inside whole-stage codegen and
scale linearly with a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.text import (
    bpe_ish_token_count_col,
    punct_ratio_col,
    quality_features,
    token_count_col,
    fingerprint_col,
    stopword_ratio_col,
)
from ..operators.rank import ordered_scan
from .registry import query


@query(
    "text_token_stats",
    oracle=r"""
    SELECT doc_id,
           n_chars,
           length(text) AS n_chars_check,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
           len(regexp_extract_all(text,
               e'\'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+'))
               AS n_bpe_tokens
    FROM documents
    """,
    tags=("text", "tokenize"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting both ways: whitespace split and the GPT-2-style
    pre-tokenizer regex (contractions / letter runs / digit runs /
    punctuation runs) — the cheap token-budget estimator for LLM
    corpora. Both are codegen'd regex expressions; the same pattern
    runs in DuckDB's RE2 for the oracle."""
    t = load(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        "n_chars",
        F.length("text").cast("long").alias("n_chars_check"),
        token_count_col(F.col("text")).alias("n_tokens"),
        bpe_ish_token_count_col(F.col("text")).alias("n_bpe_tokens"),
    )


@query(
    "text_quality_score",
    oracle="""
    SELECT doc_id,
           round(CASE WHEN length(text) = 0 THEN 0.0
                 ELSE length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                      * 1.0 / length(text) END, 6) AS punct_ratio,
           round(CASE WHEN trim(text) = '' THEN 0.0
                 ELSE len(list_filter(string_split_regex(trim(text), '\\s+'),
                                      w -> w IN ('the', 'a', 'of', 'and', 'to', 'in')))
                      * 1.0 / len(string_split_regex(trim(text), '\\s+')) END, 6)
               AS stopword_ratio,
           round(CASE WHEN trim(text) = '' THEN 0.0
                 ELSE length(trim(text)) * 1.0
                      / len(string_split_regex(trim(text), '\\s+')) END, 4)
               AS avg_token_len
    FROM documents
    """,
    tags=("text", "quality"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: punctuation ratio, stopword ratio, average
    token length — the standard cheap pre-filters for LLM corpora."""
    t = load(spark, sf_dir)
    feats = quality_features(F.col("text"))
    return t.documents.select(
        "doc_id",
        F.round(feats["punct_ratio"], 6).alias("punct_ratio"),
        F.round(feats["stopword_ratio"], 6).alias("stopword_ratio"),
        F.round(feats["avg_token_len"], 4).alias("avg_token_len"),
    )


@query(
    "text_langid_agreement",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           round(avg(CASE WHEN trim(text) = '' THEN 0.0
                 ELSE len(list_filter(string_split_regex(trim(text), '\\s+'),
                                      w -> w IN ('the', 'a', 'of', 'and', 'to', 'in')))
                      * 1.0 / len(string_split_regex(trim(text), '\\s+')) END), 6)
               AS avg_en_stopword_ratio
    FROM documents
    GROUP BY lang
    """,
    tags=("text", "langid"),
)
def text_langid_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic signal: English-stopword density per
    declared language (the n-gram-profile classifier lives in
    operators.text.language_id as the non-oracle scale path)."""
    t = load(spark, sf_dir)
    return t.documents.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(stopword_ratio_col(F.col("text"))), 6).alias(
            "avg_en_stopword_ratio"
        ),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id, md5(text) AS fp
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 — byte-stable across engines)."""
    t = load(spark, sf_dir)
    return t.documents.select("doc_id", fingerprint_col(F.col("text")).alias("fp"))


# --------------------------------------------------------------------------
# ext — corpus TF-IDF top terms: explode → two aggregations → score.
# The classic "what characterizes this corpus" text op at any scale
# --------------------------------------------------------------------------
@query(
    "tfidf_top_terms",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM toks WHERE term <> '' GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*) AS n_docs FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents)
    SELECT term, n_docs,
           round(sum(tf * ln(n.n / n_docs)), 4) AS total_tfidf
    FROM tf JOIN dfreq USING (term) CROSS JOIN n
    GROUP BY term, n_docs, n.n
    ORDER BY total_tfidf DESC, term
    LIMIT 20
    """,
    tags=("text", "tfidf"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus terms by summed TF-IDF. Shuffles carry (doc, term)
    then (term) aggregates — both partial-aggregated; the doc count
    joins in as a broadcast scalar. Explode stays in codegen (no UDF
    tokenizer)."""
    t = load(spark, sf_dir)
    docs = t.documents
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("n_docs"))
    n = docs.agg(F.count("*").alias("n"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .groupBy("term", "n_docs")
        .agg(
            F.round(
                F.sum(F.col("tf") * F.log(F.col("n") / F.col("n_docs"))), 4
            ).alias("total_tfidf")
        )
        .orderBy(F.col("total_tfidf").desc(), "term")
        .limit(20)
    )


# --------------------------------------------------------------------------
# ext — end-to-end corpus cleaning: exact-dedup survivor selection +
# quality thresholds + language allowlist in ONE composed plan — the
# standard LLM pre-training filter chain, reported per language
# --------------------------------------------------------------------------
@query(
    "clean_corpus_stats",
    oracle=r"""
    WITH dedup AS (
        SELECT *, row_number() OVER (
            PARTITION BY md5(text) ORDER BY doc_id
        ) AS rn
        FROM documents
    ),
    scored AS (
        SELECT doc_id, lang, n_chars,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
               CASE WHEN length(text) = 0 THEN 0.0
                    ELSE length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                         * 1.0 / length(text) END AS punct_ratio
        FROM dedup WHERE rn = 1
    )
    SELECT lang,
           count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars,
           round(avg(n_tokens), 4) AS avg_tokens
    FROM scored
    WHERE n_tokens >= 5 AND punct_ratio <= 0.2
      AND lang IN ('en', 'fr', 'de', 'es')
    GROUP BY lang
    """,
    tags=("text", "cleaning", "pipeline"),
)
def clean_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The filter chain composes into ONE Catalyst plan: dedup window,
    quality expressions, language filter, and aggregation share a
    single pass over the corpus — no intermediate materialization.
    (Near-dup clustering chains in front via dedup_components when
    exact dedup isn't enough.)"""
    from pyspark.sql import Window as W

    t = load(spark, sf_dir)
    rn = F.row_number().over(W.partitionBy(F.md5("text")).orderBy("doc_id"))
    kept = (
        t.documents.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            token_count_col(F.col("text")).alias("n_tokens"),
            punct_ratio_col(F.col("text")).alias("punct_ratio"),
        )
    )
    return (
        kept.where(
            (F.col("n_tokens") >= 5)
            & (F.col("punct_ratio") <= 0.2)
            & F.col("lang").isin("en", "fr", "de", "es")
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
    )


# --------------------------------------------------------------------------
# ext — sequence packing for training: assign docs to token-budget
# batches by running total over a deterministic order — the
# shuffle-once, window-once form of greedy packing
# --------------------------------------------------------------------------
@query(
    "pack_token_batches",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, doc_id % 8 AS shard,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT shard, doc_id, n_tokens,
               ((sum(n_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - 1) // 512)::BIGINT AS local_batch
        FROM toks
    )
    SELECT shard, local_batch, count(*) AS n_docs,
           sum(n_tokens)::BIGINT AS total_tokens
    FROM packed
    GROUP BY shard, local_batch
    """,
    tags=("text", "packing", "training-prep"),
)
def pack_token_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget batch assignment (512-token budget), SHARDED:
    cumulative token count per (shard = doc_id % 8) over doc order,
    integer-divided into local batch ids — greedy packing's
    budget-overflow-by-one-doc bound per batch, and the running-total
    window parallelizes across shards (never a global single-partition
    ORDER BY). A production corpus raises the shard count with the
    cluster; the arithmetic is unchanged."""
    from pyspark.sql import Window as W

    t = load(spark, sf_dir)
    toks = t.documents.select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        token_count_col(F.col("text")).alias("n_tokens"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = toks.withColumn(
        "local_batch",
        F.floor((F.sum("n_tokens").over(w) - 1) / F.lit(512)),
    )
    return packed.groupBy("shard", "local_batch").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


# --------------------------------------------------------------------------
# ext — heuristic language-ID confusion matrix: the stopword-profile
# argmax classifier (operators/text.language_id_col) vs the declared
# lang column. Oracle replicates the argmax fold (ties → first
# profile order) in plain CASE logic.
# --------------------------------------------------------------------------
_LANGID_PROFILES = {
    "en": ("the", "and", "of", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "en"),
    "fr": ("le", "la", "de", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist", "von"),
}


def _langid_score_sql(sw: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in sw)
    return (
        "CASE WHEN len(t) = 0 THEN 0.0 "
        f"ELSE len(list_filter(t, w -> w IN ({inlist}))) * 1.0 / len(t) END"
    )


@query(
    "langid_confusion",
    oracle=rf"""
    WITH toks AS (
        SELECT lang,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\s+') END AS t
        FROM documents
    ),
    scored AS (
        SELECT lang,
               {_langid_score_sql(_LANGID_PROFILES["en"])} AS s_en,
               {_langid_score_sql(_LANGID_PROFILES["es"])} AS s_es,
               {_langid_score_sql(_LANGID_PROFILES["fr"])} AS s_fr,
               {_langid_score_sql(_LANGID_PROFILES["de"])} AS s_de
        FROM toks
    )
    SELECT lang,
           CASE WHEN greatest(s_en, s_es, s_fr, s_de) <= 0 THEN 'und'
                WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
                WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
                WHEN s_fr >= s_de THEN 'fr'
                ELSE 'de' END AS predicted,
           count(*) AS n_docs
    FROM scored
    GROUP BY 1, 2
    """,
    tags=("text", "langid", "confusion"),
)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared × predicted language counts. The classifier is a pure
    codegen'd expression chain (filter + ratio + argmax fold) — no
    UDF, no model download; ratios are identical IEEE divisions in
    both engines, so even the argmax ties match the oracle."""
    from ..operators.text import language_id_col

    t = load(spark, sf_dir)
    return (
        t.documents.select(
            "lang", language_id_col(F.col("text")).alias("predicted")
        )
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n_docs"))
    )


# --------------------------------------------------------------------------
# curriculum binning by document length
# --------------------------------------------------------------------------
@query(
    "curriculum_quartile_bins",
    oracle=r"""
    WITH scored AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END
                   AS n_tokens,
               ntile(4) OVER (
                   ORDER BY CASE WHEN trim(text) = '' THEN 0
                            ELSE len(string_split_regex(trim(text), '\s+'))
                            END,
                            doc_id
               ) AS bin
        FROM documents
    )
    SELECT bin,
           count(*) AS n_docs,
           sum(n_tokens)::BIGINT AS total_tokens,
           min(n_tokens) AS min_tokens,
           max(n_tokens) AS max_tokens
    FROM scored
    GROUP BY bin
    """,
    tags=("text", "curriculum", "binning"),
)
def curriculum_quartile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-ordering prep: quartile-bin the corpus by token count
    (ntile over the fully-deterministic (n_tokens, doc_id) order) and
    report each bin's document and token budget — the stats a
    length-staged training schedule is built from. The bin assignment
    comes from operators/rank.global_ntile (range-partitioned global
    rank + the SQL-standard bucket formula), so a web-crawl-sized
    corpus never funnels through the single task a native
    `ntile() OVER (ORDER BY ...)` requires."""
    from ..operators.rank import global_ntile

    from ..operators.text import token_count_col

    t = load(spark, sf_dir)
    scored = t.documents.select(
        "doc_id", token_count_col(F.col("text")).alias("n_tokens")
    )
    # checkpoint_input: scoring tokenizes every document; the range
    # sampler would re-run the tokenizer over the corpus (r12)
    binned = global_ntile(scored, ["n_tokens", "doc_id"], 4, "bin",
                          checkpoint_input=True)
    return binned.groupBy("bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )


# --------------------------------------------------------------------------
# unigram language-model scoring (perplexity-style quality signal)
# --------------------------------------------------------------------------
@query(
    "unigram_logprob_score",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, source,
               unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(trim(text), '\s+') END) AS tok
        FROM documents
    ),
    lm AS (
        SELECT tok, count(*) AS c FROM toks GROUP BY tok
    ),
    total AS (SELECT sum(c) AS n FROM lm),
    per_doc AS (
        SELECT t.doc_id, t.source,
               round(avg(ln(lm.c * 1.0 / total.n)), 6) AS lp
        FROM toks t JOIN lm ON t.tok = lm.tok, total
        GROUP BY t.doc_id, t.source
    )
    SELECT source,
           count(*) AS n_docs,
           round(avg(lp), 6) AS avg_logprob,
           min(lp) AS min_logprob,
           max(lp) AS max_logprob
    FROM per_doc
    GROUP BY source
    """,
    tags=("text", "lm", "quality"),
)
def unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality signal with a self-trained unigram model:
    each document scores avg ln p(token) under the corpus unigram
    distribution; per-source distribution stats surface outlier
    sources. The LM table is vocabulary-sized (bounded, broadcast —
    at 100 TB: top-K + a floor probability for the tail); the token
    stream shuffles once to train it and never again, because the
    scoring join is a broadcast. Per-doc averages are rounded before
    the min/max/avg rollup so both engines aggregate identical
    doubles."""
    from ..operators.text import tokens_col

    t = load(spark, sf_dir)
    toks = t.documents.select(
        "doc_id", "source", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    lm = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = lm.agg(F.sum("c").alias("n"))
    per_doc = (
        toks.join(F.broadcast(lm), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id", "source")
        .agg(
            F.round(F.avg(F.log(F.col("c") * 1.0 / F.col("n"))), 6).alias("lp")
        )
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
        F.min("lp").alias("min_logprob"),
        F.max("lp").alias("max_logprob"),
    )


# --------------------------------------------------------------------------
# skew-salted holistic aggregation (registry face of operators/skew.py)
# --------------------------------------------------------------------------
@query(
    "salted_token_vocabulary",
    oracle=r"""
    WITH toks AS (
        SELECT source,
               unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(trim(text), '\s+') END) AS tok
        FROM documents
    )
    SELECT source,
           array_to_string(list_sort(list(DISTINCT tok)), ' ') AS vocab,
           count(DISTINCT tok) AS n_distinct
    FROM toks
    GROUP BY source
    """,
    tags=("text", "skew", "holistic"),
)
def salted_token_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sorted distinct-token vocabulary via the salted
    two-stage collect (operators/skew.salted_collect_list): values
    shard over (key, salt) reducers before the final flatten-merge, so
    a head source with billions of tokens never funnels through one
    task — the holistic-agg skew pattern as an oracle-checked query
    (array_distinct + array_sort canonicalize the shard order away).

    The vocabulary is emitted as a space-joined STRING, not
    array<string>: registry outputs must be flat scalar columns — the
    driver's pandas canonicalizer sorts cell values and cannot hash
    ndarray cells (VERDICT r4 'What's wrong #1')."""
    from ..operators.skew import salted_collect_list
    from ..operators.text import tokens_col

    t = load(spark, sf_dir)
    toks = t.documents.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    collected = salted_collect_list(toks, ["source"], "tok")
    return collected.select(
        "source",
        F.array_join(
            F.array_sort(F.array_distinct("tok_list")), " "
        ).alias("vocab"),
        F.size(F.array_distinct("tok_list")).cast("long").alias("n_distinct"),
    )


# --------------------------------------------------------------------------
# per-source Jensen-Shannon divergence vs the corpus (source-drift)
# --------------------------------------------------------------------------
#: ln(2) as a shared literal — both engines consume the identical
#: double instead of each computing log(2) (shared-constant convention,
#: cf. plans/graph DAMPING/TELEPORT)
LN2 = 0.6931471805599453


@query(
    "js_divergence_sources",
    oracle=rf"""
    WITH toks AS (
        SELECT source,
               unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(trim(text), '\s+') END) AS tok
        FROM documents
    ),
    st AS (SELECT source, tok, count(*) AS cnt FROM toks GROUP BY 1, 2),
    ns AS (SELECT source, sum(cnt) AS n_s FROM st GROUP BY 1),
    g  AS (SELECT tok, sum(cnt) AS g_cnt FROM st GROUP BY 1),
    ng AS (SELECT sum(g_cnt) AS n_g FROM g),
    j AS (
        SELECT st.source, st.cnt / CAST(ns.n_s AS DOUBLE) AS p,
               g.g_cnt / CAST(ng.n_g AS DOUBLE) AS q
        FROM st JOIN g USING (tok) JOIN ns USING (source) CROSS JOIN ng
    )
    SELECT source,
           count(*) AS n_types,
           round(0.5 * sum(p * ln(2 * p / (p + q))
                           + q * ln(2 * q / (p + q)))
                 + 0.5 * {LN2} * (1 - sum(q)), 6) + 0.0 AS jsd
    FROM j GROUP BY source
    """,
    tags=("text", "drift", "curation", "scale-path"),
)
def js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each source's token distribution
    against the whole corpus — the curation-time source-outlier
    detector ('which feed stopped looking like the rest of the
    crawl'), bounded in [0, ln 2] and symmetric, unlike raw KL.

    The sum runs ONLY over (source, token) pairs that exist: for
    corpus tokens absent from a source, p=0 collapses the JS term to
    q·ln2, and those contributions fold into the closed form
    0.5·ln2·(1 − Σ_present q) — so the join output is |source-token|
    rows, never |sources| × |vocab|.

    Scale shape: one tokenize pass → (source,tok) counts (map-side
    combined); the global token frame derives from that aggregate, not
    a second scan; the per-source totals broadcast; one keyed equi-join
    on tok and a final per-source fold.  The log ratios are
    irrational-valued, so round-6 has no half-boundary exposure
    (theil convention)."""
    from ..operators.text import tokens_col

    t = load(spark, sf_dir)
    toks = t.documents.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    st = toks.groupBy("source", "tok").agg(F.count("*").alias("cnt"))
    ns = st.groupBy("source").agg(F.sum("cnt").alias("n_s"))
    g = st.groupBy("tok").agg(F.sum("cnt").alias("g_cnt"))
    ng = g.agg(F.sum("g_cnt").alias("n_g"))
    j = (
        st.join(g, "tok")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(ng))
        .select(
            "source",
            (F.col("cnt") / F.col("n_s").cast("double")).alias("p"),
            (F.col("g_cnt") / F.col("n_g").cast("double")).alias("q"),
        )
    )
    p, q = F.col("p"), F.col("q")
    return j.groupBy("source").agg(
        F.count("*").alias("n_types"),
        (
            F.round(
                0.5 * F.sum(p * F.log(2 * p / (p + q))
                            + q * F.log(2 * q / (p + q)))
                + 0.5 * LN2 * (1 - F.sum(q)),
                6,
            )
            + 0.0
        ).alias("jsd"),
    )


# --------------------------------------------------------------------------
# vocabulary coverage curve (tokenizer sizing)
# --------------------------------------------------------------------------
@query(
    "vocab_coverage_curve",
    oracle=r"""
    WITH toks AS (
        SELECT unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(trim(text), '\s+') END) AS tok
        FROM documents
    ),
    freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    total AS (SELECT sum(c) AS n FROM freq),
    ranked AS (
        SELECT tok, c,
               row_number() OVER (ORDER BY c DESC, tok) AS rnk,
               sum(c) OVER (ORDER BY c DESC, tok
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
        FROM freq
    )
    SELECT rnk, tok, c AS freq,
           round(cum * 1.0 / total.n, 6) AS cum_share
    FROM ranked, total
    WHERE rnk <= 30
    """,
    tags=("text", "vocab", "tokenizer"),
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative corpus coverage of the top-30 tokens — the curve that
    sizes a tokenizer vocabulary ('how many types cover 99% of
    tokens'). Rank, cumulative counts, and the corpus total all come
    from ONE operators/rank.ordered_scan pass over the vocabulary
    aggregate — type counts grow with the corpus (Heaps' law), so even
    this 'bounded' frame gets the range-partitioned walk rather than a
    single-task window; the deterministic (freq desc, token) order is
    shared by both engines."""
    from ..operators.rank import ordered_scan
    from ..operators.text import tokens_col

    t = load(spark, sf_dir)
    freq = (
        t.documents.select(F.explode(tokens_col(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    ranked = ordered_scan(
        freq,
        [F.col("c").desc(), "tok"],
        rank="rnk",
        running={"cum": "c"},
        totals={"n": "c"},
    )
    return ranked.where(F.col("rnk") <= 30).select(
        "rnk",
        "tok",
        F.col("c").alias("freq"),
        F.round(F.col("cum") * 1.0 / F.col("n"), 6).alias("cum_share"),
    )


# --------------------------------------------------------------------------
# token co-occurrence + PMI (association mining)
# --------------------------------------------------------------------------
#: co-occurrence is restricted to the top-K vocabulary — bounds the
#: within-doc pair expansion at K^2 regardless of corpus size
PMI_TOP_K = 10


@query(
    "token_pmi_pairs",
    oracle=rf"""
    WITH toks AS (
        SELECT DISTINCT doc_id,
               unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(trim(text), '\s+') END) AS tok
        FROM documents
    ),
    vocab AS (
        SELECT tok FROM (
            SELECT tok, count(*) AS c FROM toks GROUP BY tok
            ORDER BY c DESC, tok LIMIT {PMI_TOP_K}
        )
    ),
    vt AS (
        SELECT t.doc_id, t.tok FROM toks t JOIN vocab v ON t.tok = v.tok
    ),
    n_docs AS (SELECT count(DISTINCT doc_id) AS n FROM toks),
    singles AS (SELECT tok, count(*) AS c FROM vt GROUP BY tok),
    pairs AS (
        SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS c_ab
        FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY a.tok, b.tok
    )
    SELECT p.tok_a, p.tok_b, p.c_ab,
           round(ln(p.c_ab * 1.0 * n.n / (sa.c * 1.0 * sb.c)), 6) AS pmi
    FROM pairs p
    JOIN singles sa ON p.tok_a = sa.tok
    JOIN singles sb ON p.tok_b = sb.tok, n_docs n
    """,
    tags=("text", "pmi", "cooccurrence"),
)
def token_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level co-occurrence counts and pointwise mutual
    information for the top-K vocabulary — the association-mining
    pass behind phrase detection and embedding evaluation. The vocab
    cap bounds the within-doc self-join at K² pairs per doc (broadcast
    membership probe before the join); doc-frequency denominators are
    K-row broadcasts and the corpus size is a 1-row broadcast. PMI =
    ln(P(a,b)/P(a)P(b)) over document incidence."""
    from ..operators.text import tokens_col

    t = load(spark, sf_dir)
    toks = (
        t.documents.select(
            "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
        )
        .distinct()
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "tok")
        .limit(PMI_TOP_K)
        .select("tok")
    )
    vt = toks.join(F.broadcast(vocab), "tok")
    n_docs = toks.agg(F.countDistinct("doc_id").alias("n"))
    singles = vt.groupBy("tok").agg(F.count("*").alias("c"))
    a = vt.select(F.col("doc_id"), F.col("tok").alias("tok_a"))
    b = vt.select(F.col("doc_id"), F.col("tok").alias("tok_b"))
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("c_ab"))
    )
    sa = singles.select(F.col("tok").alias("tok_a"), F.col("c").alias("_ca"))
    sb = singles.select(F.col("tok").alias("tok_b"), F.col("c").alias("_cb"))
    return (
        pairs.join(F.broadcast(sa), "tok_a")
        .join(F.broadcast(sb), "tok_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok_a",
            "tok_b",
            "c_ab",
            F.round(
                F.log(
                    F.col("c_ab") * 1.0 * F.col("n") / (F.col("_ca") * 1.0 * F.col("_cb"))
                ),
                6,
            ).alias("pmi"),
        )
    )


@query(
    "udtf_chunk_documents",
    # The oracle rebuilds the same fixed-size token windows with pure
    # list arithmetic (1-based inclusive slices); chunk content is
    # compared by md5 so the hash check covers every token of every
    # window without hauling full text through the comparator.
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    ch AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(CAST(ceil(len(t) / 64.0) AS BIGINT)), i ->
                   struct_pack(
                       chunk_no := CAST(i AS INT),
                       n_tokens := CAST(least((i+1)*64, len(t)) - i*64 AS INT),
                       chunk_md5 := md5(array_to_string(
                           t[(i*64+1):least((i+1)*64, len(t))], ' '))
                   ))) AS s
        FROM toks
    )
    SELECT doc_id, s.chunk_no AS chunk_no, s.n_tokens AS n_tokens,
           s.chunk_md5 AS chunk_md5
    FROM ch
    """,
    tags=("text", "udtf", "chunking"),
)
def udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (SURVEY §2.10, third UDF kind): LATERAL
    chunk_document(text, 64) splits each document into consecutive
    64-token windows — the pre-tokenization chunking step of an LLM
    data pipeline — via an Arrow-batched table function
    (functions/udtf.py). The codegen twin of this shape is
    pack_token_batches; the UDTF exists for imperative row-expansion
    kernels (real tokenizers, stateful parsers) that explode cannot
    express."""
    from ..functions.udtf import CHUNK_TOKENS, register_udtfs

    t = load(spark, sf_dir)
    register_udtfs(spark)
    t.documents.createOrReplaceTempView("udtf_docs_src")
    return spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_no, c.n_tokens, md5(c.chunk) AS chunk_md5
        FROM udtf_docs_src d, LATERAL chunk_document(d.text, {CHUNK_TOKENS}) c
        """
    )


# --------------------------------------------------------------------------
# BPE trainer step: weighted adjacent-symbol pair counts over the word table
# --------------------------------------------------------------------------
#: merge candidates reported per step
BPE_TOP = 10

_BPE_ORACLE = f"""
WITH w AS (
    SELECT unnest(string_split_regex(text, '\\s+')) AS w FROM documents
),
wf AS (
    SELECT w, count(*) AS f FROM w WHERE length(w) >= 2 GROUP BY w
),
p AS (
    SELECT f,
           unnest(list_transform(range(1, length(w)),
                  i -> w[i:i] || ' ' || w[i+1:i+1])) AS pair
    FROM wf
),
agg AS (SELECT pair, CAST(sum(f) AS BIGINT) AS cnt FROM p GROUP BY pair)
SELECT pair, cnt FROM agg ORDER BY cnt DESC, pair LIMIT {BPE_TOP}
"""


@query("bpe_top_merges", oracle=_BPE_ORACLE, tags=("text", "tokenizer", "scale-path"))
def bpe_top_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE trainer iteration (Sennrich et al. 2016): count adjacent
    symbol pairs weighted by word frequency and surface the top merge
    candidates — the inner loop of byte-pair-encoding vocabulary
    training, run over the word-frequency table rather than raw text.

    Scale shape: the corpus collapses to the word table FIRST (one
    groupBy — at 100 TB the distinct-word table is orders of magnitude
    smaller than the corpus), pair expansion is a codegen
    transform+explode over that table (substring slicing, no UDF, no
    split-on-empty-regex edge cases), and the pair count is a second
    map-side-combined groupBy.  Iterating replaces the merged pair in
    the symbol sequences and repeats; each step is two shuffles of
    shrinking cardinality.  Top-k is a bounded TakeOrdered, never a
    global sort."""
    t = load(spark, sf_dir)
    wf = (
        t.documents.select(F.explode(F.split("text", r"\s+")).alias("w"))
        .where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("f"))
    )
    pairs = wf.select(
        "f",
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1), "
                "i -> concat(substring(w, i, 1), ' ', substring(w, i + 1, 1)))"
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("f").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(BPE_TOP)
    )


# --------------------------------------------------------------------------
# bigram language-model scoring with add-k smoothing
# --------------------------------------------------------------------------
_BG_K = 0.5

_BIGRAM_ORACLE = rf"""
WITH t AS (
    SELECT doc_id, source,
           string_split_regex(trim(text), '\s+') AS a
    FROM documents WHERE trim(text) != ''
),
p AS (
    SELECT doc_id, source, a[i] AS w1, a[i] || ' ' || a[i + 1] AS bg
    FROM (SELECT doc_id, source, a, unnest(range(1, len(a))) AS i FROM t)
),
c12 AS (SELECT bg, count(*) AS c FROM p GROUP BY bg),
c1 AS (SELECT w1, count(*) AS ch FROM p GROUP BY w1),
v AS (
    SELECT count(DISTINCT w) AS vocab FROM (
        SELECT w1 AS w FROM p UNION SELECT split_part(bg, ' ', 2) FROM p
    )
),
per_doc AS (
    SELECT p.doc_id, p.source,
           round(avg(ln((c12.c + {_BG_K}) / (c1.ch + {_BG_K} * v.vocab))), 6)
               AS lp
    FROM p JOIN c12 USING (bg) JOIN c1 USING (w1), v
    GROUP BY p.doc_id, p.source
)
SELECT source,
       count(*) AS n_docs,
       round(avg(lp), 6) AS avg_logprob,
       min(lp) AS min_logprob,
       max(lp) AS max_logprob
FROM per_doc
GROUP BY source
"""


@query("bigram_logprob_score", oracle=_BIGRAM_ORACLE, tags=("text", "lm", "quality"))
def bigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM quality signal, the order-2 upgrade of
    unigram_logprob_score: each document scores avg ln P(w2|w1) under a
    self-trained add-k-smoothed bigram model (k=0.5; history counts are
    left-context occurrences, so the conditional normalizes over the
    vocabulary).

    Scale shape: bigrams come straight off the split array with a
    codegen transform+explode — no window, no posexplode self-join; the
    model tables are vocabulary-sized and broadcast back onto the pair
    stream (at 100 TB: top-K bigrams + backoff floor, same contract as
    the unigram note). Per-doc averages round before the source rollup
    so both engines aggregate identical doubles."""
    t = load(spark, sf_dir)
    a = F.split(F.trim(F.col("text")), r"\s+")
    pairs_expr = (
        "CASE WHEN size(a) < 2 THEN "
        "cast(array() as array<struct<w1 string, bg string>>) "
        "ELSE transform(sequence(1, size(a) - 1), "
        "i -> struct(element_at(a, i) AS w1, "
        "concat(element_at(a, i), ' ', element_at(a, i + 1)) AS bg)) END"
    )
    p = (
        t.documents.where(F.trim(F.col("text")) != "")
        .select("doc_id", "source", a.alias("a"))
        .select("doc_id", "source", F.explode(F.expr(pairs_expr)).alias("pr"))
        .select("doc_id", "source", F.col("pr.w1").alias("w1"),
                F.col("pr.bg").alias("bg"))
    )
    c12 = p.groupBy("bg").agg(F.count("*").alias("c"))
    c1 = p.groupBy("w1").agg(F.count("*").alias("ch"))
    v = (
        p.select(F.col("w1").alias("w"))
        .union(p.select(F.split_part(F.col("bg"), F.lit(" "), F.lit(2))))
        .distinct()
        .agg(F.count("*").alias("vocab"))
    )
    per_doc = (
        p.join(F.broadcast(c12), "bg")
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id", "source")
        .agg(
            F.round(
                F.avg(
                    F.log(
                        (F.col("c") + _BG_K)
                        / (F.col("ch") + _BG_K * F.col("vocab"))
                    )
                ),
                6,
            ).alias("lp")
        )
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
        F.min("lp").alias("min_logprob"),
        F.max("lp").alias("max_logprob"),
    )


# --------------------------------------------------------------------------
# Zipf's-law fit over the rank-frequency curve
# --------------------------------------------------------------------------
_ZIPF_TOP = 200

_ZIPF_ORACLE = f"""
WITH w AS (
    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
    FROM documents WHERE trim(text) != ''
),
wf AS (SELECT w, count(*) AS f FROM w GROUP BY w),
r AS (
    SELECT f, row_number() OVER (ORDER BY f DESC, w) AS rnk
    FROM wf
    ORDER BY f DESC, w
    LIMIT {_ZIPF_TOP}
)
SELECT count(*) AS n_terms,
       round(regr_slope(ln(f), ln(rnk)), 4) + 0.0 AS zipf_slope,
       round(corr(ln(f), ln(rnk)) * corr(ln(f), ln(rnk)), 4) + 0.0 AS r2
FROM r
"""


@query("zipf_slope_fit", oracle=_ZIPF_ORACLE, tags=("text", "lm", "profile"))
def zipf_slope_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law exponent: the OLS slope of ln(freq) on ln(rank) over
    the top-200 vocabulary — natural corpora sit near −1, so the fitted
    slope (with its R²) is a one-number sanity check that a scraped or
    synthetic corpus has natural token statistics (the companion to
    vocab_coverage_curve's tokenizer-sizing view).

    Scale shape: the corpus collapses to the word table, the top-200
    cut is a bounded TakeOrdered, and the regression runs on 200 rows
    via the built-in bivariate aggregates — the global rank window
    touches only the k survivors, never the vocabulary."""
    from pyspark.sql import Window as W

    t = load(spark, sf_dir)
    wf = (
        t.documents.where(F.trim(F.col("text")) != "")
        .select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("f"))
        .orderBy(F.col("f").desc(), "w")
        .limit(_ZIPF_TOP)
    )
    r = wf.withColumn(
        "rnk", F.row_number().over(W.orderBy(F.col("f").desc(), "w"))
    )
    lf, lr = F.log(F.col("f")), F.log(F.col("rnk"))
    return r.agg(
        F.count("*").alias("n_terms"),
        (F.round(F.regr_slope(lf, lr), 4) + 0.0).alias("zipf_slope"),
        (F.round(F.corr(lf, lr) * F.corr(lf, lr), 4) + 0.0).alias("r2"),
    )


# --------------------------------------------------------------------------
# per-document top TF-IDF term (keyword extraction)
# --------------------------------------------------------------------------
_KW_ORACLE = r"""
WITH d AS (
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                ELSE string_split_regex(trim(text), '\s+') END AS toks
    FROM documents
),
n AS (SELECT count(*) AS n_docs FROM d),
tf AS (
    SELECT doc_id, unnest(toks) AS term FROM d
),
tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tfc GROUP BY term),
scored AS (
    SELECT tfc.doc_id, tfc.term,
           round(tfc.tf * ln(n.n_docs * 1.0 / df.df), 6) AS tfidf
    FROM tfc JOIN df USING (term), n
),
top AS (
    SELECT doc_id, term, tfidf,
           row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term
           ) AS rn
    FROM scored
)
SELECT doc_id, term AS top_term, tfidf + 0.0 AS top_tfidf
FROM top WHERE rn = 1
"""


@query("doc_top_keyword", oracle=_KW_ORACLE, tags=("text", "retrieval", "tfidf"))
def doc_top_keyword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: each document's highest-TF-IDF term — the
    per-document argmax over the corpus-weighted term matrix
    (tfidf_top_terms gives the corpus view; this gives the per-doc
    labels a tagging or routing pipeline wants).

    Scale shape: one (doc, term) aggregation, document frequencies
    broadcast back, and a WindowGroupLimit rank-1 cut per doc — the
    per-group argmax never sorts more than each doc's own terms."""
    from pyspark.sql import Window as W

    t = load(spark, sf_dir)
    from ..operators.text import tokens_col

    tf = (
        t.documents.select(
            "doc_id", F.explode(tokens_col(F.col("text"))).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    n_docs = t.documents.count()
    df = tf.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("term").alias("top_term"),
            (F.col("tfidf") + 0.0).alias("top_tfidf"),
        )
    )


# --------------------------------------------------------------------------
# Frequency-weighted negative sampling (inverse-CDF categorical sampler)
# --------------------------------------------------------------------------
#: draw count and interval-join bucket count.  B=4096 draws make every
#: frequent token's drawn share statistically visible at sf0.01; the
#: bucket grid bounds the interval join at (vocab + buckets) rows.
_NEG_B = 4096
_NEG_BUCKETS = 1024


@query(
    "negative_sampling_unigram",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents WHERE trim(text) <> ''
    ),
    c AS (SELECT token, count(*)::BIGINT AS cnt FROM tok GROUP BY token),
    r AS (
        SELECT token, cnt,
               sum(cnt) OVER (ORDER BY token
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
               sum(cnt) OVER () AS n
        FROM c
    ),
    draws AS (
        SELECT ('0x' || substr(md5('neg' || j), 1, 8))::BIGINT
                   % (SELECT max(n) FROM r) AS u
        FROM generate_series(0, {_NEG_B - 1}) AS g(j)
    ),
    hits AS (
        SELECT r.token, r.cnt, r.n
        FROM draws d JOIN r ON d.u >= r.cum - r.cnt AND d.u < r.cum
    )
    SELECT token,
           CAST(count(*) AS BIGINT) AS n_drawn,
           CAST(max(cnt) AS BIGINT) AS freq,
           CAST(max(cnt) * 1000000 // max(n) AS BIGINT) AS expected_ppm
    FROM hits GROUP BY token
    """,
    tags=("text", "sampling", "llm"),
)
def negative_sampling_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-proportional negative sampling over the corpus
    vocabulary — the word2vec/contrastive-training negative sampler
    as a DISTRIBUTED inverse-CDF categorical draw.  Every token owns
    the integer interval [cum - cnt, cum) of the token-ordered
    cumulative frequency line; each of the B portable md5-uniform
    draws lands in exactly one interval.  (word2vec smooths with
    count^0.75; the integer-exact count weighting here keeps the
    whole sampler bit-identical in both engines — the smoothing
    exponent would only perturb the interval widths.)

    Scale shape: cumulative interval bounds come from
    operators/rank.ordered_scan (range repartition + partition
    offsets — never a single-partition window over the vocabulary);
    the draw→interval lookup is the bucketed interval join (the
    spatial-grid / range-join blocking trick): each vocab interval
    explodes to the ~1 + width/step grid buckets it covers (SUM of
    extra rows is bounded by buckets + vocab), draws hash to their
    bucket, and an equi-join + exact span filter resolves the
    inversion — no broadcast nested loop over the vocabulary. One
    final groupBy aggregates drawn counts."""
    t = load(spark, sf_dir)
    tok = (
        t.documents.where(F.trim("text") != "")
        .select(
            F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
        )
    )
    c = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    r = ordered_scan(
        c, ["token"], running={"cum": "cnt"}, totals={"n": "cnt"}
    )
    # interval [lo, hi) per token over the cumulative frequency line
    iv = r.select(
        "token", "cnt", "n",
        (F.col("cum") - F.col("cnt")).alias("lo"),
        F.col("cum").alias("hi"),
    )
    step = F.greatest(F.lit(1), (F.col("n") / _NEG_BUCKETS).cast("long"))
    iv_b = iv.select(
        "token", "cnt", "n", "lo", "hi",
        F.explode(
            F.sequence(
                (F.col("lo") / step).cast("long"),
                ((F.col("hi") - 1) / step).cast("long"),
            )
        ).alias("bucket"),
    )
    draws = spark.range(_NEG_B).select(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("neg"), F.col("id").cast("string"))),
                    1, 8,
                ), 16, 10,
            ).cast("long")
        ).alias("u32")
    )
    n_total = iv.select(F.max("n").alias("n"))
    draws = draws.crossJoin(F.broadcast(n_total)).select(
        (F.col("u32") % F.col("n")).alias("u"),
        ((F.col("u32") % F.col("n")) / F.greatest(
            F.lit(1), (F.col("n") / _NEG_BUCKETS).cast("long")
        )).cast("long").alias("bucket"),
    )
    hits = draws.join(iv_b, "bucket").where(
        (F.col("u") >= F.col("lo")) & (F.col("u") < F.col("hi"))
    )
    return hits.groupBy("token").agg(
        F.count("*").cast("long").alias("n_drawn"),
        F.max("cnt").cast("long").alias("freq"),
        F.expr(
            "CAST(max(cnt) * 1000000 div max(n) AS BIGINT)"
        ).alias("expected_ppm"),
    )


# --------------------------------------------------------------------------
# Chi-square token feature selection (quality-classifier vocabulary)
# --------------------------------------------------------------------------
#: minimum document frequency for a token to be scored (bounds the
#: output and kills the hapax tail before the per-token contingency)
_CHI2_MIN_DF = 5


@query(
    "chi2_token_selection",
    oracle=f"""
    WITH lab AS (
        SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents
    ),
    pres AS (
        SELECT DISTINCT d.doc_id,
               unnest(string_split_regex(trim(d.text), '\\s+')) AS token
        FROM documents d WHERE trim(d.text) <> ''
    ),
    n AS (
        SELECT count(*)::HUGEINT AS n,
               sum(y)::HUGEINT AS n_pos
        FROM lab
    ),
    cell AS (
        SELECT p.token,
               count(*)::HUGEINT AS df,
               sum(l.y)::HUGEINT AS a
        FROM pres p JOIN lab l ON p.doc_id = l.doc_id
        GROUP BY p.token
        HAVING count(*) >= {_CHI2_MIN_DF}
    )
    SELECT token,
           CAST(df AS BIGINT) AS df,
           CAST(a AS BIGINT) AS df_pos,
           round(
               n * (a * (n - n_pos - df + a) - (df - a) * (n_pos - a))
                 * (a * (n - n_pos - df + a) - (df - a) * (n_pos - a))
               / (df * (n - df) * n_pos * (n - n_pos) * 1.0), 4)
               + 0.0 AS chi2
    FROM cell, n
    WHERE n_pos > 0 AND n_pos < n
    """,
    tags=("text", "stats", "feature-selection", "llm"),
)
def chi2_token_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-token chi-square feature selection against a document
    label (lang == 'en') — the vocabulary-selection pass a bag-of-
    words quality classifier runs before training.  Document-level
    presence (distinct doc-token pairs) builds one contingency table
    per token from just two sums: a = labelled docs containing the
    token, df = docs containing it; the remaining cells follow from
    the label totals, so chi2 = N(ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d))
    is exact integer arithmetic in DECIMAL(38,0) (DuckDB HUGEINT —
    at 1e8 documents (ad - bc)^2 alone overflows int64) with ONE
    final rounded float division.

    Scale shape: explode → distinct collapses to (doc, token) pairs,
    the label join is per-document (broadcastable dimension at any
    corpus size since labels ride the document table's key), one
    map-side-combined groupBy builds every contingency, and the
    min-df HAVING kills the hapax tail before output."""
    t = load(spark, sf_dir)
    dec = "decimal(38,0)"
    lab = t.documents.select(
        "doc_id",
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    pres = (
        t.documents.where(F.trim("text") != "")
        .select(
            "doc_id",
            F.explode(F.split(F.trim("text"), r"\s+")).alias("token"),
        )
        .distinct()
    )
    n = lab.agg(
        F.expr("CAST(count(*) AS DECIMAL(38,0))").alias("n"),
        F.sum("y").cast(dec).alias("n_pos"),
    )
    cell = (
        pres.join(lab, "doc_id")
        .groupBy("token")
        .agg(
            F.expr("CAST(count(*) AS DECIMAL(38,0))").alias("df"),
            F.sum("y").cast(dec).alias("a"),
        )
        .where(F.col("df") >= _CHI2_MIN_DF)
    )
    j = cell.crossJoin(F.broadcast(n)).where(
        (F.col("n_pos") > 0) & (F.col("n_pos") < F.col("n"))
    )
    adbc = (
        F.col("a") * (F.col("n") - F.col("n_pos") - F.col("df") + F.col("a"))
        - (F.col("df") - F.col("a")) * (F.col("n_pos") - F.col("a"))
    )
    return j.select(
        "token",
        F.col("df").cast("long").alias("df"),
        F.col("a").cast("long").alias("df_pos"),
        (
            F.round(
                (F.col("n") * adbc * adbc).cast("double")
                / (
                    F.col("df") * (F.col("n") - F.col("df"))
                    * F.col("n_pos") * (F.col("n") - F.col("n_pos"))
                ).cast("double"),
                4,
            )
            + 0.0
        ).alias("chi2"),
    )


# --------------------------------------------------------------------------
# interpolated Kneser-Ney trigram scoring
# --------------------------------------------------------------------------
_KN_D = 0.75

_KN_ORACLE = r"""
WITH t AS (
    SELECT doc_id, source,
           string_split_regex(trim(text), '\s+') AS a
    FROM documents WHERE trim(text) != ''
),
p AS (
    SELECT doc_id, source,
           a[i] AS w1, a[i + 1] AS w2, a[i + 2] AS w3
    FROM (SELECT doc_id, source, a, unnest(range(1, len(a) - 1)) AS i
          FROM t)
),
c3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM p GROUP BY w1, w2, w3),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM p GROUP BY w1, w2),
n1ctx AS (SELECT w1, w2, count(*) AS n1_ctx FROM c3 GROUP BY w1, w2),
n1mid AS (SELECT w2, w3, count(*) AS n1_mid FROM c3 GROUP BY w2, w3),
n1den AS (SELECT w2, count(*) AS n1_den FROM c3 GROUP BY w2),
bt AS (SELECT DISTINCT w2, w3 FROM c3),
n1w2 AS (SELECT w2, count(*) AS n1_w2dot FROM bt GROUP BY w2),
n1w3 AS (SELECT w3, count(*) AS n1_dotw3 FROM bt GROUP BY w3),
nbb AS (SELECT count(*) AS n1_dotdot FROM bt),
scored AS (
    SELECT p.doc_id, p.source,
           (greatest(c3.c3 - 0.75, 0.0) / c2.c2
            + 0.75 * n1ctx.n1_ctx / c2.c2
              * (greatest(n1mid.n1_mid - 0.75, 0.0) / n1den.n1_den
                 + 0.75 * n1w2.n1_w2dot / n1den.n1_den
                   * (CAST(n1w3.n1_dotw3 AS DOUBLE) / nbb.n1_dotdot)))
               AS prob
    FROM p
    JOIN c3 USING (w1, w2, w3)
    JOIN c2 USING (w1, w2)
    JOIN n1ctx USING (w1, w2)
    JOIN n1mid USING (w2, w3)
    JOIN n1den USING (w2)
    JOIN n1w2 USING (w2)
    JOIN n1w3 USING (w3), nbb
),
per_doc AS (
    SELECT doc_id, source, round(avg(ln(prob)), 6) AS lp
    FROM scored GROUP BY doc_id, source
)
SELECT source,
       count(*) AS n_docs,
       round(avg(lp), 6) AS avg_logprob,
       min(lp) AS min_logprob,
       max(lp) AS max_logprob
FROM per_doc
GROUP BY source
"""


@query("kneser_ney_trigram_score", oracle=_KN_ORACLE,
       tags=("text", "lm", "quality"))
def kneser_ney_trigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney trigram LM scoring (Kneser & Ney 1995;
    Chen & Goodman 1999 interpolated form, fixed discount D=0.75) —
    the standard n-gram quality model a corpus pipeline uses for
    perplexity filtering, upgrading bigram_logprob_score's add-k
    smoothing with absolute discounting + continuation probabilities:

        P(w3|w1w2) = max(c(w123)-D,0)/c(w12)
                     + D·N1+(w12·)/c(w12) · P(w3|w2)
        P(w3|w2)   = max(N1+(·w23)-D,0)/N1+(·w2·)
                     + D·N1+(w2·)/N1+(·w2·) · Pcont(w3)
        Pcont(w3)  = N1+(·w3)/N1+(··)

    where every count is an integer aggregate of the trigram stream or
    its type table, so both engines derive identical doubles (the one
    float expression is written with the same association order in
    both; per-doc averages round before the source rollup).

    Scale shape: trigrams come off the split array with one codegen
    transform+explode; the model tables are all vocabulary- or
    type-scale and broadcast back onto the token stream; no windows,
    no row-at-a-time UDFs.  Scoring on training data means every
    denominator is >= 1 by construction.  At 100 TB the type tables
    get a min-count threshold and the broadcast becomes a shuffled
    hash join — the plan shape is otherwise unchanged."""
    t = load(spark, sf_dir)
    a = F.split(F.trim(F.col("text")), r"\s+")
    tri_expr = (
        "CASE WHEN size(a) < 3 THEN "
        "cast(array() as array<struct<w1 string, w2 string, w3 string>>) "
        "ELSE transform(sequence(1, size(a) - 2), "
        "i -> struct(element_at(a, i) AS w1, element_at(a, i + 1) AS w2, "
        "element_at(a, i + 2) AS w3)) END"
    )
    p = (
        t.documents.where(F.trim(F.col("text")) != "")
        .select("doc_id", "source", a.alias("a"))
        .select("doc_id", "source", F.explode(F.expr(tri_expr)).alias("g"))
        .select("doc_id", "source", "g.w1", "g.w2", "g.w3")
    )
    c3 = p.groupBy("w1", "w2", "w3").agg(F.count("*").alias("c3"))
    c2 = p.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    n1ctx = c3.groupBy("w1", "w2").agg(F.count("*").alias("n1_ctx"))
    n1mid = c3.groupBy("w2", "w3").agg(F.count("*").alias("n1_mid"))
    n1den = c3.groupBy("w2").agg(F.count("*").alias("n1_den"))
    bt = c3.select("w2", "w3").distinct()
    n1w2 = bt.groupBy("w2").agg(F.count("*").alias("n1_w2dot"))
    n1w3 = bt.groupBy("w3").agg(F.count("*").alias("n1_dotw3"))
    nbb = bt.agg(F.count("*").alias("n1_dotdot"))
    pcont = F.col("n1_dotw3").cast("double") / F.col("n1_dotdot")
    p2 = (
        F.greatest(F.col("n1_mid") - 0.75, F.lit(0.0)) / F.col("n1_den")
        + 0.75 * F.col("n1_w2dot") / F.col("n1_den") * pcont
    )
    p3 = (
        F.greatest(F.col("c3") - 0.75, F.lit(0.0)) / F.col("c2")
        + 0.75 * F.col("n1_ctx") / F.col("c2") * p2
    )
    scored = (
        p.join(F.broadcast(c3), ["w1", "w2", "w3"])
        .join(F.broadcast(c2), ["w1", "w2"])
        .join(F.broadcast(n1ctx), ["w1", "w2"])
        .join(F.broadcast(n1mid), ["w2", "w3"])
        .join(F.broadcast(n1den), ["w2"])
        .join(F.broadcast(n1w2), ["w2"])
        .join(F.broadcast(n1w3), ["w3"])
        .crossJoin(F.broadcast(nbb))
        .select("doc_id", "source", p3.alias("prob"))
    )
    per_doc = scored.groupBy("doc_id", "source").agg(
        F.round(F.avg(F.log("prob")), 6).alias("lp")
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
        F.min("lp").alias("min_logprob"),
        F.max("lp").alias("max_logprob"),
    )


# --------------------------------------------------------------------------
# winnowing document fingerprints (MOSS)
# --------------------------------------------------------------------------
_WIN_K = 5    #: k-gram length (characters)
_WIN_W = 4    #: winnowing window (hashes)
_WIN_CAP = 50   #: drop fingerprints shared by more docs (stop-grams)
_WIN_MIN_SHARED = 8  #: report pairs sharing at least this many prints
#: k-gram hash = Lehmer-mixed base-257 polynomial over per-char code
#: points, exact 64-bit integer arithmetic reproducible verbatim in
#: DuckDB (r11): poly < 2^53 for codepoints <= 0x10FFFF, then
#: (poly % P) * 48271 % P < 2^47 — no overflow anywhere. Replaces the
#: r8-r10 per-position md5, which dominated the query's cost (16.5s
#: solo at sf0.1) while only an ORDER over hashes is needed; the
#: Lehmer step restores the mixing a raw polynomial lacks (a base-257
#: poly is order-preserving on ASCII prefixes, which would bias the
#: window-min selection toward space-led grams).
_WIN_P = 2147483647  # 2^31 - 1 (Mersenne prime, the classic Lehmer modulus)
_WIN_A = 48271       # Lehmer multiplier (MINSTD)
_WIN_B = 257


def _win_poly(idx) -> str:
    """poly term sum for the k-gram starting at 1-based position
    `idx(j)` — identical text in both engines, only the array-index
    syntax differs."""
    return " + ".join(
        f"{idx(j)} * {_WIN_B ** (_WIN_K - 1 - j)}" for j in range(_WIN_K)
    )


@query(
    "winnowing_candidate_pairs",
    oracle=f"""
    WITH cs AS (
        SELECT doc_id,
               list_transform(string_split(text, ''),
                              c -> CAST(unicode(c) AS BIGINT)) AS cs
        FROM documents
        WHERE length(text) >= {_WIN_K + _WIN_W - 1}
    ),
    g AS (
        SELECT doc_id,
               list_transform(range(1, len(cs) - {_WIN_K} + 2),
                 i -> (({_win_poly(lambda j: f"cs[i + {j}]")})
                       % {_WIN_P}) * {_WIN_A} % {_WIN_P}) AS h
        FROM cs
    ),
    sel AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, len(h) - {_WIN_W} + 2),
                   p -> list_min(h[p:p + {_WIN_W - 1}]))) AS fps
        FROM g
    ),
    fp AS (
        SELECT DISTINCT doc_id, unnest(fps) AS fp FROM sel
    ),
    keep AS (
        SELECT fp FROM fp GROUP BY fp
        HAVING count(*) BETWEEN 2 AND {_WIN_CAP}
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        FROM fp a
        JOIN keep USING (fp)
        JOIN fp b ON b.fp = a.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, shared FROM pairs WHERE shared >= {_WIN_MIN_SHARED}
    """,
    tags=("text", "fingerprint", "dedup", "blocking"),
)
def winnowing_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
    MOSS algorithm): hash every {_WIN_K}-gram of the text, slide a
    window of {_WIN_W} hashes, select each window's minimum (rightmost
    on ties), and report document pairs sharing >= {_WIN_MIN_SHARED}
    selected fingerprints — the guarantee-bearing local fingerprinting
    scheme (any shared substring of length k+w-1 = {_WIN_K + _WIN_W - 1}
    is always detected) beside the probabilistic MinHash family.

    Scale shape: the whole gram-hash-select pipeline is ONE codegen
    higher-order-function expression per document (nested transform
    lambdas — no explode of raw gram streams, no Python); only the
    ~2/(w+1)-density selected fingerprints explode into the join.
    The k-gram hash is the Lehmer-mixed integer polynomial (_WIN_P /
    _WIN_A / _WIN_B above) — pure 64-bit codegen arithmetic, several
    times cheaper than the per-position md5 it replaced (r11) and
    reproduced digit-for-digit by the DuckDB oracle. Fingerprints
    shared by > {_WIN_CAP} documents are dropped before pair
    expansion (the LSH BUCKET_CAP stop-gram discipline, mirrored
    in the oracle), so the candidate join is density-bounded at any
    corpus size."""
    t = load(spark, sf_dir)

    def let(bind: str, var: str, body: str) -> str:
        # single-element-array lambda = a let-binding: `bind` is
        # evaluated ONCE per row and `var` may be referenced freely in
        # `body`. Plain chained selects are NOT enough — CollapseProject
        # inlines a single-use alias into the next projection, and an
        # alias referenced inside a later transform() lambda re-executes
        # per ELEMENT (measured: the whole hash pipeline re-ran per
        # window position, turning the query O(n^2) and hanging sf0.001)
        return f"element_at(transform(array({bind}), {var} -> {body}), 1)"

    cs_expr = "transform(split(text, ''), c -> cast(ascii(c) as bigint))"
    h_expr = (
        f"transform(sequence(1, size(cs) - {_WIN_K} + 1), "
        f"i -> (({_win_poly(lambda j: f'element_at(cs, i + {j})')})"
        f" % {_WIN_P}) * {_WIN_A} % {_WIN_P})"
    )
    # per-window fingerprint VALUE (not position): downstream consumes
    # only the per-doc fingerprint set, and the set of selected values
    # is exactly the set of window minima — the rightmost-on-ties
    # POSITION rule of the paper changes which occurrence is recorded,
    # never which value, so the O(n*w^2) argmin bookkeeping the r8-r10
    # form paid per position is dead weight (r11; was ~5s of the 16.5s)
    sel_expr = (
        f"array_distinct(transform(sequence(1, size(h) - {_WIN_W} + 1), "
        f"p -> array_min(slice(h, p, {_WIN_W}))))"
    )
    fps_expr = let(cs_expr, "cs", let(h_expr, "h", sel_expr))
    g = (
        t.documents.where(F.length("text") >= _WIN_K + _WIN_W - 1)
        .select("doc_id", F.expr(fps_expr).alias("fps"))
    )
    # feeds the cap aggregate AND both join sides. NOT persisted — a
    # MEASURED r11 reversal of the r8 choice (SCALE.md 'Winnowing
    # persist economics'): all three consumers hang off the same
    # distinct, so Spark's ReusedExchange serves them from the one
    # shuffle's files (already on disk, no executor-memory footprint),
    # and with the md5->integer hash the plan costs 6.1s vs 11.0s
    # cached at sf0.1. Exchange reuse is also the 100 TB answer: the
    # fingerprint frame never needs a second scan of documents.
    fp = g.select("doc_id", F.explode("fps").alias("fp")).distinct()
    keep = (
        fp.groupBy("fp")
        .agg(F.count("*").alias("n"))
        .where((F.col("n") >= 2) & (F.col("n") <= _WIN_CAP))
        .select("fp")
    )
    a = fp.join(keep, "fp").select("fp", F.col("doc_id").alias("id_a"))
    b = fp.select("fp", F.col("doc_id").alias("id_b"))
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= _WIN_MIN_SHARED)
    )


# --------------------------------------------------------------------------
# Heaps'-law vocabulary-growth fit (round 9)
# --------------------------------------------------------------------------
_HEAPS_CKPTS = 128


@query(
    "heaps_law_fit",
    # checkpoints = docs whose id is a multiple of a shared
    # data-derived stride (integer arithmetic, <= ~129 rows), so the
    # OLS runs on a bounded frame; ln/regression noise is absorbed by
    # the 4-digit rounding (the zipf_slope_fit discipline).
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\s+') END AS t
        FROM documents
    ),
    per AS (SELECT doc_id, len(t) AS ntok FROM toks),
    firsts AS (
        SELECT min(doc_id) AS fd
        FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
        GROUP BY tok
    ),
    news AS (SELECT fd AS doc_id, count(*) AS nnew FROM firsts GROUP BY fd),
    curve AS (
        SELECT p.doc_id,
               sum(p.ntok) OVER (ORDER BY p.doc_id) AS big_n,
               sum(coalesce(n.nnew, 0)) OVER (ORDER BY p.doc_id) AS v
        FROM per p LEFT JOIN news n ON n.doc_id = p.doc_id
    ),
    stride AS (
        SELECT greatest(1, (max(doc_id) + 1) // {_HEAPS_CKPTS}) AS s
        FROM per
    ),
    ck AS (
        SELECT big_n, v FROM curve, stride
        WHERE doc_id % s = 0 AND big_n > 0 AND v > 0
    )
    SELECT count(*) AS n_checkpoints,
           round(regr_slope(ln(v), ln(big_n)), 4) + 0.0 AS heaps_beta,
           round(exp(regr_intercept(ln(v), ln(big_n))), 4) + 0.0
               AS heaps_k,
           round(corr(ln(v), ln(big_n)) * corr(ln(v), ln(big_n)), 4)
               + 0.0 AS r2
    FROM ck
    """,
    tags=("text", "vocab", "profile", "bounded-window"),
)
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V(n) = K * n^beta of vocabulary growth in crawl
    (doc_id) order — the number that predicts how much NEW vocabulary
    the next 10x of corpus will bring (natural text sits near beta
    0.4-0.6; beta near 0 means the vocabulary has saturated and more
    crawl buys little lexical novelty; the planning companion to
    ngram_novelty_rate's repeat shares).

    Scale shape: per-doc token counts and first-occurrence-doc per
    type collapse the corpus in two keyed aggregations; the running
    (tokens, vocab) curve rides operators/rank.ordered_scan (no
    single-partition window over documents), checkpoints thin it to
    <= {_HEAPS_CKPTS} rows with a shared integer stride, and the
    log-log OLS runs on that bounded frame via the built-in bivariate
    aggregates."""
    from ..operators.rank import ordered_scan
    from ..operators.text import tokens_col

    t = load(spark, sf_dir)
    toks = t.documents.select(
        "doc_id", tokens_col(F.col("text")).alias("t")
    )
    per = toks.select("doc_id", F.size("t").alias("ntok"))
    firsts = (
        toks.select("doc_id", F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("fd"))
    )
    news = firsts.groupBy(F.col("fd").alias("doc_id")).agg(
        F.count("*").alias("nnew")
    )
    joined = per.join(news, "doc_id", "left").select(
        "doc_id", "ntok",
        F.coalesce(F.col("nnew"), F.lit(0)).alias("nnew"),
    )
    curve = ordered_scan(
        joined, ["doc_id"], running={"big_n": "ntok", "v": "nnew"},
        checkpoint_input=True,
    )
    stride = per.agg(
        F.greatest(
            F.lit(1),
            F.floor((F.max("doc_id") + 1) / _HEAPS_CKPTS).cast("long"),
        ).alias("s")
    )
    ck = (
        curve.crossJoin(F.broadcast(stride))
        .where(
            (F.col("doc_id") % F.col("s") == 0)
            & (F.col("big_n") > 0) & (F.col("v") > 0)
        )
    )
    lv, ln_ = F.log(F.col("v")), F.log(F.col("big_n"))
    return ck.agg(
        F.count("*").alias("n_checkpoints"),
        (F.round(F.regr_slope(lv, ln_), 4) + 0.0).alias("heaps_beta"),
        (F.round(F.exp(F.regr_intercept(lv, ln_)), 4) + 0.0)
        .alias("heaps_k"),
        (F.round(F.corr(lv, ln_) * F.corr(lv, ln_), 4) + 0.0)
        .alias("r2"),
    )


# --------------------------------------------------------------------------
# Tokenizer fertility by language (round 9)
# --------------------------------------------------------------------------
@query(
    "tokenizer_fertility",
    # everything is exact integer sums (token counts, character
    # lengths) per language; the three ratios are single divisions of
    # exact integers — identical doubles on both engines.
    oracle=r"""
    WITH per AS (
        SELECT lang,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+'))
               END AS n_tok,
               len(trim(text)) AS n_chr
        FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           round(CAST(sum(n_tok) AS DOUBLE) / count(*), 6) + 0.0
               AS tokens_per_doc,
           round(CAST(sum(n_chr) AS DOUBLE) / sum(n_tok), 6) + 0.0
               AS chars_per_token,
           round(CAST(sum(n_chr) - sum(n_tok) + count(*) AS DOUBLE)
                 / sum(n_tok), 6) + 0.0 AS word_chars_per_token
    FROM per
    GROUP BY lang
    HAVING sum(n_tok) > 0
    """,
    tags=("text", "tokenizer", "profile"),
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: tokens per document and
    characters per token under the whitespace tokenizer — the
    budgeting numbers a training-data pipeline needs to convert a raw
    character census into a token budget per language (fertility
    varies 2-4x across languages for any fixed tokenizer, so per-lang
    rates — not one global average — drive the mixture math).
    word_chars_per_token removes the single inter-token separator per
    token (chars - (n_tok - 1) per doc) for the whitespace-free rate.

    Scale shape: one map-side-combined groupBy over per-doc integer
    counts; payload text never shuffles (counts are computed in the
    scan stage)."""
    from ..operators.text import tokens_col

    t = load(spark, sf_dir)
    per = t.documents.select(
        "lang",
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tok"),
        F.length(F.trim(F.col("text"))).cast("long").alias("n_chr"),
    )
    g = per.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.sum("n_chr").alias("s_chr"),
    )
    return g.where(F.col("n_tokens") > 0).select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (
            F.round(
                F.col("n_tokens").cast("double") / F.col("n_docs"), 6
            ) + 0.0
        ).alias("tokens_per_doc"),
        (
            F.round(
                F.col("s_chr").cast("double") / F.col("n_tokens"), 6
            ) + 0.0
        ).alias("chars_per_token"),
        (
            F.round(
                (
                    F.col("s_chr") - F.col("n_tokens") + F.col("n_docs")
                ).cast("double") / F.col("n_tokens"),
                6,
            ) + 0.0
        ).alias("word_chars_per_token"),
    )


# --------------------------------------------------------------------------
# Lexical diversity per source (round 9)
# --------------------------------------------------------------------------
@query(
    "lexical_diversity_by_source",
    # V, N and the type-frequency second moment are exact integers per
    # source; TTR / root-TTR / Yule's K / Simpson are single closed
    # expressions over them — identical doubles both engines.
    oracle=r"""
    WITH tok AS (
        SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents WHERE trim(text) <> ''
    ),
    tf AS (
        SELECT source, w, count(*) AS f FROM tok GROUP BY 1, 2
    ),
    m AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS v,
               CAST(sum(f) AS BIGINT) AS n,
               CAST(sum(f * f) AS BIGINT) AS s2
        FROM tf GROUP BY source
    )
    SELECT source, v AS n_types, n AS n_tokens,
           round(CAST(v AS DOUBLE) / n, 6) + 0.0 AS ttr,
           round(CAST(v AS DOUBLE) / sqrt(CAST(n AS DOUBLE)), 6) + 0.0
               AS root_ttr,
           round(1e4 * (CAST(s2 AS DOUBLE) - n)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) + 0.0
               AS yule_k,
           round((CAST(s2 AS DOUBLE) - n)
                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)), 6)
               + 0.0 AS simpson_d
    FROM m
    """,
    tags=("text", "vocab", "profile"),
)
def lexical_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per source: type-token ratio, Guiraud's root
    TTR (length-robust), Yule's characteristic K and Simpson's
    repeat-rate D — the vocabulary-richness panel that separates
    template/boilerplate-heavy sources (high K, low TTR) from
    lexically rich ones before mixing (the per-source companion to
    heaps_law_fit's whole-corpus growth curve; Yule 1944, Simpson
    1949, Guiraud 1954).

    Scale shape: explode to (source, token) then two keyed map-side-
    combined aggregations (term frequency, then the per-source
    moments); every statistic is a closed expression over three exact
    integers — no float crosses a shuffle."""
    from ..operators.text import tokens_col

    t = load(spark, sf_dir)
    tok = (
        t.documents.where(F.trim(F.col("text")) != "")
        .select(
            "source",
            F.explode(tokens_col(F.col("text"))).alias("w"),
        )
    )
    tf = tok.groupBy("source", "w").agg(F.count("*").alias("f"))
    m = tf.groupBy("source").agg(
        F.count("*").cast("long").alias("v"),
        F.sum("f").cast("long").alias("n"),
        F.expr("sum(f * f)").cast("long").alias("s2"),
    )
    vd = F.col("v").cast("double")
    nd = F.col("n").cast("double")
    s2d = F.col("s2").cast("double")
    return m.select(
        "source",
        F.col("v").alias("n_types"),
        F.col("n").alias("n_tokens"),
        (F.round(vd / F.col("n"), 6) + 0.0).alias("ttr"),
        (F.round(vd / F.sqrt(nd), 6) + 0.0).alias("root_ttr"),
        (F.round(1e4 * (s2d - F.col("n")) / (nd * nd), 6) + 0.0).alias(
            "yule_k"
        ),
        (
            F.round((s2d - F.col("n")) / (nd * (nd - 1)), 6) + 0.0
        ).alias("simpson_d"),
    )


# --------------------------------------------------------------------------
# Cohen's kappa for the langid classifier (round 9)
# --------------------------------------------------------------------------
@query(
    "cohens_kappa_langid",
    # the confusion counts are the langid_confusion exact integers
    # (shared codegen classifier both engines); po/pe/kappa are closed
    # expressions over them — the marginal-product sum runs over a
    # bounded label frame.
    oracle=rf"""
    WITH toks AS (
        SELECT lang,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\s+') END AS t
        FROM documents
    ),
    scored AS (
        SELECT lang,
               {_langid_score_sql(_LANGID_PROFILES["en"])} AS s_en,
               {_langid_score_sql(_LANGID_PROFILES["es"])} AS s_es,
               {_langid_score_sql(_LANGID_PROFILES["fr"])} AS s_fr,
               {_langid_score_sql(_LANGID_PROFILES["de"])} AS s_de
        FROM toks
    ),
    conf AS (
        SELECT lang,
               CASE WHEN greatest(s_en, s_es, s_fr, s_de) <= 0 THEN 'und'
                    WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de
                        THEN 'en'
                    WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
                    WHEN s_fr >= s_de THEN 'fr'
                    ELSE 'de' END AS predicted,
               count(*) AS n
        FROM scored GROUP BY 1, 2
    ),
    tot AS (SELECT sum(n) AS nt FROM conf),
    rows_ AS (SELECT lang AS lab, sum(n) AS nr FROM conf GROUP BY lang),
    cols_ AS (
        SELECT predicted AS lab, sum(n) AS nc FROM conf GROUP BY predicted
    ),
    po AS (
        SELECT sum(CASE WHEN lang = predicted THEN n ELSE 0 END) AS agree
        FROM conf
    ),
    pe AS (
        SELECT sum(CAST(r.nr AS DOUBLE) * c.nc) AS cross_sum
        FROM rows_ r JOIN cols_ c ON c.lab = r.lab
    )
    SELECT CAST(tot.nt AS BIGINT) AS n_docs,
           round(CAST(po.agree AS DOUBLE) / tot.nt, 6) + 0.0 AS p_observed,
           round(pe.cross_sum / (CAST(tot.nt AS DOUBLE) * tot.nt), 6)
               + 0.0 AS p_expected,
           round((CAST(po.agree AS DOUBLE) / tot.nt
                  - pe.cross_sum / (CAST(tot.nt AS DOUBLE) * tot.nt))
                 / (1.0 - pe.cross_sum
                          / (CAST(tot.nt AS DOUBLE) * tot.nt)), 6)
               + 0.0 AS kappa
    FROM tot, po, pe
    """,
    tags=("text", "langid", "eval"),
)
def cohens_kappa_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between declared language and the n-gram langid
    classifier's prediction — chance-corrected agreement (Cohen 1960),
    the single-number summary of langid_confusion's matrix that stays
    honest when the label distribution is skewed (raw accuracy
    wouldn't).

    Scale shape + parity: the shared codegen classifier collapses the
    corpus to a bounded confusion frame in one aggregate; marginals,
    the diagonal, and the kappa algebra all run on that tiny frame
    over exact integers."""
    from ..operators.text import language_id_col

    t = load(spark, sf_dir)
    conf = (
        t.documents.select(
            "lang", language_id_col(F.col("text")).alias("predicted")
        )
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
    )
    tot = conf.agg(F.sum("n").alias("nt"))
    rows_ = conf.groupBy(F.col("lang").alias("lab")).agg(
        F.sum("n").alias("nr")
    )
    cols_ = conf.groupBy(F.col("predicted").alias("lab")).agg(
        F.sum("n").alias("nc")
    )
    po = conf.agg(
        F.sum(
            F.when(F.col("lang") == F.col("predicted"), F.col("n"))
            .otherwise(0)
        ).alias("agree")
    )
    pe = rows_.join(cols_, "lab").agg(
        F.sum(F.col("nr").cast("double") * F.col("nc")).alias(
            "cross_sum"
        )
    )
    j = (
        tot.crossJoin(F.broadcast(po))
        .crossJoin(F.broadcast(pe))
    )
    ntd = F.col("nt").cast("double")
    pod = F.col("agree").cast("double") / ntd
    ped = F.col("cross_sum") / (ntd * ntd)
    return j.select(
        F.col("nt").cast("long").alias("n_docs"),
        (F.round(pod, 6) + 0.0).alias("p_observed"),
        (F.round(ped, 6) + 0.0).alias("p_expected"),
        (F.round((pod - ped) / (1.0 - ped), 6) + 0.0).alias("kappa"),
    )


# --------------------------------------------------------------------------
# Term burstiness (round 9)
# --------------------------------------------------------------------------
_BURST_TOP = 20


@query(
    "term_burstiness_top",
    # per-doc term counts, document frequency and the count moments
    # are exact integers; burstiness = var/mean is a closed expression
    # over them; the top cut is deterministic under (df DESC, term).
    oracle=rf"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents WHERE trim(text) <> ''
    ),
    nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tok),
    tf AS (
        SELECT w, doc_id, count(*) AS c FROM tok GROUP BY w, doc_id
    ),
    mo AS (
        SELECT w,
               count(*) AS df,
               sum(c) AS cf,
               sum(c * c) AS cf2
        FROM tf GROUP BY w
    ),
    top AS (
        SELECT w, df, cf, cf2 FROM mo
        ORDER BY df DESC, w LIMIT {_BURST_TOP}
    )
    SELECT w AS term,
           CAST(df AS BIGINT) AS doc_freq,
           CAST(cf AS BIGINT) AS coll_freq,
           round(CAST(cf AS DOUBLE) / df, 6) + 0.0
               AS mean_count_when_present,
           round((CAST(cf2 AS DOUBLE)
                  - CAST(cf AS DOUBLE) * cf / n_docs)
                 / (n_docs - 1)
                 / (CAST(cf AS DOUBLE) / n_docs), 6) + 0.0
               AS burstiness_vmr
    FROM top, nd
    """,
    tags=("text", "profile", "bounded-window"),
)
def term_burstiness_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness of the {_BURST_TOP} highest-document-frequency terms:
    the variance-to-mean ratio of per-document counts (zeros included
    via the moment identity — absent docs contribute only to n) — the
    Church-Gale diagnostic separating function words (VMR near 1,
    Poisson-like) from bursty content words (VMR >> 1), which is what
    decides whether a term is a stopword candidate or a topic carrier
    in curation.

    Scale shape + parity: explode + two keyed map-side-combined
    aggregations collapse the corpus to per-term integer moments; the
    variance-over-all-docs comes from the moment identity (no
    zero-filled doc-term matrix is ever materialized); the top cut is
    a TakeOrdered under a total order."""
    from ..operators.text import tokens_col

    t = load(spark, sf_dir)
    tok = (
        t.documents.where(F.trim(F.col("text")) != "")
        .select("doc_id", F.explode(tokens_col(F.col("text"))).alias("w"))
    )
    nd = tok.agg(F.countDistinct("doc_id").alias("n_docs"))
    tf = tok.groupBy("w", "doc_id").agg(F.count("*").alias("c"))
    mo = tf.groupBy("w").agg(
        F.count("*").alias("df"),
        F.sum("c").alias("cf"),
        F.expr("sum(c * c)").alias("cf2"),
    )
    top = mo.orderBy(F.col("df").desc(), "w").limit(_BURST_TOP)
    j = top.crossJoin(F.broadcast(nd))
    cfd = F.col("cf").cast("double")
    ndd = F.col("n_docs")
    return j.select(
        F.col("w").alias("term"),
        F.col("df").cast("long").alias("doc_freq"),
        F.col("cf").cast("long").alias("coll_freq"),
        (F.round(cfd / F.col("df"), 6) + 0.0).alias(
            "mean_count_when_present"
        ),
        (
            F.round(
                (F.col("cf2").cast("double") - cfd * F.col("cf") / ndd)
                / (ndd - 1)
                / (cfd / ndd),
                6,
            ) + 0.0
        ).alias("burstiness_vmr"),
    )


# --------------------------------------------------------------------------
# Capture-recapture vocabulary estimate (round 9)
# --------------------------------------------------------------------------
@query(
    "vocab_capture_recapture",
    # the two "captures" are deterministic md5 doc-halves (the
    # deterministic_sample_stats hashing rule), so both engines draw
    # identical samples; type counts and the overlap are exact
    # integers and the Chapman estimator is one closed expression.
    oracle=r"""
    WITH halves AS (
        SELECT CASE WHEN (CAST(('0x' || substr(md5(
                   'vcr|' || CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % 2) = 0 THEN 0 ELSE 1 END AS grp,
               text
        FROM documents WHERE trim(text) <> ''
    ),
    tok AS (
        SELECT grp, unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM halves
    ),
    pres AS (
        SELECT w,
               max(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS in_a,
               max(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS in_b
        FROM tok GROUP BY w
    ),
    c AS (
        SELECT sum(in_a) AS n1, sum(in_b) AS n2,
               sum(in_a * in_b) AS m, count(*) AS v_true
        FROM pres
    )
    SELECT CAST(n1 AS BIGINT) AS types_sample_a,
           CAST(n2 AS BIGINT) AS types_sample_b,
           CAST(m AS BIGINT) AS types_in_both,
           CAST(v_true AS BIGINT) AS vocab_true,
           round((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)) / (m + 1) - 1.0,
                 2) + 0.0 AS vocab_chapman,
           round(((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)) / (m + 1) - 1.0)
                 / v_true, 6) + 0.0 AS estimate_ratio
    FROM c
    """,
    tags=("text", "vocab", "stats"),
)
def vocab_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture-recapture estimate of vocabulary size: split
    the corpus into two deterministic content-hash halves, treat each
    half's type set as a 'capture', and estimate total vocabulary from
    the overlap (N-hat = (n1+1)(n2+1)/(m+1) - 1, the bias-corrected
    Lincoln-Petersen of ecology's species-richness toolkit) — REPORTED
    AGAINST the true count, so the query measures how far
    capture-recapture is from truth on a Zipf-skewed population (the
    rare-type tail makes it a known underestimate; companion to
    heaps_law_fit's growth view and kmv_distinct_estimate's sketch).

    Scale shape + parity: the halves come from the shared md5 rule (no
    RNG), types collapse in one explode + presence aggregate, and the
    estimator is a closed expression over four exact integers."""
    from ..operators.text import tokens_col

    t = load(spark, sf_dir)
    grp = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("vcr|"), F.col("doc_id").cast("string")
                    )
                ),
                1, 8,
            ),
            16, 10,
        ).cast("long") % 2
    )
    halves = t.documents.where(F.trim(F.col("text")) != "").select(
        grp.alias("grp"), "text"
    )
    tok = halves.select(
        "grp", F.explode(tokens_col(F.col("text"))).alias("w")
    )
    pres = tok.groupBy("w").agg(
        F.max(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("in_b"),
    )
    c = pres.agg(
        F.sum("in_a").alias("n1"),
        F.sum("in_b").alias("n2"),
        F.expr("sum(in_a * in_b)").alias("m"),
        F.count("*").alias("v_true"),
    )
    n1, n2, m, vt = F.col("n1"), F.col("n2"), F.col("m"), F.col("v_true")
    chapman = (
        (n1 + 1).cast("double") * (n2 + 1) / (m + 1) - 1.0
    )
    return c.select(
        n1.cast("long").alias("types_sample_a"),
        n2.cast("long").alias("types_sample_b"),
        m.cast("long").alias("types_in_both"),
        vt.cast("long").alias("vocab_true"),
        (F.round(chapman, 2) + 0.0).alias("vocab_chapman"),
        (F.round(chapman / vt, 6) + 0.0).alias("estimate_ratio"),
    )
