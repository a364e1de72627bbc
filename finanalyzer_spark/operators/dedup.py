"""Deduplication operators — exact and near-duplicate.

The reference deduplicates with ROW_NUMBER over (dateValue, namesId)
partitions and deletes n>1 (finanalyzer/database/sql/redundancy.sql) —
exact key-dedup with an arbitrary survivor. The engine generalizes
this to the LLM-corpus dedup families (BASELINE.json):

* exact: hash-groupBy on content fingerprint — one shuffle.
* key dedup with deterministic survivor — row_number over ordered
  partition (the oracle-checkable variant of dropDuplicates).
* MinHash + LSH banding: shingle → k portable min-hashes → band →
  self-join on (band_id, band_hash) buckets → candidate pairs.
  Shuffle cost O(docs × bands), never O(docs²).
* SimHash: 64-bit weighted-projection fingerprint; near-dups differ in
  few bits — bucket on rotated prefixes for candidate generation.
* n-gram Jaccard: exact verify step for candidate pairs.

Portability note: min-hashes here are md5 hex strings (lexicographic
min), NOT engine-native hash() — md5 is byte-identical in Spark and
DuckDB, so every stage is oracle-checkable. md5 costs more than
xxhash64; swap `_portable_hash` for xxhash64 when oracle parity is not
needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------
def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group identical content by fingerprint; keep min-id as canonical.
    One shuffle on the 16-byte hash — at 100 TB this is the cheapest
    possible exact dedup (shuffles digests, not documents)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def dedup_by_key(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """Deterministic-survivor key dedup: redundancy.sql semantics with
    an explicit ORDER BY (reference survivor is arbitrary; ours is
    reproducible)."""
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


# --------------------------------------------------------------------------
# shingling + MinHash
# --------------------------------------------------------------------------
def shingles_col(text: Column, k: int = 3) -> Column:
    """Word k-shingles as an array<string>; shorter docs yield their
    single full-token-join shingle; empty docs → empty array."""
    toks = F.when(F.trim(text) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(text), r"\s+")
    )
    n = F.size(toks)
    # sequence over token starts; slice+join per start
    starts = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.when(n > 0, F.sequence(F.lit(0), F.lit(0))).otherwise(
            F.array().cast("array<int>")
        )
    )
    return F.transform(
        starts,
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )


def minhash_signature(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 16, k: int = 3
) -> DataFrame:
    """id → array of `num_hashes` portable min-hash values.

    Hash_i(shingle) = md5(i || ':' || shingle); the signature element is
    the lexicographic min — identical strings hash identically in any
    engine. Computed as a pure array expression (no explode, no
    shuffle): per row, transform seeds × aggregate over shingles.
    """
    sh = shingles_col(F.col(text_col), k).alias("_sh")
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    sig = F.transform(
        seeds,
        lambda i: F.array_min(
            F.transform(
                F.col("_sh"),
                lambda s: F.md5(F.concat(i.cast("string"), F.lit(":"), s)),
            )
        ),
    )
    return (
        df.select(F.col(id_col), sh)
        .where(F.size("_sh") > 0)  # empty docs have no signature (oracle parity)
        .select(F.col(id_col), sig.alias("signature"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding.

    rows_per_band = num_hashes // bands; docs sharing ANY full band
    become a candidate pair. Output: (id_a, id_b) with id_a < id_b,
    distinct. Cost: explode to docs×bands rows (tiny: band hash is one
    md5), groupBy band bucket, pair within bucket. At 100 TB the
    bucket sizes are the skew risk — salt or cap oversized buckets
    upstream (see `explode` note below).
    """
    r = num_hashes // bands
    sig = minhash_signature(df, text_col, id_col, num_hashes, k)
    banded = sig.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.array_join(F.slice(F.col("signature"), b * r + 1, r), "|")
                    ).alias("bhash"),
                ),
            )
        ).alias("bb"),
    ).select(F.col(id_col), F.col("bb.band").alias("band"), F.col("bb.bhash").alias("bhash"))

    a = banded.select(
        F.col("band"), F.col("bhash"), F.col(id_col).alias("id_a")
    )
    b = banded.select(
        F.col("band"), F.col("bhash"), F.col(id_col).alias("id_b")
    )
    return (
        a.join(b, ["band", "bhash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard(
    pairs: DataFrame, docs: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Exact Jaccard over word-k-shingle sets for candidate pairs.

    pairs: (id_a, id_b). Joins each side's shingle set and computes
    |∩|/|∪| with array_intersect/array_union on deduped shingle arrays.
    Verify step after LSH — only runs on candidates, never all pairs.
    """
    sets = docs.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(shingles_col(F.col(text_col), k)).alias("_set"),
    )
    out = (
        pairs.join(sets.withColumnRenamed("_id", "id_a").withColumnRenamed("_set", "set_a"), "id_a")
        .join(sets.withColumnRenamed("_id", "id_b").withColumnRenamed("_set", "set_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("set_a", "set_b"))
                / F.greatest(F.size(F.array_union("set_a", "set_b")), F.lit(1))
            ).alias("jaccard"),
        )
    )
    return out


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------
def simhash_col(text: Column, bits: int = 32) -> Column:
    """SimHash fingerprint (default 32-bit for portable integer math).

    Per token: h = first 8 hex chars of md5(token) as int; each bit
    votes ±1; fingerprint bit b = 1 iff the vote sum > 0. Pure array
    expressions — aggregate over tokens × transform over bits.

    Bit extraction uses floor(h / 2^b) % 2 rather than shift ops: the
    division by a power of two is EXACT in binary FP (only the exponent
    changes), so Spark and any oracle engine agree bit-for-bit, and it
    sidesteps shiftright's literal-only second argument.
    """
    toks = F.when(F.trim(text) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(text), r"\s+")
    )
    hashes = F.transform(
        toks, lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long")
    )

    def bit_of(h: Column, b: Column) -> Column:
        return F.floor(h / F.pow(F.lit(2.0), b)).cast("long") % 2

    bit_ids = F.sequence(F.lit(0), F.lit(bits - 1))
    return F.aggregate(
        F.transform(
            bit_ids,
            lambda b: F.when(
                F.aggregate(
                    hashes,
                    F.lit(0).cast("long"),
                    lambda acc, h: acc + F.when(bit_of(h, b) == 1, 1).otherwise(-1),
                )
                > 0,
                F.pow(F.lit(2.0), b).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
