"""Reusable Spark operators the engine adds beyond Catalyst built-ins:
as-of joins, dedup families (exact / MinHash / SimHash / n-gram),
duplicate clustering, distributed percentiles, deterministic sampling,
merge/upsert, similarity search, text analysis, multimodal plumbing.

The flagship kernels re-export here so users import one namespace:

    from finanalyzer_spark.operators import (
        asof_join, connected_components, dedup_by_key,
        grouped_exact_percentiles, minhash_lsh_pairs, ...
    )
"""

from .components import connected_components  # noqa: F401
from .dedup import (  # noqa: F401
    dedup_by_key,
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard,
    simhash_fingerprints,
)
from .ids import positional_ids  # noqa: F401
from .joins import asof_join  # noqa: F401
from .percentiles import grouped_exact_percentiles  # noqa: F401
from .sampling import (  # noqa: F401
    deterministic_sample,
    hash_bucket_col,
    split_col,
    stratified_sample,
)
from .skew import salted_join  # noqa: F401
from .bpe import bpe_encode, fit_bpe  # noqa: F401
from .heavy import heavy_hitters  # noqa: F401
from .intervals import sweep_concurrency  # noqa: F401
from .multimodal import extract_patches, resize_images  # noqa: F401
