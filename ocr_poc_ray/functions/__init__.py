"""Large-scale training-data operations.

First-class components alongside the extraction pipeline: text
analysis, deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding-cosine), approximate similarity search, and
multimodal column plumbing.  Each operates on a `ray.data.Dataset`
and follows the scale rules: vectorized batch kernels, partial
aggregation before shuffles, broadcast small sides, deterministic
hashing (never Python's seeded ``hash``).
"""

from ocr_poc_ray.functions.textstats import (
    add_fingerprints,
    add_langid,
    add_quality,
    add_token_counts,
)
from ocr_poc_ray.functions.dedup import (
    connected_components,
    connected_components_distributed,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    ngram_jaccard_verify,
    simhash_pairs,
    substring_dedup,
)
from ocr_poc_ray.functions.similarity import (
    embedding_near_dup_pairs,
    knn_brute_force,
    knn_ivf,
    contrastive_pairs,
    knn_lsh,
    semantic_dedup,
)
from ocr_poc_ray.functions.sketches import (
    hll_count_distinct,
    hll_count_distinct_by,
    quantile_sketch_by,
)
from ocr_poc_ray.functions.prefix import ordered_prefix_sum
from ocr_poc_ray.functions.windows import asof_match, range_join_window, rolling_mean, sessionize

__all__ = [
    "sessionize",
    "asof_match",
    "range_join_window",
    "rolling_mean",
    "ordered_prefix_sum",
    "hll_count_distinct",
    "hll_count_distinct_by",
    "quantile_sketch_by",
    "add_fingerprints",
    "add_langid",
    "add_quality",
    "add_token_counts",
    "exact_dedup",
    "substring_dedup",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "ngram_jaccard_verify",
    "simhash_pairs",
    "connected_components",
    "connected_components_distributed",
    "embedding_near_dup_pairs",
    "knn_brute_force",
    "knn_ivf",
    "knn_lsh",
]
