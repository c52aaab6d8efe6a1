from clickhouse_k_means_spark.functions.distance import (
    cosine_similarity,
    dot,
    l2_distance,
    l2_norm,
    sq_l2_distance,
)
from clickhouse_k_means_spark.functions.centroids import (
    centroid_arrays,
    nearest_centroid,
    nearest_centroid_struct,
)
from clickhouse_k_means_spark.functions.hashing import (
    hash64,
    md5_hex,
    minhash_expr,
    simhash,
)
from clickhouse_k_means_spark.functions.text import (
    char_ngrams,
    normalize_text,
    punct_ratio,
    stopword_ratio,
    token_count,
    tokens,
    word_shingles,
)

__all__ = [
    "l2_distance",
    "sq_l2_distance",
    "dot",
    "l2_norm",
    "cosine_similarity",
    "nearest_centroid",
    "nearest_centroid_struct",
    "centroid_arrays",
    "hash64",
    "md5_hex",
    "minhash_expr",
    "simhash",
    "tokens",
    "token_count",
    "normalize_text",
    "word_shingles",
    "char_ngrams",
    "punct_ratio",
    "stopword_ratio",
]
