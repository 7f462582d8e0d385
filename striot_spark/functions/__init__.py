"""Derived-operator library: the training-data-pipeline surface.

Submodules group by concern — import the submodule for the full API;
the names re-exported here are the primary entry points.
"""

from striot_spark.functions.analytics import (
    freq_map,
    median_money,
    percentile_money,
    sessionize,
    threshold_cross,
    topk,
)
from striot_spark.functions.dedup import (
    contamination_check,
    contamination_scores,
    cross_corpus_near_dup_pairs,
    dedup_groups,
    exact_dedup,
    lsh_near_dup_pairs,
    minhash_signatures,
    prefix_filter_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
)
from striot_spark.functions.sampling import (
    corpus_mix,
    hash_sample,
    reservoir_sample,
    split_assign,
)
from striot_spark.functions.similarity import (
    brute_force_topk,
    cosine_near_dup_pairs,
    ivf_topk,
    kmeans,
    lsh_topk,
    nearest_centroid,
    semantic_near_dup_pairs,
    random_projection,
)
from striot_spark.functions.text import (
    build_vocab,
    chunk_documents,
    encode_documents,
    pack_sequences,
    repetition_stats,
)

__all__ = [
    "freq_map",
    "median_money",
    "percentile_money",
    "sessionize",
    "threshold_cross",
    "topk",
    "contamination_check",
    "contamination_scores",
    "cross_corpus_near_dup_pairs",
    "dedup_groups",
    "exact_dedup",
    "lsh_near_dup_pairs",
    "minhash_signatures",
    "prefix_filter_jaccard_pairs",
    "simhash",
    "simhash_near_dup_pairs",
    "corpus_mix",
    "hash_sample",
    "reservoir_sample",
    "split_assign",
    "brute_force_topk",
    "cosine_near_dup_pairs",
    "ivf_topk",
    "kmeans",
    "lsh_topk",
    "nearest_centroid",
    "semantic_near_dup_pairs",
    "random_projection",
    "build_vocab",
    "chunk_documents",
    "encode_documents",
    "pack_sequences",
    "repetition_stats",
]
