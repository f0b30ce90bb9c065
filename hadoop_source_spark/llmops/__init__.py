"""LLM training-data pipeline operators.

The reference ships the primitives (MurmurHash common/util/hash/MurmurHash.java:33,
Bloom filters common/util/bloom/*, MD5Hash common/io/MD5Hash.java:35,
quantile sketches); these modules compose their Spark analogs into the
operators a 100 TB corpus pipeline needs: dedup, similarity search,
text analysis, multimodal column plumbing.
"""

from hadoop_source_spark.llmops.dedup import (
    exact_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_dup_pairs,
)
from hadoop_source_spark.llmops.similarity import brute_force_topk, lsh_topk
from hadoop_source_spark.llmops.textstats import (
    doc_profile,
    doc_stats,
    language_id,
    token_count,
)

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_dup_pairs",
    "brute_force_topk",
    "lsh_topk",
    "doc_profile",
    "doc_stats",
    "language_id",
    "token_count",
]
