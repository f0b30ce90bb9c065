"""Scalar/aggregate function surface.

The reference's function inventory (SURVEY §2.7) maps almost entirely to
built-in pyspark.sql.functions; these modules add the pieces that don't:
a distributed Bloom filter with the reference's algebra
(common/util/bloom/BloomFilter.java) and the hash-function dispatch
(common/util/hash/Hash.java).
"""

from hadoop_source_spark.functions.bloom import (
    bloom_and,
    bloom_build,
    bloom_or,
    bloom_probe,
    bloom_xor,
)
from hadoop_source_spark.functions.hashes import (
    crc32,
    md5_hex,
    murmur3_32,
    sha256_hex,
    xxhash64,
)

__all__ = [
    "bloom_build",
    "bloom_probe",
    "bloom_and",
    "bloom_or",
    "bloom_xor",
    "murmur3_32",
    "xxhash64",
    "md5_hex",
    "sha256_hex",
    "crc32",
]
