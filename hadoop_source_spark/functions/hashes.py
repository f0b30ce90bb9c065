"""Hash-function dispatch (common/util/hash/Hash.java:—, MurmurHash.java:33,
JenkinsHash.java:46; digests common/io/MD5Hash.java:35,
common/util/PureJavaCrc32.java:39).

Thin, named wrappers over the engine-native hashes so callers get the
reference's vocabulary with Spark's JVM implementations: Spark's hash() IS
Murmur3_x86_32 and xxhash64 is the modern stand-in for JenkinsHash's role
(fast non-crypto 64-bit)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def murmur3_32(*cols: Column | str, seed: int = 42) -> Column:
    """Murmur3 32-bit (Spark's native hash; MurmurHash.java:33 analog).

    Spark exposes Murmur3 only with its fixed seed (42); SQL hash() takes
    no seed argument, so any other seed cannot be honored and raises."""
    if seed != 42:
        raise ValueError(
            "Spark's hash() is Murmur3 with fixed seed 42; "
            f"seed={seed} is not expressible"
        )
    return F.hash(*cols)


def xxhash64(*cols: Column | str) -> Column:
    """64-bit fast hash (JenkinsHash.java:46 role)."""
    return F.xxhash64(*cols)


def md5_hex(col: Column | str) -> Column:
    """MD5 hex digest of UTF-8 bytes (MD5Hash.java:35)."""
    return F.md5(F.encode(F.col(col) if isinstance(col, str) else col, "UTF-8"))


def sha256_hex(col: Column | str) -> Column:
    return F.sha2(
        F.encode(F.col(col) if isinstance(col, str) else col, "UTF-8"), 256
    )


def crc32(col: Column | str) -> Column:
    """CRC32 (PureJavaCrc32.java:39)."""
    return F.crc32(
        F.encode(F.col(col) if isinstance(col, str) else col, "UTF-8")
    )
