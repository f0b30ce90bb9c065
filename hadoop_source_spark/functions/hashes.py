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


def writable_hash(col: Column | str) -> Column:
    """Bit-exact `WritableComparator.hashBytes` (WritableComparator.
    java:192: `hash = 1; hash = 31*hash + (int)bytes[i]`) — the
    hashCode every BinaryComparable Writable (Text included,
    io/Text.java:353 via BinaryComparable) carries, and therefore the
    hash the classic HashPartitioner shuffles on. Exact for ASCII
    values, where the signed-byte fold and the code-point fold
    coincide (multi-byte UTF-8 would need signed-byte semantics —
    callers hash keys/paths, which are ASCII by construction here).

    Pure fold over the characters with 32-bit signed wraparound done
    in bigint arithmetic (ANSI-safe, reproducible in any engine):
    h' = pmod(31*h + code + 2^31, 2^32) - 2^31 — pmod, not %, because
    the intermediate goes negative and %'s sign follows the dividend."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.filter(F.split(c, ""), lambda s: F.length(s) > 0),
        F.lit(1).cast("long"),
        lambda h, ch: (
            F.pmod(h * 31 + F.ascii(ch) + F.lit(2147483648), F.lit(4294967296))
            - F.lit(2147483648)
        ),
    )


def java_string_hash(col: Column | str) -> Column:
    """Bit-exact `java.lang.String.hashCode()` (`h = 31*h + charAt(i)`
    over UTF-16 chars, seed 0 — vs WritableComparator's seed-1 byte
    fold above). This is the hash HashBasedRouterPolicy routes queues
    by (`router/HashBasedRouterPolicy.java:98`:
    `Math.abs(queue.hashCode() % size)`). Exact for BMP text, where
    one character is one UTF-16 code unit and `F.ascii`'s code point
    equals it (queue names are ASCII by construction). Same
    ANSI-safe pmod wraparound trick as `writable_hash`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.filter(F.split(c, ""), lambda s: F.length(s) > 0),
        F.lit(0).cast("long"),
        lambda h, ch: (
            F.pmod(h * 31 + F.ascii(ch) + F.lit(2147483648), F.lit(4294967296))
            - F.lit(2147483648)
        ),
    )


def hash_partition(col: Column | str, num_partitions: int) -> Column:
    """The HashPartitioner assignment `(hash & Integer.MAX_VALUE) %
    numPartitions` over `writable_hash` — how every keyed record in
    the reference's shuffle picks its reducer. The sign-bit clear is
    `h + 2^31` for negative h (two's-complement 32-bit)."""
    h = writable_hash(col)
    nonneg = F.when(h < 0, h + F.lit(2147483648)).otherwise(h)
    return (nonneg % num_partitions).cast("int")
