"""Writable type system → Spark SQL types (SURVEY §1.2).

The reference serializes rows as (key, value) Writable pairs
(common/io/Writable.java:69; sorted containers need WritableComparable,
common/io/WritableComparable.java:74). This table is the engine's
normative mapping; tests round-trip every type through parquet.

Raw-byte comparison (WritableComparator.java:155 / FastByteComparisons)
needs no mapping: Tungsten's UnsafeRow binary comparison is the built-in
equivalent.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Writable class (cite: common/io/) → Spark SQL type
WRITABLE_TO_SPARK: dict[str, T.DataType] = {
    "NullWritable": T.NullType(),            # NullWritable.java:29
    "BooleanWritable": T.BooleanType(),      # BooleanWritable.java:31
    "ByteWritable": T.ByteType(),            # ByteWritable.java:29
    "ShortWritable": T.ShortType(),          # ShortWritable.java:31
    "IntWritable": T.IntegerType(),          # IntWritable.java:32
    "VIntWritable": T.IntegerType(),         # VIntWritable.java:33 (zig-zag varint — storage detail)
    "LongWritable": T.LongType(),            # LongWritable.java:32
    "VLongWritable": T.LongType(),           # VLongWritable.java:33
    "FloatWritable": T.FloatType(),          # FloatWritable.java:29
    "DoubleWritable": T.DoubleType(),        # DoubleWritable.java:33
    "Text": T.StringType(),                  # Text.java:53 (UTF-8 BinaryComparable)
    "BytesWritable": T.BinaryType(),         # BytesWritable.java:36
    "MD5Hash": T.BinaryType(),               # MD5Hash.java:35 (16-byte digest)
    "ArrayWritable": T.ArrayType(T.StringType()),          # ArrayWritable.java:46
    "TwoDArrayWritable": T.ArrayType(T.ArrayType(T.StringType())),  # TwoDArrayWritable.java:30
    "MapWritable": T.MapType(T.StringType(), T.StringType()),       # MapWritable.java:37
    "SortedMapWritable": T.MapType(T.StringType(), T.StringType()), # SortedMapWritable.java:39
    "EnumSetWritable": T.ArrayType(T.StringType()),        # EnumSetWritable.java:36
    # ObjectWritable.java:40 / GenericWritable.java:80 — tagged union:
    "ObjectWritable": T.StructType(
        [T.StructField("tag", T.StringType()), T.StructField("payload", T.BinaryType())]
    ),
}

# Types Spark has that the reference lacks (we use them in the star schema
# because the long-millis convention maps losslessly): TimestampType,
# DateType, DecimalType, CalendarIntervalType.
SPARK_EXTRAS = (T.TimestampType(), T.DateType(), T.DecimalType(12, 2))


def kv_schema(key_type: T.DataType, value_type: T.DataType) -> T.StructType:
    """The SequenceFile record shape: a typed (key, value) row."""
    return T.StructType(
        [
            T.StructField("key", key_type, nullable=False),
            T.StructField("value", value_type, nullable=True),
        ]
    )
