"""hadoop_source_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query / data-processing capabilities of
the reference (Apache Hadoop 3.3.1 subset: hadoop-common + HDFS + YARN —
see SURVEY.md) as an idiomatic Spark DataFrame/SQL engine, plus the
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) a 100 TB training-data pipeline needs.

Layout:
    session    — SparkSession factory tuned for local testing / cluster scale
    data       — star-schema + fixture table loaders (TESTDATA.md)
    operators/ — relational core: asof join (MapFile.getClosest), snapshot
                 diff, sorted merge, top-k, content-summary rollups, KV ops
    functions/ — scalar function surface (hashes, text, globs)
    catalog    — namespace/"files" metadata queries (ls/du/count/find/stat)
    llmops/    — dedup (exact/minhash/simhash), similarity search, text stats
    streaming/ — Structured Streaming over the events stream (inotify analog)
"""

from hadoop_source_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
