"""URL canonicalization, URL-level dedup, domain blocklists and
per-domain caps — the web-corpus curation stages that run BEFORE
content dedup (the CCNet / RefinedWeb / Gopher recipe: canonicalize
the URL, drop exact URL duplicates, drop blocklisted domains, cap any
single domain's share of the corpus).

All string work is ordered `regexp_replace` steps (every pattern is
anchored — ^ or $ — so each can match at most once and replace-first
and replace-all engines agree): lowercase, strip #fragment, strip a
pure-tracking ?utm... query, strip the http(s) scheme, strip a
leading www., strip the :80/:443 default port (anchored to the HOST
position — a literal ':80' inside a path segment is preserved), strip
the trailing slash. The registry host is the leading non-/ run of the
canonical form.

Spark-first scale shape: canonicalization is a codegen projection
(zero Python); URL dedup is one window on the canonical URL; the
blocklist is a broadcast join; the per-domain cap is an
eligible-only running rank on the domain key (sum-of-flag window —
row_number can't skip rows). Two shuffles total (canonical key, then
domain key), both on keys that stay high-cardinality at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def canonicalize(url: Column) -> Column:
    """Ordered canonicalization; see module docstring."""
    c = F.lower(url)
    c = F.regexp_replace(c, "#.*$", "")
    c = F.regexp_replace(c, "\\?utm.*$", "")
    c = F.regexp_replace(c, "^https?://", "")
    c = F.regexp_replace(c, "^www\\.", "")
    # host-anchored: at this point in the chain the scheme is gone, so
    # the authority is the leading [^/]* run; the lookahead keeps the
    # path separator while refusing ':8080' (backtracking cannot split
    # a longer port) and mid-path ':80' (not at ^)
    c = F.regexp_replace(c, "^([^/]*):(80|443)(?=/|$)", "$1")
    return F.regexp_replace(c, "/$", "")


def domain_of(canon: Column) -> Column:
    """Registry host of a canonical URL (leading non-/ run)."""
    return F.regexp_extract(canon, "^([^/]+)", 1)


def url_pipeline(
    docs: DataFrame, blocklist: DataFrame, per_domain_cap: int
) -> DataFrame:
    """Classify every doc: URL_DUP (a lower-doc_id doc owns the same
    canonical URL), BLOCKLISTED (domain on the blocklist), OVER_CAP
    (beyond the per-domain keep budget, ranked by quality desc then
    doc_id), else KEPT. The cap counts only docs that survived the
    earlier stages.

    `docs`: (doc_id long, url, quality double-comparable);
    `blocklist`: (domain). Returns doc keys + canon_url + domain +
    action + domain_rank (eligible docs only)."""
    staged = docs.select(
        "doc_id",
        "url",
        "quality",
        canonicalize(F.col("url")).alias("canon_url"),
    ).withColumn("domain", domain_of(F.col("canon_url")))
    dup = (
        F.row_number().over(
            Window.partitionBy("canon_url").orderBy(F.col("doc_id").asc())
        )
        > 1
    )
    staged = staged.withColumn("__dup", dup).join(
        F.broadcast(blocklist.select("domain", F.lit(True).alias("__blk"))),
        "domain",
        "left",
    ).withColumn("__blk", F.coalesce("__blk", F.lit(False)))
    eligible = ~F.col("__dup") & ~F.col("__blk")
    staged = staged.withColumn("__elig", eligible)
    # eligible-only running rank: row_number can't skip dup/blocked
    # rows, a flag-sum over the quality order can
    erank = F.sum(F.col("__elig").cast("long")).over(
        Window.partitionBy("domain")
        .orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    action = (
        F.when(F.col("__dup"), F.lit("URL_DUP"))
        .when(F.col("__blk"), F.lit("BLOCKLISTED"))
        .when(erank > per_domain_cap, F.lit("OVER_CAP"))
        .otherwise(F.lit("KEPT"))
    )
    return staged.select(
        "doc_id",
        "url",
        "canon_url",
        "domain",
        action.alias("action"),
        F.when(F.col("__elig"), erank).cast("long").alias("domain_rank"),
    )
