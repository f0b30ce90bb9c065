"""WebHDFS / HttpFS REST connector surface: the JSON wire protocol as
engine-side parsers.

Reference semantics (`hdfs-client/web/WebHdfsFileSystem.java:145` —
the REST FileSystem whose every operation is an HTTP op returning a
documented JSON shape — and `web/JsonUtilClient.java`, the client-side
decoder this module mirrors):
- GETFILESTATUS returns `{"FileStatus": {...}}`
  (`WebHdfsFileSystem.java:1102` → `JsonUtilClient.toFileStatus:118`:
  pathSuffix, type FILE|DIRECTORY|SYMLINK, length, owner, group,
  permission as an OCTAL string, access/modification times in epoch
  millis, blockSize, replication, fileId, childrenNum, storagePolicy,
  and the optional aclBit/encBit/ecBit/snapshotEnabled flags that are
  absent-means-false);
- LISTSTATUS returns `{"FileStatuses": {"FileStatus": [...]}}`
  (`WebHdfsFileSystem.java:1704` → `toHdfsFileStatusArray:201`);
- LISTSTATUS_BATCH wraps a page of that plus remainingEntries
  (`WebHdfsFileSystem.java:1737`, `toDirectoryListing`);
- GETCONTENTSUMMARY returns `{"ContentSummary": {...}}`
  (`toContentSummary:426`).

Spark-first: the HTTP fetch itself is an ingest concern (any
collector landing response bodies as text/JSON files works — Spark's
own readers handle the transport layer the reference's FileSystem
wires in-process); what the ENGINE owns is decoding the protocol at
scale. Each parser is one `from_json` with the documented schema plus
codegen'd normalization (octal permission → rwx int, flag coalescing,
parent-qualified paths) — a billion REST responses decode as a scan,
no UDFs. The normalized output is the files-catalog shape, so the
whole FsShell surface (catalog.py: glob/find/ls/du/count) composes on
top — exactly how WebHdfsFileSystem slots under FsShell.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# JsonUtilClient.toFileStatus:118-183, field-for-field; optional keys
# parse as nulls (from_json PERMISSIVE mode), normalized downstream
FILE_STATUS_DDL = (
    "pathSuffix string, type string, length bigint, owner string, "
    "group string, permission string, accessTime bigint, "
    "modificationTime bigint, blockSize bigint, replication int, "
    "fileId bigint, childrenNum int, storagePolicy int, "
    "aclBit boolean, encBit boolean, ecBit boolean, "
    "snapshotEnabled boolean, symlink string"
)
_STATUS_DDL = f"FileStatus struct<{FILE_STATUS_DDL}>"
_LIST_DDL = (
    f"FileStatuses struct<FileStatus: array<struct<{FILE_STATUS_DDL}>>>"
)
_BATCH_DDL = (
    "DirectoryListing struct<partialListing: struct<FileStatuses: "
    f"struct<FileStatus: array<struct<{FILE_STATUS_DDL}>>>>, "
    "remainingEntries: bigint>"
)
# toContentSummary:426 (+ the nested typeQuota map is optional and
# omitted here — storage-type quotas have their own operator)
_SUMMARY_DDL = (
    "ContentSummary struct<length: bigint, fileCount: bigint, "
    "directoryCount: bigint, quota: bigint, spaceConsumed: bigint, "
    "spaceQuota: bigint, snapshotLength: bigint, "
    "snapshotFileCount: bigint, snapshotDirectoryCount: bigint, "
    "snapshotSpaceConsumed: bigint>"
)


def _normalize(st: Column, parent: Column) -> list[Column]:
    """One FileStatus struct → catalog columns. Permission arrives as
    the OCTAL string WebHDFS emits ('755') and becomes the rwx int the
    permission operators consume (toFsPermission parses radix 8);
    times stay epoch millis (the wire unit); absent flag keys mean
    false (toFileStatus:137-152 null-checks each)."""
    path = F.when(
        st["pathSuffix"] == "", parent
    ).otherwise(F.concat(parent, F.lit("/"), st["pathSuffix"]))
    return [
        path.alias("path"),
        st["pathSuffix"].alias("name"),
        st["type"].alias("type"),
        (st["type"] == "DIRECTORY").alias("is_dir"),
        st["length"].alias("length"),
        st["owner"].alias("owner"),
        st["group"].alias("group"),
        F.conv(st["permission"], 8, 10).cast("int").alias("permission"),
        st["accessTime"].alias("access_time_ms"),
        st["modificationTime"].alias("modification_time_ms"),
        st["blockSize"].alias("block_size"),
        st["replication"].alias("replication"),
        # absent-key defaults are toFileStatus's own (:175-181):
        # GRANDFATHER_INODE_ID 0, childrenNum -1, storage policy
        # UNSPECIFIED 0
        F.coalesce(st["fileId"], F.lit(0)).alias("file_id"),
        F.coalesce(st["childrenNum"], F.lit(-1)).alias("children_num"),
        F.coalesce(st["storagePolicy"], F.lit(0)).alias("storage_policy"),
        F.coalesce(st["aclBit"], F.lit(False)).alias("has_acl"),
        F.coalesce(st["encBit"], F.lit(False)).alias("encrypted"),
        F.coalesce(st["ecBit"], F.lit(False)).alias("erasure_coded"),
        F.coalesce(st["snapshotEnabled"], F.lit(False)).alias(
            "snapshot_enabled"
        ),
        st["symlink"].alias("symlink"),
    ]


def parse_file_status(
    responses: DataFrame,
    json_col: str = "response",
    parent_col: str = "path",
) -> DataFrame:
    """GETFILESTATUS decoder: one `{"FileStatus": {...}}` body per row
    (`parent_col` is the request path the status qualifies against —
    a self-status carries pathSuffix '', WebHDFS's makeQualified
    convention). Extra columns pass through."""
    parsed = F.from_json(F.col(json_col), _STATUS_DDL)
    passthru = [c for c in responses.columns
                if c not in (json_col, parent_col)]
    return responses.select(
        *passthru, *_normalize(parsed["FileStatus"], F.col(parent_col))
    )


def parse_liststatus(
    responses: DataFrame,
    json_col: str = "response",
    parent_col: str = "path",
) -> DataFrame:
    """LISTSTATUS decoder: one `{"FileStatuses": {"FileStatus":
    [...]}}` body per directory row → one output row per child,
    qualified against the directory path. from_json + explode — the
    fan-out stays in codegen."""
    parsed = F.from_json(F.col(json_col), _LIST_DDL)
    passthru = [c for c in responses.columns
                if c not in (json_col, parent_col)]
    exploded = responses.select(
        *passthru,
        F.col(parent_col).alias("__parent"),
        F.explode(parsed["FileStatuses"]["FileStatus"]).alias("__st"),
    )
    return exploded.select(
        *passthru, *_normalize(F.col("__st"), F.col("__parent"))
    )


def parse_liststatus_batch(
    responses: DataFrame,
    json_col: str = "response",
    parent_col: str = "path",
) -> DataFrame:
    """LISTSTATUS_BATCH decoder (paged listing): like parse_liststatus
    plus the page's remaining_entries (0 on the final page — the
    client loop's continuation signal, WebHdfsFileSystem.java:1737)."""
    parsed = F.from_json(F.col(json_col), _BATCH_DDL)
    passthru = [c for c in responses.columns
                if c not in (json_col, parent_col)]
    exploded = responses.select(
        *passthru,
        F.col(parent_col).alias("__parent"),
        parsed["DirectoryListing"]["remainingEntries"].alias(
            "remaining_entries"
        ),
        F.explode(
            parsed["DirectoryListing"]["partialListing"]["FileStatuses"][
                "FileStatus"
            ]
        ).alias("__st"),
    )
    return exploded.select(
        *passthru,
        "remaining_entries",
        *_normalize(F.col("__st"), F.col("__parent")),
    )


def parse_content_summary(
    responses: DataFrame,
    json_col: str = "response",
    parent_col: str = "path",
) -> DataFrame:
    """GETCONTENTSUMMARY decoder (`toContentSummary:426`): quota -1 is
    the wire encoding for 'no quota' and surfaces as null."""
    s = F.from_json(F.col(json_col), _SUMMARY_DDL)["ContentSummary"]
    noq = lambda c: F.when(c != -1, c)  # noqa: E731
    passthru = [c for c in responses.columns if c != json_col]
    return responses.select(
        *passthru,
        s["length"].alias("length"),
        s["fileCount"].alias("file_count"),
        s["directoryCount"].alias("directory_count"),
        s["spaceConsumed"].alias("space_consumed"),
        noq(s["quota"]).alias("quota"),
        noq(s["spaceQuota"]).alias("space_quota"),
    )
