"""WebHDFS JSON protocol decoder pins — literal response bodies in the
documented wire shapes (WebHdfsFileSystem ops → JsonUtilClient
decoders), not round trips of our own serializer."""

from __future__ import annotations

from hadoop_source_spark import webhdfs

LIST_BODY = """{"FileStatuses":{"FileStatus":[
  {"accessTime":1320171722771,"blockSize":33554432,"group":"supergroup",
   "length":24930,"modificationTime":1320171722771,"owner":"webuser",
   "pathSuffix":"a.patch","permission":"644","replication":1,
   "type":"FILE","fileId":16389,"storagePolicy":7},
  {"accessTime":0,"blockSize":0,"group":"supergroup","length":0,
   "modificationTime":1320895981256,"owner":"szetszwo","pathSuffix":"bar",
   "permission":"711","replication":0,"type":"DIRECTORY",
   "childrenNum":2,"snapshotEnabled":true}
]}}"""

STATUS_BODY = """{"FileStatus":{"accessTime":0,"blockSize":0,
 "group":"supergroup","length":0,"modificationTime":1320173277227,
 "owner":"webuser","pathSuffix":"","permission":"777",
 "type":"DIRECTORY","aclBit":true,"encBit":true,"ecBit":true}}"""

BATCH_BODY = """{"DirectoryListing":{"partialListing":{"FileStatuses":
 {"FileStatus":[{"accessTime":0,"blockSize":0,"group":"supergroup",
  "length":0,"modificationTime":1476795497945,"owner":"andrew",
  "pathSuffix":"bardir","permission":"755","replication":0,
  "type":"DIRECTORY","childrenNum":0}]}},"remainingEntries":2}}"""

SUMMARY_BODY = """{"ContentSummary":{"directoryCount":2,"fileCount":1,
 "length":24930,"quota":-1,"spaceConsumed":24930,"spaceQuota":100000}}"""


def test_parse_liststatus_wire_shape(spark):
    df = spark.createDataFrame(
        [("/foo", LIST_BODY)], "path string, response string"
    )
    out = {r.name: r for r in webhdfs.parse_liststatus(df).collect()}
    f = out["a.patch"]
    assert f.path == "/foo/a.patch" and f.type == "FILE" and not f.is_dir
    assert f.length == 24930 and f.block_size == 33554432
    assert f.owner == "webuser" and f.group == "supergroup"
    assert f.permission == 0o644 == 420  # octal wire string → rwx int
    assert f.replication == 1 and f.file_id == 16389
    assert f.storage_policy == 7
    assert f.children_num == -1        # absent → getInt default (:180)
    assert not f.has_acl and not f.encrypted and not f.snapshot_enabled
    d = out["bar"]
    assert d.is_dir and d.children_num == 2 and d.snapshot_enabled
    assert d.file_id == 0              # absent → GRANDFATHER_INODE_ID
    assert d.permission == 0o711


def test_parse_file_status_self_and_flags(spark):
    # GETFILESTATUS on the path itself: pathSuffix '' qualifies to the
    # request path; every optional flag present-and-true
    df = spark.createDataFrame(
        [("/dir", STATUS_BODY)], "path string, response string"
    )
    r = webhdfs.parse_file_status(df).collect()[0]
    assert r.path == "/dir" and r.name == "" and r.is_dir
    assert r.permission == 0o777
    assert r.has_acl and r.encrypted and r.erasure_coded
    assert not r.snapshot_enabled


def test_parse_liststatus_batch_continuation(spark):
    df = spark.createDataFrame(
        [("/foo", BATCH_BODY)], "path string, response string"
    )
    r = webhdfs.parse_liststatus_batch(df).collect()[0]
    assert r.remaining_entries == 2    # the client loop's page signal
    assert r.path == "/foo/bardir" and r.is_dir and r.children_num == 0


def test_parse_content_summary_no_quota_sentinel(spark):
    df = spark.createDataFrame(
        [("/foo", SUMMARY_BODY)], "path string, response string"
    )
    r = webhdfs.parse_content_summary(df).collect()[0]
    assert (r.length, r.file_count, r.directory_count) == (24930, 1, 2)
    assert r.quota is None             # wire -1 = unset
    assert r.space_quota == 100000
    assert r.space_consumed == 24930


def test_parse_liststatus_stays_codegen(spark):
    """The decode path is from_json + explode — no Python in the plan."""
    df = spark.createDataFrame(
        [("/foo", LIST_BODY)], "path string, response string"
    )
    plan = webhdfs.parse_liststatus(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
