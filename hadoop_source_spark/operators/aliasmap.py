"""PROVIDED storage: the BlockAliasMap text codec and the
ProvidedStorageMap read-path routing — how external-storage-backed
blocks serialize to the alias map and how getBlockLocations
multiplexes local replicas with synthetic PROVIDED locations.

Reference semantics:

- Text codec (`hadoop-hdfs/.../server/common/blockaliasmap/impl/
  TextFileRegionAliasMap.java`): one line per file region —
  ``blockId<delim>path<delim>offset<delim>length<delim>genStamp`` and
  a sixth Base64 nonce field ONLY when the nonce is non-empty
  (``TextWriter.store:443-458``); default delimiter ","
  (`DFSConfigKeys.java:404`), file name ``blocks_<bpid>.csv``
  (``fileNameFromBlockPoolID:487-489``); the reader splits on the
  delimiter and rejects any line with a field count other than 5 or
  6 (``TextReader.nextInternal:346-367``), decoding the sixth field
  as Base64.
- Read routing (`hadoop-hdfs/.../server/blockmanagement/
  ProvidedStorageMap.java ProvidedBlocksBuilder.newLocatedBlock:
  247-299``): local (non-PROVIDED) replicas keep their datanode
  locations and exclude their datanodes from provided selection;
  when any replica storage is PROVIDED, one provided datanode is
  appended after the locals (``chooseProvidedDatanode:237-244`` —
  prefer a node outside the exclude set, fall back to any), then
  more provided datanodes are appended until the location count
  reaches ``min(defaultReplication, activeProvidedDatanodes)``
  (:281-291), each pick joining the exclude set. The reference
  chooses randomly among provided datanodes
  (``ProvidedDescriptor.choose``); the engine pins the
  smallest-node-id candidate so re-runs are stable — counts, types
  and the local prefix match the reference under any choice.

Spark-first: the codec is one Arrow-batched applyInPandas encode per
block pool (bytes never visit the driver; pool count scales with the
corpus) and a mapInPandas decode; the routing is pure DataFrame
logic — a rank over the (block x provided-datanode) anti-join picks
the provided locations, one shuffle on the block grain.
"""

from __future__ import annotations

import base64

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DELIM = ","
PROVIDED = "PROVIDED"

_BLOB_SCHEMA = "bpid string, file_name string, data binary"
_REGION_SCHEMA = (
    "bpid string, block_id long, path string, offset long,"
    " length long, gen_stamp long, nonce binary"
)


def file_name(bpid: str) -> str:
    """fileNameFromBlockPoolID:487-489."""
    return "blocks_" + bpid + ".csv"


def encode_alias_map(regions: DataFrame, delim: str = DELIM) -> DataFrame:
    """Serialize file regions to one alias-map blob per block pool.

    ``regions``: (bpid string, block_id long, path string, offset
    long, length long, gen_stamp long, nonce binary — empty or null
    for none). Lines are written in block-id order so the blob is
    deterministic. Returns (bpid, file_name, data binary)."""

    def enc(pdf):
        import pandas as pd

        bpid = pdf["bpid"].iloc[0]
        out = []
        for _, r in pdf.sort_values("block_id").iterrows():
            fields = [
                str(int(r["block_id"])), r["path"], str(int(r["offset"])),
                str(int(r["length"])), str(int(r["gen_stamp"])),
            ]
            nonce = r["nonce"]
            if nonce is not None and len(nonce) > 0:
                fields.append(
                    base64.b64encode(bytes(nonce)).decode("ascii")
                )
            out.append(delim.join(fields))
        data = ("\n".join(out) + "\n").encode("utf-8") if out else b""
        return pd.DataFrame(
            [(bpid, file_name(bpid), data)],
            columns=["bpid", "file_name", "data"],
        )

    return regions.groupBy("bpid").applyInPandas(enc, _BLOB_SCHEMA)


def decode_alias_map(blobs: DataFrame, delim: str = DELIM) -> DataFrame:
    """Parse alias-map blobs back to file regions
    (TextReader.nextInternal:346-367 — 5 or 6 fields, Base64 nonce).

    ``blobs``: (bpid, data binary). Returns the region schema with an
    EMPTY (not null) nonce for 5-field lines, as the reference does."""

    def dec(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for bpid, data in zip(
                pdf["bpid"].tolist(), pdf["data"].tolist()
            ):
                for line in bytes(data).decode("utf-8").splitlines():
                    f = line.split(delim)
                    if len(f) not in (5, 6):
                        raise IOError("Invalid line: " + line)
                    nonce = (
                        base64.b64decode(f[5]) if len(f) == 6 else b""
                    )
                    rows.append(
                        (bpid, int(f[0]), f[1], int(f[2]), int(f[3]),
                         int(f[4]), nonce)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "bpid", "block_id", "path", "offset", "length",
                    "gen_stamp", "nonce",
                ],
            )

    return blobs.select("bpid", "data").mapInPandas(
        dec, _REGION_SCHEMA
    )


def provided_locations(
    storages: DataFrame,
    provided_dns: DataFrame,
    *,
    default_replication: int = 3,
) -> DataFrame:
    """ProvidedBlocksBuilder.newLocatedBlock:247-299 as rows.

    ``storages``: (block_id long, slot int, node_id string,
    storage_type string) — a block's replica storages in slot order;
    PROVIDED rows mark the block as provided-backed (their node is a
    placeholder and emits no local location). ``provided_dns``:
    (node_id string) — datanodes with an active provided volume.

    Returns (block_id, pos int — 0-based location order, node_id,
    storage_type): the local replicas first (slot order), then the
    provided picks (smallest-id candidates outside the exclude set)
    up to min(default_replication, active provided datanodes)."""
    local = storages.where(F.col("storage_type") != PROVIDED)
    n_local = (
        storages.groupBy("block_id")
        .agg(
            F.sum(
                F.when(F.col("storage_type") != PROVIDED, 1).otherwise(0)
            ).alias("n_local"),
            F.max(F.col("storage_type") == PROVIDED).alias(
                "is_provided"
            ),
        )
    )
    # The provided-datanode list is cluster-conf-sized (the same
    # documented driver-side bound as operators/sps.py's storage
    # report): its count and smallest member become plan literals
    # instead of a single-partition global aggregate.
    dns = sorted(r["node_id"] for r in provided_dns.collect())
    n_active = len(dns)
    fallback_dn = dns[0] if dns else None
    # candidates per provided block: provided datanodes not hosting a
    # local replica (left-join-null anti-join), ranked by node id —
    # the engine's deterministic pin
    cand = (
        n_local.where("is_provided")
        .join(F.broadcast(provided_dns), how="cross")
        .join(
            local.select(
                "block_id", F.col("node_id").alias("node_id"),
                F.lit(True).alias("_hit"),
            ),
            ["block_id", "node_id"],
            "left",
        )
        .where(F.col("_hit").isNull())
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("block_id").orderBy("node_id")
            ),
        )
        .where(
            F.col("rk")
            <= 1
            + F.greatest(
                F.lit(0),
                F.lit(min(default_replication, n_active))
                - (F.col("n_local") + 1),
            )
        )
        .select(
            "block_id",
            (F.col("n_local") + F.col("rk") - 1).cast("int").alias(
                "pos"
            ),
            "node_id",
            F.lit(PROVIDED).alias("storage_type"),
        )
    )
    # fallback: every provided candidate is a local host -> choose any
    # (pinned: the smallest provided datanode), exactly once (:239-243)
    no_cand = (
        n_local.where("is_provided")
        .join(
            cand.select("block_id").distinct().withColumn(
                "_has", F.lit(True)
            ),
            "block_id",
            "left",
        )
        .where(F.col("_has").isNull())
        .select(
            "block_id",
            F.col("n_local").cast("int").alias("pos"),
            F.lit(fallback_dn).alias("node_id"),
            F.lit(PROVIDED).alias("storage_type"),
        )
    )
    local_rows = local.select(
        "block_id",
        (
            F.row_number().over(
                Window.partitionBy("block_id").orderBy("slot")
            )
            - 1
        ).cast("int").alias("pos"),
        "node_id",
        "storage_type",
    )
    return local_rows.unionByName(cand).unionByName(no_cand)
