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
        p = pdf.sort_values("block_id")
        # vectorized line build (r14): the previous per-row iterrows
        # loop was the kernel's whole cost at 10k+ rows per pool, on
        # pool-count parallelism
        lines = (
            p["block_id"].astype("int64").astype(str) + delim
            + p["path"].astype(str) + delim
            + p["offset"].astype("int64").astype(str) + delim
            + p["length"].astype("int64").astype(str) + delim
            + p["gen_stamp"].astype("int64").astype(str)
        )
        b64 = p["nonce"].map(
            lambda n: base64.b64encode(bytes(n)).decode("ascii")
            if n is not None and len(n) > 0
            else None
        )
        lines = lines.where(b64.isna(), lines + delim + b64.fillna(""))
        data = (
            ("\n".join(lines.tolist()) + "\n").encode("utf-8")
            if len(lines)
            else b""
        )
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
    up to min(default_replication, active provided datanodes).

    Shape (r14): the provided-datanode list is cluster-conf-sized
    (the same documented driver-side bound as operators/sps.py's
    storage report), so the whole multiplex is ONE groupBy(block_id)
    aggregation + array expressions — the sorted-dn literal minus the
    block's hosting set IS the ranked candidate list, and the local/
    provided/fallback location sequence concatenates into a single
    posexplode whose index is `pos`. The previous shape paid a
    dn cross-join, an exclude anti-join, a rank window, and a second
    evaluation of the candidate subtree for the fallback anti-join."""
    dns = sorted(r["node_id"] for r in provided_dns.collect())
    n_active = len(dns)
    fallback_dn = dns[0] if dns else None
    per_block = storages.groupBy("block_id").agg(
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("storage_type") != PROVIDED,
                    F.struct("slot", "node_id", "storage_type"),
                )
            )
        ).alias("__locals"),
        F.max(F.col("storage_type") == PROVIDED).alias("__is_provided"),
        F.collect_set(
            F.when(
                (F.col("storage_type") != PROVIDED)
                & F.col("node_id").isin(dns) if dns else F.lit(False),
                F.col("node_id"),
            )
        ).alias("__hosted"),
    )
    n_local = F.size("__locals")
    need = 1 + F.greatest(
        F.lit(0),
        F.lit(min(default_replication, n_active)) - (n_local + 1),
    )
    avail = (
        F.array_except(
            F.array(*[F.lit(d) for d in dns]), F.col("__hosted")
        )
        if dns
        else F.array().cast("array<string>")
    )
    loc_part = F.transform(
        F.col("__locals"),
        lambda x: F.struct(
            x["node_id"].alias("node_id"),
            x["storage_type"].alias("storage_type"),
        ),
    )
    # :239-243 — every provided candidate is a local host -> the
    # pinned fallback (smallest provided dn), exactly once
    prov_part = F.when(
        ~F.col("__is_provided"),
        F.array().cast(
            "array<struct<node_id:string,storage_type:string>>"
        ),
    ).when(
        F.size(avail) > 0,
        F.transform(
            F.slice(avail, 1, need),
            lambda n: F.struct(
                n.alias("node_id"),
                F.lit(PROVIDED).alias("storage_type"),
            ),
        ),
    ).otherwise(
        F.array(
            F.struct(
                F.lit(fallback_dn).cast("string").alias("node_id"),
                F.lit(PROVIDED).alias("storage_type"),
            )
        )
    )
    return per_block.select(
        "block_id",
        F.posexplode(F.concat(loc_part, prov_part)).alias("pos", "__s"),
    ).select(
        "block_id",
        F.col("pos").cast("int").alias("pos"),
        F.col("__s.node_id").alias("node_id"),
        F.col("__s.storage_type").alias("storage_type"),
    )
